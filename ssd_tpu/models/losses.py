"""Joint CTC + WavLM-distillation objective.

Parity with reference ``src/models/losses.py:19-105``:

* CTC term via the on-device scan loss (:mod:`ssd_tpu.ops.ctc_loss`) with
  ``zero_infinity`` + torch's ``mean`` reduction semantics.
* Distillation term: teacher hidden states linearly interpolated along time to
  the student's frame count (torch ``F.interpolate(mode='linear',
  align_corners=False)`` numerics), teacher lengths rescaled and clamped, a
  min(student, teacher) length mask, optional per-frame LayerNorm of both
  representations, then masked MSE normalized by ``mask · dim``.
* ``total = λ_ctc · ctc + λ_distill · distill``.

Pure functions of arrays — usable inside any jitted/pjitted train step.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ssd_tpu.ops.ctc_loss import ctc_loss


@dataclass(frozen=True)
class LossWeights:
    lambda_distill: float = 0.7
    lambda_ctc: float = 0.3


def interpolate_linear(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Time-resize ``(B, T_in, D)`` → ``(B, out_len, D)``.

    Matches ``torch.nn.functional.interpolate(mode='linear',
    align_corners=False)``: output center j maps to input coordinate
    ``(j + 0.5) · T_in/T_out − 0.5`` with edge clamping.
    """
    t_in = x.shape[1]
    if t_in == out_len:
        return x
    scale = t_in / out_len
    coords = (jnp.arange(out_len) + 0.5) * scale - 0.5
    coords = jnp.clip(coords, 0.0, t_in - 1)
    lo = jnp.floor(coords).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t_in - 1)
    w = coords - lo
    # Expressed as a banded interpolation-matrix matmul rather than a gather:
    # gathers (and their scatter backward) lower poorly on TPU, while the
    # (out_len, t_in) weight matrix rides the MXU. HIGHEST precision keeps
    # fp32 parity with torch F.interpolate.
    weights = jax.nn.one_hot(lo, t_in, dtype=x.dtype) * (1.0 - w)[:, None]
    weights = weights + jax.nn.one_hot(hi, t_in, dtype=x.dtype) * w[:, None]
    return jnp.einsum(
        "ot,btd->bod", weights, x, precision=jax.lax.Precision.HIGHEST
    )


def distillation_mse(
    student: jnp.ndarray,
    student_lengths: jnp.ndarray,
    teacher: jnp.ndarray,
    teacher_lengths: Optional[jnp.ndarray],
    normalize: bool = False,
) -> jnp.ndarray:
    """Masked MSE between student frames and time-aligned teacher frames."""
    B, t_s, d = student.shape
    t_t = teacher.shape[1]
    # loaders may transfer the teacher in bf16 (data.teacher_dtype); the
    # interpolation + MSE always run in fp32
    teacher = teacher.astype(jnp.float32)

    aligned = interpolate_linear(teacher, t_s)
    if teacher_lengths is not None and t_t != t_s and t_t > 0:
        scale = float(t_s) / float(t_t)
        teacher_lengths = jnp.clip(
            jnp.round(teacher_lengths.astype(jnp.float32) * scale).astype(jnp.int32),
            0,
            t_s,
        )

    valid = jnp.clip(student_lengths, 0, t_s)
    if teacher_lengths is not None:
        valid = jnp.minimum(valid, teacher_lengths)
    mask = jnp.arange(t_s)[None, :] < valid[:, None]  # (B, t_s)

    s, t = student, aligned
    if normalize:
        # parameterless per-frame LayerNorm (torch F.layer_norm, eps=1e-5)
        def _ln(v):
            mu = jnp.mean(v, axis=-1, keepdims=True)
            var = jnp.var(v, axis=-1, keepdims=True)
            return (v - mu) / jnp.sqrt(var + 1e-5)

        s, t = _ln(s), _ln(t)

    sq = (s - t) ** 2 * mask[:, :, None]
    denom = jnp.maximum(jnp.sum(mask) * d, 1)
    return jnp.sum(sq) / denom


def joint_loss(
    log_probs: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    targets: jnp.ndarray,
    target_lengths: jnp.ndarray,
    student_repr: jnp.ndarray,
    teacher_repr: Optional[jnp.ndarray],
    teacher_lengths: Optional[jnp.ndarray],
    weights: LossWeights,
    blank_id: int,
    normalize_distill: bool = False,
) -> Dict[str, jnp.ndarray]:
    """The training objective. Returns {"total", "ctc", "distill"} scalars."""
    per_sample = ctc_loss(log_probs, logit_lengths, targets, target_lengths, blank_id)
    denom = jnp.maximum(target_lengths, 1).astype(jnp.float32)
    ctc = jnp.mean(per_sample / denom)

    if teacher_repr is not None:
        distill = distillation_mse(
            student_repr, logit_lengths, teacher_repr, teacher_lengths, normalize_distill
        )
    else:
        distill = jnp.zeros((), jnp.float32)

    total = weights.lambda_ctc * ctc + weights.lambda_distill * distill
    return {"total": total, "ctc": ctc, "distill": distill}
