"""Connectionist Temporal Classification loss, on-device.

The reference trains with ``torch.nn.CTCLoss(blank, zero_infinity=True)`` and
had to run it on **CPU** because MPS has no CTC kernel
(``src/models/losses.py:28,55``; blog "Challenge 1"). Here the loss is a
log-semiring forward (α) recursion expressed as a ``jax.lax.scan`` over time,
so it runs fused on TPU inside the jitted train step and differentiates by
autodiff through the scan.

Numerics match ``torch.nn.CTCLoss`` (see ``tests/test_ctc_loss.py`` goldens):

* extended label sequence ``blank t1 blank t2 … blank`` (2S+1 states)
* self-loop + advance + skip (skip only between distinct non-blank labels)
* ``zero_infinity=True``: impossible alignments (T < S + repeats) produce 0
  loss and 0 gradient instead of inf
* ``reduction='mean'``: per-sample loss divided by ``target_length`` (clamped
  to 1), then averaged over the batch.

Shapes are static: targets are padded to ``S_max`` and sequences to ``T_max``;
per-sample ``logit_lengths`` / ``target_lengths`` select the live region, so
one compiled executable serves a whole length bucket.

Gradient note: torch's CTC backward returns ``exp(log_probs) − γ`` — it bakes
the log-softmax backward into the loss gradient (its row sums are 0). Autodiff
here returns the *true* gradient w.r.t. the log-probs (``−γ``, row sums −1),
verified against finite differences. Composed through an actual log-softmax
the two yield **identical logits gradients**, so training dynamics match the
reference exactly (tested in ``tests/test_ctc_loss.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1.0e30  # safe -inf surrogate: logaddexp stays finite


def _extend_targets(targets: jnp.ndarray, blank_id: int) -> jnp.ndarray:
    """(B, S) → (B, 2S+1) interleaved with blanks: b t1 b t2 … b."""
    B, S = targets.shape
    ext = jnp.full((B, 2 * S + 1), blank_id, dtype=targets.dtype)
    return ext.at[:, 1::2].set(targets)


@functools.partial(jax.jit, static_argnames=("blank_id",))
def ctc_loss(
    log_probs: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    targets: jnp.ndarray,
    target_lengths: jnp.ndarray,
    blank_id: int = 0,
) -> jnp.ndarray:
    """Per-sample CTC negative log-likelihood.

    Args:
      log_probs: ``(B, T, V)`` log-softmax outputs.
      logit_lengths: ``(B,)`` valid frame counts.
      targets: ``(B, S)`` padded label ids (padding value irrelevant).
      target_lengths: ``(B,)`` valid label counts.
      blank_id: CTC blank index.

    Returns:
      ``(B,)`` float32 losses; impossible alignments yield 0 (zero_infinity).
    """
    log_probs = log_probs.astype(jnp.float32)
    B, T, V = log_probs.shape
    S = targets.shape[1]
    S2 = 2 * S + 1

    ext = _extend_targets(targets.astype(jnp.int32), blank_id)  # (B, S2)

    # Skip transition allowed into state s iff label[s] is non-blank and
    # differs from label[s-2] (standard CTC topology).
    is_label = (jnp.arange(S2) % 2 == 1)[None, :]
    prev2_label = jnp.pad(ext[:, :-2], ((0, 0), (2, 0)), constant_values=-1)
    allow_skip = is_label & (ext != prev2_label)  # (B, S2)

    # Per-state emission log-probs for every frame: (T, B, S2).
    # Expressed as a one-hot matmul, not a gather — on TPU the equivalent
    # take_along_axis gather lowers to a ~40 ms scalar loop at these shapes
    # while the MXU einsum takes ~1 ms. HIGHEST precision keeps it exact
    # (each row of the one-hot selects a single fp32 value).
    onehot = jax.nn.one_hot(ext, V, dtype=log_probs.dtype)  # (B, S2, V)
    lp_ext = jnp.einsum(
        "btv,bsv->bts", log_probs, onehot, precision=jax.lax.Precision.HIGHEST
    )
    lp_ext = jnp.moveaxis(lp_ext, 1, 0)

    alpha0 = jnp.full((B, S2), NEG_INF)
    alpha0 = alpha0.at[:, 0].set(lp_ext[0, :, 0])
    if S > 0:
        alpha0 = alpha0.at[:, 1].set(lp_ext[0, :, 1])

    def step(alpha, lp_t):
        stay = alpha
        advance = jnp.pad(
            alpha[:, :-1], ((0, 0), (1, 0)), constant_values=NEG_INF
        )
        skip = jnp.pad(alpha[:, :-2], ((0, 0), (2, 0)), constant_values=NEG_INF)
        skip = jnp.where(allow_skip, skip, NEG_INF)
        merged = jnp.logaddexp(jnp.logaddexp(stay, advance), skip)
        new_alpha = jnp.maximum(lp_t + merged, NEG_INF)
        return new_alpha, new_alpha

    _, alphas = jax.lax.scan(step, alpha0, lp_ext[1:])
    alphas = jnp.concatenate([alpha0[None], alphas], axis=0)  # (T, B, S2)

    # Gather α at the final valid frame of each sample.
    t_last = jnp.clip(logit_lengths - 1, 0, T - 1)  # (B,)
    alpha_last = jnp.take_along_axis(
        jnp.moveaxis(alphas, 0, 1), t_last[:, None, None], axis=1
    )[:, 0]  # (B, S2)

    s_blank = jnp.clip(2 * target_lengths, 0, S2 - 1)
    s_label = jnp.clip(2 * target_lengths - 1, 0, S2 - 1)
    end_blank = jnp.take_along_axis(alpha_last, s_blank[:, None], axis=1)[:, 0]
    end_label = jnp.where(
        target_lengths > 0,
        jnp.take_along_axis(alpha_last, s_label[:, None], axis=1)[:, 0],
        NEG_INF,
    )
    ll = jnp.logaddexp(end_blank, end_label)
    loss = -ll

    # zero_infinity: kill impossible alignments. jnp.where's VJP routes zero
    # cotangent into the untaken branch, so gradients vanish too.
    impossible = ll <= NEG_INF / 2
    return jnp.where(impossible, 0.0, loss)


@functools.partial(jax.jit, static_argnames=("blank_id", "reduction"))
def ctc_loss_reduced(
    log_probs: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    targets: jnp.ndarray,
    target_lengths: jnp.ndarray,
    blank_id: int = 0,
    reduction: str = "mean",
) -> jnp.ndarray:
    """CTC loss with torch-style reduction (``mean`` | ``sum`` | ``none``)."""
    per_sample = ctc_loss(log_probs, logit_lengths, targets, target_lengths, blank_id)
    if reduction == "none":
        return per_sample
    if reduction == "sum":
        return jnp.sum(per_sample)
    if reduction == "mean":
        denom = jnp.maximum(target_lengths, 1).astype(jnp.float32)
        return jnp.mean(per_sample / denom)
    raise ValueError(f"unknown reduction {reduction!r}")
