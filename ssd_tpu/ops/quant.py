"""Dynamic int8 (W8A8) matmul for inference-time quantized serving.

TPU v5e/v5p MXUs execute int8×int8→int32 matmuls at twice the bf16 rate,
which makes post-training dynamic quantization the cheapest 2× on the
serving pipeline's dense FLOPs. The reference has no quantized path (torch
MPS inference only); this is a TPU-native extension, config-gated and OFF
by default (``model.encoder.quantize: int8``).

Scheme (standard dynamic W8A8, no calibration needed):

* activations: symmetric per-token scales — ``amax`` over the contracting
  axis, computed on the fly inside the jitted forward (one fused reduction);
* weights: symmetric per-output-channel scales;
* round-to-nearest, clip to [−127, 127], accumulate in int32 on the MXU,
  rescale with the rank-1 outer product of the two scale vectors.

The entry point :func:`int8_dot_general` is signature-compatible with
``jax.lax.dot_general`` for the contraction flax ``nn.Dense`` emits
(``((ndim−1,), (0,)), ((), ())``) and is injected via Dense's
``dot_general=`` hook — the parameter tree and checkpoints are unchanged,
so any trained fp32/bf16 checkpoint can be served quantized.

Accuracy: random-weight relative error ~1e-2 per layer (tests pin it);
end-to-end CER on the synthetic separable corpus is unchanged
(``tests/test_quant.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_QMAX = 127.0
_EPS = 1e-8


def _quantize_per_axis(x: jnp.ndarray, axis) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 quantization; scales keep the reduced axes as size 1."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, _EPS) / _QMAX
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -_QMAX, _QMAX)
    return q.astype(jnp.int8), scale


def int8_dot_general(
    lhs: jnp.ndarray,
    rhs: jnp.ndarray,
    dimension_numbers,
    precision=None,
    preferred_element_type=None,
):
    """W8A8 replacement for ``lax.dot_general`` (flax ``nn.Dense`` pattern).

    Supports the Dense contraction only: contract the LAST axis of ``lhs``
    with the FIRST axis of ``rhs``, no batch dims. ``precision`` /
    ``preferred_element_type`` are accepted for signature compatibility and
    ignored (accumulation is int32 on the MXU; output is fp32 cast to the
    input dtype).
    """
    (lc, rc), (lb, rb) = dimension_numbers
    if tuple(lc) != (lhs.ndim - 1,) or tuple(rc) != (0,) or lb or rb:
        raise NotImplementedError(
            f"int8_dot_general supports the Dense contraction only, got "
            f"{dimension_numbers}"
        )
    out_dtype = jnp.promote_types(lhs.dtype, rhs.dtype)

    lhs_q, lhs_s = _quantize_per_axis(lhs, axis=-1)  # (..., 1)
    rhs_q, rhs_s = _quantize_per_axis(rhs, axis=0)  # (1, ...out)

    acc = jax.lax.dot_general(
        lhs_q,
        rhs_q,
        dimension_numbers,
        preferred_element_type=jnp.int32,
    )
    # rank-1 rescale: (..., 1) × (1, out...) broadcasts against (..., out...)
    out = acc.astype(jnp.float32) * lhs_s * rhs_s.reshape(
        (1,) * (acc.ndim - (rhs.ndim - 1)) + rhs.shape[1:]
    )
    return out.astype(out_dtype)
