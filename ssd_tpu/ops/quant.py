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


# --------------------------------------------------------------- prequantized
# Weight-only pre-quantization (``model.encoder.quantize: int8_prequant``):
# the dynamic path above re-quantizes the full weight matrix on every call
# (measured ~1.5 ms/fwd at flagship scale, docs/PERF.md); here eligible
# kernels are converted ONCE at load time — int8 kernel + per-output-channel
# fp32 scale live in the (engine-side) param tree — and the forward pays only
# the activation-side dynamic quantization. Same math as the dynamic path
# (the kernel is quantized with the identical formula, after the same
# compute-dtype cast flax Dense would apply), so outputs match it exactly.


def prequantize_kernel(kernel: jnp.ndarray, compute_dtype=None):
    """(in, out) or stacked (L, in, out) float kernel → (int8 q, fp32 scale).

    ``compute_dtype`` replays the cast flax ``nn.Dense`` applies before its
    ``dot_general`` (bf16 models quantize the bf16-cast weights), keeping the
    prequantized path bit-compatible with the dynamic one.
    """
    if compute_dtype is not None:
        kernel = kernel.astype(compute_dtype)
    axis = kernel.ndim - 2  # contraction dim: 0 for 2-D, 1 for stacked 3-D
    q, scale = _quantize_per_axis(kernel, axis=axis)
    return q, jnp.squeeze(scale, axis=axis).astype(jnp.float32)


def int8_prequant_dot(x: jnp.ndarray, q_kernel: jnp.ndarray, scale: jnp.ndarray):
    """``x @ dequant(q_kernel)`` via int8×int8 MXU: dynamic per-token
    activation quantization against a pre-quantized (in, out) kernel."""
    x_q, x_s = _quantize_per_axis(x, axis=-1)
    acc = jax.lax.dot_general(
        x_q, q_kernel, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * x_s * scale.reshape(
        (1,) * (acc.ndim - 1) + (scale.shape[-1],)
    )
    return out


# Dense kernels the int8 hook covers (conformer FFN + conv pointwise): the
# attention projections and the subsampler stay float (small share of FLOPs,
# and MHA's einsum contraction isn't the Dense pattern).
QUANT_ELIGIBLE = ("w1", "w2", "pw1", "pw2")


import flax.linen as _nn


class QuantDense(_nn.Module):
    """flax Dense drop-in for the ``int8_prequant`` layout.

    Declares ``kernel`` (int8), ``scale`` (fp32 per output channel), and
    ``bias`` — the tree :func:`prequantize_tree` produces from a float
    checkpoint."""

    features: int
    dtype: object = jnp.float32

    @_nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        q = self.param(
            "kernel", lambda rng: jnp.zeros((in_dim, self.features), jnp.int8)
        )
        scale = self.param(
            "scale", lambda rng: jnp.ones((self.features,), jnp.float32)
        )
        bias = self.param(
            "bias", lambda rng: jnp.zeros((self.features,), jnp.float32)
        )
        x = x.astype(self.dtype)
        y = int8_prequant_dot(x, q, scale).astype(self.dtype)
        return y + bias.astype(self.dtype)


def maybe_prequantize(params, encoder_cfg):
    """Load-time conversion keyed on the model config: returns the
    prequantized tree when ``quantize == "int8_prequant"`` (replaying the
    Dense compute-dtype cast so outputs match the dynamic-int8 path), the
    tree unchanged otherwise. The ONE call site contract for engines/eval/
    profilers — keeps the dtype-cast rule from diverging across callers.
    ``encoder_cfg`` is an ``EncoderConfig`` or the raw config dict."""
    if isinstance(encoder_cfg, dict):
        quantize = encoder_cfg.get("quantize", "none")
        dtype = (
            jnp.bfloat16
            if encoder_cfg.get("compute_dtype", "float32") == "bfloat16"
            else jnp.float32
        )
    else:
        quantize, dtype = encoder_cfg.quantize, encoder_cfg.dtype
    if quantize != "int8_prequant":
        return params
    return prequantize_tree(params, dtype)


def prequantize_tree(params, compute_dtype=None):
    """Convert every eligible Dense ``kernel`` in a float param tree to the
    ``int8_prequant`` layout (``kernel``→int8, new ``scale`` leaf). Works on
    unrolled, scanned/stacked, and pipelined trees alike (the stacked (L, in,
    out) kernels quantize per layer per output channel)."""

    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for name, child in node.items():
            if (
                name in QUANT_ELIGIBLE
                and isinstance(child, dict)
                and "kernel" in child
                and getattr(child["kernel"], "ndim", 0) in (2, 3)
            ):
                q, scale = prequantize_kernel(child["kernel"], compute_dtype)
                out[name] = {
                    **{k: v for k, v in child.items() if k != "kernel"},
                    "kernel": q,
                    "scale": scale,
                }
            else:
                out[name] = walk(dict(child)) if isinstance(child, dict) else child
        return out

    return walk(dict(params))
