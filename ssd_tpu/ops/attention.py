"""Fused short-sequence attention: whole (batch, head) problem in VMEM.

The idea: at this model's shapes (T≈384 post-subsample, head_dim 48) the
(B, H, T, T) attention weights are ~57 MB/layer in bf16; keeping them in
VMEM avoids their HBM round-trips. One grid cell = one batch element with a
statically unrolled head loop; Q, K, V (T, hd) and the fp32 score matrix
(T, T) all fit comfortably in VMEM, so scores and probabilities NEVER touch
HBM:

    HBM traffic/layer fwd:  read 3·B·H·T·hd + write B·H·T·hd   (~19 MB)
    vs XLA:                 + ~2 round-trips of B·H·T·T          (~130 MB)

The backward pass (custom VJP) recomputes the softmax in-kernel from Q and K
(flash-attention-style rematerialization) and emits dQ, dK, dV in a single
pallas_call — the T×T tensors again stay in VMEM.

MEASURED OUTCOME at the production shapes (docs/PERF.md): XLA's own
attention is already at its HBM-traffic floor there (0.18 ms/layer fwd) and
this kernel, despite three layout iterations, lands at 0.77 — fp32 softmax
VPU passes and K=48 matmuls (37% MXU lane utilization) cost more than the
traffic they save. The production default therefore stays
`attention_impl: flax`; this kernel is retained (parity-tested,
checkpoint-compatible) for shapes where whole-problem-in-VMEM does win:
long-T streaming windows and head_dim ≥ 128. Generic Pallas flash attention
loses at BOTH: it tiles T into ≥128 blocks and pads head_dim to 128
(measured 5.7 ms vs 1.2 ms for the flax stack, docs/PERF.md round 1).

Integration: :func:`fused_attention_fn` is a drop-in ``attention_fn`` for
``flax.linen.MultiHeadDotProductAttention``, so the parameter tree — and
therefore every existing checkpoint — is unchanged. Dropout on the attention
weights follows flax's ``broadcast_dropout`` semantics (one (T, T) mask
shared across batch and heads, scaled by 1/keep); the mask is generated
outside the kernel (it is tiny) and applied inside.

Numerics departure (documented): softmax accumulates in fp32 inside the
kernel, where flax-with-bf16-dtype softmaxes in bf16. Same argmax, tighter
rounding; parity tests use a bf16-appropriate tolerance.

Reference behavior being matched: torchaudio Conformer self-attention
(reference ``src/models/conformer.py`` via ``torchaudio.models.Conformer``),
i.e. plain softmax(QKᵀ/√d + key-padding mask)·V.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from ssd_tpu.utils.platform import pallas_interpret
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Score value for masked (padded) key positions. Large enough to zero the
# softmax in fp32, small enough that (score - max) never overflows.
_MASKED = -1e30

# VMEM budget guard: fall back to the XLA path when per-cell buffers
# (3 QKV + out + ~3 fp32 T×T temporaries, double-buffered) would not fit.
_VMEM_CELL_LIMIT_BYTES = 12 * 1024 * 1024


def fits_in_vmem(t: int, hd: int, itemsize: int = 2, heads: int = 1) -> bool:
    """Would one grid cell (all ``heads`` of one batch element) fit VMEM?"""
    qkvo = 4 * heads * t * max(hd, 128) * itemsize * 2  # lane pad + dbl buffer
    tt = 3 * t * t * 4
    return qkvo + tt < _VMEM_CELL_LIMIT_BYTES


def _softmax_fp32(scores: jnp.ndarray) -> jnp.ndarray:
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _dot(a, b):
    """(M,K)@(K,N) in the MXU-native form — no transposed contractions.

    Mosaic lowers transposed `dot_general` dimension numbers via relayout
    copies; at 192 grid cells those dominated v1 of this kernel (8× slower
    than XLA). Every matmul below is therefore plain (M,K)(K,N), with any
    needed transposes done either by XLA outside the kernel (fused, cheap)
    or explicitly on (T,T) tiles inside the backward kernel.
    """
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _attn_fwd_kernel(q_ref, kt_ref, v_ref, m_ref, mult_ref, o_ref, *, scale, has_drop):
    """One grid cell = one batch element; static unrolled loop over heads.

    Slicing the head off the LEADING block dim is free (no lane/sublane
    relayout), and a (B,)-grid amortizes per-grid-step overhead H× vs a
    (B, H) grid.
    """
    valid = m_ref[0, 0, :] != 0  # (Tk,)
    H = q_ref.shape[1]
    for h in range(H):
        q = q_ref[0, h]  # (T, hd) compute dtype
        kt = kt_ref[0, h]  # (hd, T) — pre-transposed by XLA
        s = _dot(q, kt) * jnp.float32(scale)  # (Tq, Tk) fp32
        s = jnp.where(valid[None, :], s, _MASKED)
        w = _softmax_fp32(s)
        if has_drop:
            w = w * mult_ref[:, :].astype(jnp.float32)
        o_ref[0, h] = _dot(w.astype(q.dtype), v_ref[0, h]).astype(o_ref.dtype)


def _attn_bwd_kernel(
    q_ref, kt_ref, k_ref, vt_ref, m_ref, mult_ref, g_ref,
    dq_ref, dk_ref, dv_ref, *, scale, has_drop,
):
    valid = m_ref[0, 0, :] != 0
    H = q_ref.shape[1]
    for h in range(H):
        q = q_ref[0, h]  # (T, hd)
        kt = kt_ref[0, h]  # (hd, T)
        g = g_ref[0, h]  # (T, hd)
        # Rematerialize the probabilities (cheap: the matmul is tiny; saving
        # them would cost a B·H·T·T HBM round-trip — the thing we're killing).
        s = _dot(q, kt) * jnp.float32(scale)
        s = jnp.where(valid[None, :], s, _MASKED)
        w = _softmax_fp32(s)  # (Tq, Tk) fp32

        if has_drop:
            mult = mult_ref[:, :].astype(jnp.float32)
            wd = (w * mult).astype(g.dtype)
        else:
            wd = w.astype(g.dtype)
        # out = wd @ v  ⇒  dv = wdᵀ @ g ; dwd = g @ vᵀ
        dv = _dot(wd.T, g)  # one in-kernel (T,T) transpose
        dwd = _dot(g, vt_ref[0, h])  # (Tq, Tk) fp32
        dw = dwd * mult if has_drop else dwd
        # softmax backward: ds = w ∘ (dw − Σ_k dw∘w)
        ds = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True)) * jnp.float32(scale)
        dsb = ds.astype(q.dtype)
        dq = _dot(dsb, k_ref[0, h])
        dk = _dot(dsb.T, q)  # second (T,T) transpose
        dq_ref[0, h] = dq.astype(dq_ref.dtype)
        dk_ref[0, h] = dk.astype(dk_ref.dtype)
        dv_ref[0, h] = dv.astype(dv_ref.dtype)


def _cell_specs(B, H, T, hd):
    """BlockSpecs for (B,H,T,hd) tensors, (B,1,T) mask, (T,T) dropout mult.

    The mask carries a singleton middle dim because Mosaic requires a block's
    last two dims to be (8k, 128k) or equal to the array's — (1, T) of a
    (B, T) array violates the sublane rule, (1, 1, T) of (B, 1, T) doesn't.
    """
    bh = pl.BlockSpec((1, H, T, hd), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    bht = pl.BlockSpec((1, H, hd, T), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    mask = pl.BlockSpec((1, 1, T), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    mult = pl.BlockSpec((T, T), lambda b: (0, 0), memory_space=pltpu.VMEM)
    return bh, bht, mask, mult


def _fwd_call(has_drop, q, kt, v, kmask, mult):
    B, H, T, hd = q.shape
    scale = 1.0 / math.sqrt(hd)
    bh, bht, maskspec, multspec = _cell_specs(B, H, T, hd)
    interpret = pallas_interpret()
    return pl.pallas_call(
        functools.partial(_attn_fwd_kernel, scale=scale, has_drop=has_drop),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(B,),
        in_specs=[bh, bht, bh, maskspec, multspec],
        out_specs=bh,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * T * T * hd,
            bytes_accessed=q.dtype.itemsize * 4 * B * H * T * hd,
            transcendentals=B * H * T * T,
        ),
    )(q, kt, v, kmask, mult)


def _bwd_call(has_drop, q, kt, k, vt, kmask, mult, g):
    B, H, T, hd = q.shape
    scale = 1.0 / math.sqrt(hd)
    bh, bht, maskspec, multspec = _cell_specs(B, H, T, hd)
    interpret = pallas_interpret()
    shp = jax.ShapeDtypeStruct(q.shape, q.dtype)
    return pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale, has_drop=has_drop),
        out_shape=(shp, shp, shp),
        grid=(B,),
        in_specs=[bh, bht, bh, bht, maskspec, multspec, bh],
        out_specs=(bh, bh, bh),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * B * H * T * T * hd,
            bytes_accessed=q.dtype.itemsize * 7 * B * H * T * hd,
            transcendentals=B * H * T * T,
        ),
    )(q, kt, k, vt, kmask, mult, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_attn(has_drop: bool, q, kt, v, kmask, mult):
    """softmax(q·kᵀ/√hd, key-masked)[∘ dropout mult]·v.

    q, v: (B, H, T, hd); kt: (B, H, hd, T) — the caller pre-transposes k so
    the score matmul is MXU-native inside the kernel.
    """
    return _fwd_call(has_drop, q, kt, v, kmask, mult)


def _fused_attn_fwd(has_drop, q, kt, v, kmask, mult):
    return _fwd_call(has_drop, q, kt, v, kmask, mult), (q, kt, v, kmask, mult)


def _fused_attn_bwd(has_drop, res, g):
    q, kt, v, kmask, mult = res
    # XLA-side layout prep (fused with surrounding graph): k for the dq
    # matmul, vᵀ for the dwd matmul.
    k = jnp.swapaxes(kt, -1, -2)
    vt = jnp.swapaxes(v, -1, -2)
    dq, dk, dv = _bwd_call(has_drop, q, kt, k, vt, kmask, mult, g)
    # the kernel emits dk in (T, hd); the kt primal is (hd, T)
    dkt = jnp.swapaxes(dk, -1, -2)
    return dq, dkt, dv, jnp.zeros_like(kmask), jnp.zeros_like(mult)


_fused_attn.defvjp(_fused_attn_fwd, _fused_attn_bwd)


def fused_attention_fn(
    query: jnp.ndarray,
    key: jnp.ndarray,
    value: jnp.ndarray,
    bias=None,
    mask=None,
    broadcast_dropout: bool = True,
    dropout_rng=None,
    dropout_rate: float = 0.0,
    deterministic: bool = False,
    dtype=None,
    precision=None,
    module=None,
    **_unused,
):
    """Drop-in ``attention_fn`` for ``nn.MultiHeadDotProductAttention``.

    Supports the subset this model uses — key-padding mask broadcastable to
    (B, 1, 1, T), no bias, broadcast dropout — and asserts on anything else
    rather than silently diverging.
    """
    if bias is not None:
        raise NotImplementedError("fused attention: bias not supported")
    B, T, H, hd = query.shape
    if key.shape != query.shape or value.shape != query.shape:
        raise NotImplementedError("fused attention: self-attention shapes only")
    if not fits_in_vmem(T, hd, query.dtype.itemsize, heads=H):
        # per-cell buffers would blow VMEM (very long sequences): use the
        # XLA path, which tiles, rather than failing at Mosaic compile time
        import flax.linen as nn

        return nn.dot_product_attention(
            query, key, value, mask=mask, broadcast_dropout=broadcast_dropout,
            dropout_rng=dropout_rng, dropout_rate=dropout_rate,
            deterministic=deterministic, dtype=dtype, precision=precision,
        )

    qt = jnp.transpose(query, (0, 2, 1, 3))  # (B,H,T,hd) — contiguous per cell
    kt = jnp.transpose(key, (0, 2, 3, 1))  # (B,H,hd,T) — MXU-native for QKᵀ
    vt = jnp.transpose(value, (0, 2, 1, 3))

    if mask is None:
        kmask = jnp.ones((B, 1, T), jnp.int32)
    else:
        # key-padding mask: any (B,1,1,T)-broadcastable boolean
        kmask = jnp.broadcast_to(mask, (B, 1, 1, T))[:, 0, :, :].astype(jnp.int32)

    has_drop = (not deterministic) and dropout_rate > 0.0 and dropout_rng is not None
    if has_drop:
        if not broadcast_dropout:
            raise NotImplementedError("fused attention: per-element dropout")
        keep = 1.0 - dropout_rate
        mult = (
            jax.random.bernoulli(dropout_rng, keep, (T, T)).astype(qt.dtype) / keep
        )
    else:
        mult = jnp.ones((T, T), qt.dtype)

    out = _fused_attn(has_drop, qt, kt, vt, kmask, mult)
    return jnp.transpose(out, (0, 2, 1, 3))  # back to (B,T,H,hd)
