"""Depthwise 1-D convolution as a Pallas stencil — the conv module's hot op.

XLA lowers ``lax.conv_general_dilated`` with ``feature_group_count = C`` to a
generic grouped-conv path that measures ~8× above the HBM-traffic floor at
this model's shapes (B=32, T=384, C=288, K=15 — see docs/PERF.md). The op is
pure VPU stencil work: y[t, c] = Σ_j w[j, c] · x[t+j−pad, c] (+ bias), so
one grid cell = one batch element, the (T, C) tile lives in VMEM, and the
K=15 taps are a statically unrolled shifted-multiply-add loop.

Backward (custom VJP):
* dx = the same stencil with the kernel flipped (correlation ↔ convolution);
* dw[j, c] = Σ_{b,t} g[t, c] · x[t+j−pad, c] — each grid cell emits a
  (K, C) fp32 partial, summed over B by XLA outside the kernel;
* db = Σ g, computed directly by XLA.

Checkpoint compatibility: :class:`DepthwiseConv1d` names its parameters
``kernel`` (K, 1, C) and ``bias`` (C,) exactly like the ``nn.Conv`` it
replaces, so existing checkpoints load unchanged.

Reference behavior: the depthwise conv inside torchaudio's Conformer conv
module (reference ``src/models/conformer.py`` via torchaudio), 'SAME'
padding via pad = (K−1)//2.
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp

from ssd_tpu.utils.platform import pallas_interpret
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad_rows(v, before, total):
    """Zero-pad rows of (t, C) to ``total`` rows with ``before`` leading."""
    return jnp.pad(v, ((before, total - before - v.shape[0]), (0, 0)))


def _fwd_kernel(x_ref, w_ref, b_ref, y_ref, *, pad):
    x = x_ref[0]  # (T, C)
    T = x.shape[0]
    K = w_ref.shape[0]
    acc = jnp.broadcast_to(b_ref[0, :].astype(jnp.float32), x.shape)
    for j in range(K):
        off = j - pad
        lo, hi = max(0, -off), min(T, T - off)  # valid y rows for tap j
        src = x[lo + off : hi + off]  # x rows feeding those y rows
        acc = acc + _pad_rows(
            (src * w_ref[j][None, :]).astype(jnp.float32), lo, T
        )
    y_ref[0] = acc.astype(y_ref.dtype)


def _bwd_kernel(x_ref, w_ref, g_ref, dx_ref, dwp_ref, *, pad):
    x = x_ref[0]  # (T, C)
    g = g_ref[0]  # (T, C)
    T = x.shape[0]
    K = w_ref.shape[0]
    # dx: correlation of g with the flipped kernel — same stencil, tap
    # j contributes w[j] · g[t − (j − pad)].
    acc = jnp.zeros(x.shape, jnp.float32)
    for j in range(K):
        off = pad - j
        lo, hi = max(0, -off), min(T, T - off)
        src = g[lo + off : hi + off]
        acc = acc + _pad_rows((src * w_ref[j][None, :]).astype(jnp.float32), lo, T)
    dx_ref[0] = acc.astype(dx_ref.dtype)
    # dw partials: dw[j, c] = Σ_t g[t, c] · x[t + j − pad, c] for this batch.
    for j in range(K):
        off = j - pad
        lo, hi = max(0, -off), min(T, T - off)
        prod = g[lo:hi].astype(jnp.float32) * x[lo + off : hi + off].astype(jnp.float32)
        dwp_ref[0, j] = jnp.sum(prod, axis=0)


def _fwd_call(x, w, b, pad):
    B, T, C = x.shape
    K = w.shape[0]
    interpret = pallas_interpret()
    return pl.pallas_call(
        functools.partial(_fwd_kernel, pad=pad),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * C * K,
            bytes_accessed=x.dtype.itemsize * 2 * B * T * C,
            transcendentals=0,
        ),
    )(x, w, b[None, :])


def _bwd_call(x, w, g, pad):
    B, T, C = x.shape
    K = w.shape[0]
    interpret = pallas_interpret()
    dx, dwp = pl.pallas_call(
        functools.partial(_bwd_kernel, pad=pad),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((B, K, C), jnp.float32),
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, T, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * T * C * K,
            bytes_accessed=x.dtype.itemsize * 3 * B * T * C,
            transcendentals=0,
        ),
    )(x, w, g)
    return dx, jnp.sum(dwp, axis=0)


@jax.custom_vjp
def depthwise_conv1d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """'SAME'-padded depthwise conv: x (B,T,C), w (K,C), b (C,) → (B,T,C).

    Odd kernel sizes only: with even K, ``nn.Conv`` + symmetric padding emits
    T−1 frames while this kernel always emits T, so the drop-in equivalence
    would silently break (the model uses K=15/31, so this costs nothing).
    """
    if w.shape[0] % 2 == 0:
        raise ValueError(
            f"depthwise_conv1d requires an odd kernel size, got K={w.shape[0]}"
        )
    return _fwd_call(x, w, b, (w.shape[0] - 1) // 2)


def _dw_fwd(x, w, b):
    return depthwise_conv1d(x, w, b), (x, w, b)


def _dw_bwd(res, g):
    x, w, b = res
    dx, dw = _bwd_call(x, w, g, (w.shape[0] - 1) // 2)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1))
    return dx, dw.astype(w.dtype), db.astype(b.dtype)


depthwise_conv1d.defvjp(_dw_fwd, _dw_bwd)


class DepthwiseConv1d(nn.Module):
    """Drop-in for ``nn.Conv(features=C, kernel_size=(K,), feature_group_count=C)``.

    Identical parameter names/shapes (``kernel`` (K, 1, C), ``bias`` (C,)), so
    checkpoints trained with either implementation interchange freely.
    """

    features: int
    kernel_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        K, C = self.kernel_size, self.features
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (K, 1, C), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        return depthwise_conv1d(
            x.astype(self.dtype), kernel[:, 0, :].astype(self.dtype), bias.astype(self.dtype)
        )
