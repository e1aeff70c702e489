"""Compare attention implementations at production shapes on TPU.

Variants (6-layer attn-only stacks, B=32 T=384 D=288 H=6 d=48, bf16):
  flax / flax_drop   — nn.MultiHeadDotProductAttention (current), ±dropout
  fused / fused_drop — one fused (D → 3·H·hd) qkv projection, ±broadcast drop
  fused_fastdrop     — fused qkv + rng_dropout on the FULL (B,H,T,T) weights
  jnn    — DenseGeneral qkv + jax.nn.dot_product_attention + out proj
  flash  — DenseGeneral qkv + pallas TPU flash_attention + out proj

All fused variants were measured and REJECTED for the production model — see
docs/PERF.md "What was measured and rejected".
"""

from __future__ import annotations

import sys
import time

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

B, T, D, H = 32, 384, 288, 6
HD = D // H


def slope(run_n, n_small=5, n_large=25):
    run_n(2)
    t0 = time.perf_counter()
    run_n(n_small)
    t_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    run_n(n_large)
    t_l = time.perf_counter() - t0
    return max((t_l - t_s) / (n_large - n_small), 1e-9)


class AttnVariant(nn.Module):
    impl: str
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, pad_mask, lengths):
        x = nn.LayerNorm(dtype=jnp.float32, name="ln")(x)
        if self.impl in ("flax", "flax_drop"):
            drop = self.impl == "flax_drop"
            return nn.MultiHeadDotProductAttention(
                num_heads=H, qkv_features=D, out_features=D,
                dropout_rate=0.12 if drop else 0.0, deterministic=not drop,
                dtype=self.dtype, name="mha",
            )(x, x, mask=pad_mask[:, None, None, :])
        if self.impl in ("fused", "fused_drop", "fused_fastdrop"):
            # fused-QKV variant — MEASURED AND REJECTED for the production
            # model (docs/PERF.md): wins the isolated stack (3.55 vs 4.10 ms
            # fwd+bwd w/ broadcast dropout) but the full train step regresses
            # 14.5 → 14.8 ms/step. fused_fastdrop additionally shows that
            # rng_dropout on the full (B,H,T,T) weights costs ~3 ms/stack —
            # regenerating 2²⁷ bits in backward loses to flax's broadcast
            # (1,1,T,T) mask.
            import math

            from ssd_tpu.ops.dropout import rng_dropout

            qkv = nn.DenseGeneral((3, H, HD), dtype=self.dtype, name="qkv")(x)
            q = qkv[:, :, 0] * jnp.asarray(1.0 / math.sqrt(HD), qkv.dtype)
            k, v = qkv[:, :, 1], qkv[:, :, 2]
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k)
            big_neg = jnp.asarray(jnp.finfo(scores.dtype).min, scores.dtype)
            scores = jnp.where(pad_mask[:, None, None, :], scores, big_neg)
            w = jax.nn.softmax(scores, axis=-1)
            if self.impl == "fused_drop":
                w = nn.Dropout(rate=0.12, broadcast_dims=(0, 1), deterministic=False)(w)
            elif self.impl == "fused_fastdrop":
                w = rng_dropout(w, self.make_rng("dropout"), 0.12)
            o = jnp.einsum("bhqk,bkhd->bqhd", w, v)
            return nn.DenseGeneral(D, axis=(-2, -1), dtype=self.dtype, name="out")(o)
        q = nn.DenseGeneral((H, HD), dtype=self.dtype, name="query")(x)
        k = nn.DenseGeneral((H, HD), dtype=self.dtype, name="key")(x)
        v = nn.DenseGeneral((H, HD), dtype=self.dtype, name="value")(x)
        if self.impl == "jnn":
            o = jax.nn.dot_product_attention(
                q, k, v, mask=pad_mask[:, None, None, :]
            )
        elif self.impl == "jnn_lens":
            o = jax.nn.dot_product_attention(
                q, k, v,
                query_seq_lengths=lengths, key_value_seq_lengths=lengths,
            )
        elif self.impl == "flash":
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                BlockSizes, SegmentIds, flash_attention,
            )

            seg = jnp.where(pad_mask, 1, 0).astype(jnp.int32)
            # flash kernel wants (B, H, T, d)
            qt = jnp.moveaxis(q, 1, 2)
            kt = jnp.moveaxis(k, 1, 2)
            vt = jnp.moveaxis(v, 1, 2)
            o = flash_attention(
                qt, kt, vt,
                segment_ids=SegmentIds(q=seg, kv=seg),
                sm_scale=1.0 / np.sqrt(HD),
            )
            o = jnp.moveaxis(o, 1, 2)
        else:
            raise ValueError(self.impl)
        return nn.DenseGeneral(D, axis=(-2, -1), dtype=self.dtype, name="out")(o)


class Stack(nn.Module):
    impl: str

    @nn.compact
    def __call__(self, x, pad_mask, lengths):
        for i in range(6):
            x = x + AttnVariant(self.impl, name=f"b{i}")(x, pad_mask, lengths)
        return x


def bench(impl):
    model = Stack(impl)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32)).astype(jnp.bfloat16)
    lengths = jnp.asarray(rng.integers(T // 2, T + 1, size=B).astype(np.int32))
    pad_mask = jnp.arange(T)[None, :] < lengths[:, None]
    rngs = (
        {"dropout": jax.random.key(7, impl="rbg")}
        if impl.endswith(("_drop", "_fastdrop"))
        else None
    )
    params = model.init(jax.random.PRNGKey(0), x, pad_mask, lengths)["params"]

    @jax.jit
    def fwd(p, x):
        return jnp.sum(
            model.apply({"params": p}, x, pad_mask, lengths, rngs=rngs).astype(jnp.float32)
        )

    @jax.jit
    def fwdbwd(p, x):
        v, g = jax.value_and_grad(
            lambda pp: jnp.sum(
                model.apply({"params": pp}, x, pad_mask, lengths, rngs=rngs).astype(jnp.float32)
            )
        )(p)
        return v + sum(jnp.sum(t.astype(jnp.float32)) for t in jax.tree_util.tree_leaves(g))

    def run_f(n):
        v = None
        for _ in range(n):
            v = fwd(params, x)
        float(v)

    def run_fb(n):
        v = None
        for _ in range(n):
            v = fwdbwd(params, x)
        float(v)

    t_f, t_fb = slope(run_f), slope(run_fb)
    print(f"{impl:10s} fwd {t_f*1e3:6.2f} ms   fwd+bwd {t_fb*1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    for impl in sys.argv[1:] or ["flax", "jnn", "jnn_lens", "flash"]:
        try:
            bench(impl)
        except Exception as e:
            print(f"{impl:10s} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
