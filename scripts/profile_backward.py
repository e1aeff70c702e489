"""Microbenchmark: forward vs backward cost per encoder component on TPU.

Times jitted forward-only and value_and_grad for the full model and for
ablated Conformer stacks (attention-only, conv-only, ffn-only, bn on/off)
at production shapes, using the two-point slope method (the axon platform's
block_until_ready returns early; a scalar readback is the only true fence).

Usage: python scripts/profile_backward.py [component ...]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ssd_tpu.models.conformer import (
    ConformerBlock,
    EncoderConfig,
    _ConvModule,
    _FeedForward,
    _SelfAttention,
)
import flax.linen as nn

B, T, D = 32, 384, 288  # post-subsample production shapes


def slope(run_n, n_small=5, n_large=25):
    run_n(2)
    t0 = time.perf_counter()
    run_n(n_small)
    t_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    run_n(n_large)
    t_l = time.perf_counter() - t0
    return max((t_l - t_s) / (n_large - n_small), 1e-9)


class Stack(nn.Module):
    """n_layers of a single component (or full block)."""

    cfg: EncoderConfig
    kind: str
    n_layers: int = 6

    @nn.compact
    def __call__(self, x, pad_mask, train: bool):
        c = self.cfg
        for i in range(self.n_layers):
            if self.kind == "block":
                x = ConformerBlock(c, name=f"b{i}")(x, pad_mask, train)
            elif self.kind == "attn":
                x = x + _SelfAttention(c.d_model, c.num_heads, c.dropout, c.dtype, name=f"b{i}")(x, pad_mask, train)
            elif self.kind == "conv":
                x = x + _ConvModule(c.d_model, c.depthwise_conv_kernel_size, c.dropout, c.conv_norm, c.dtype, name=f"b{i}")(x, pad_mask, train)
            elif self.kind == "conv_ln":
                x = x + _ConvModule(c.d_model, c.depthwise_conv_kernel_size, c.dropout, "layer", c.dtype, name=f"b{i}")(x, pad_mask, train)
            elif self.kind == "ffn":
                x = x + 0.5 * _FeedForward(c.d_model, c.ffn_dim, c.dropout, c.dtype, name=f"b{i}")(x, train)
            else:
                raise ValueError(self.kind)
        return x


def bench_component(kind: str, cfg: EncoderConfig, dropout: bool = True):
    c = EncoderConfig(
        input_dim=cfg.input_dim, d_model=cfg.d_model, num_layers=cfg.num_layers,
        num_heads=cfg.num_heads, ffn_dim=cfg.ffn_dim,
        depthwise_conv_kernel_size=cfg.depthwise_conv_kernel_size,
        dropout=cfg.dropout if dropout else 0.0,
        subsample_factor=cfg.subsample_factor, conv_norm=cfg.conv_norm,
        compute_dtype=cfg.compute_dtype,
    )
    model = Stack(cfg=c, kind=kind)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    lengths = jnp.asarray(rng.integers(T // 2, T + 1, size=B).astype(np.int32))
    pad_mask = jnp.arange(T)[None, :] < lengths[:, None]
    variables = model.init(jax.random.PRNGKey(0), x, pad_mask, False)
    params = variables["params"]
    bs = variables.get("batch_stats", {})
    drop_rng = jax.random.key(1, impl="rbg")

    @jax.jit
    def fwd(params, x):
        out = model.apply(
            {"params": params, "batch_stats": bs}, x, pad_mask, True,
            rngs={"dropout": drop_rng}, mutable=["batch_stats"],
        )
        return jnp.sum(out[0].astype(jnp.float32))

    @jax.jit
    def fwdbwd(params, x):
        def loss(p):
            out = model.apply(
                {"params": p, "batch_stats": bs}, x, pad_mask, True,
                rngs={"dropout": drop_rng}, mutable=["batch_stats"],
            )
            return jnp.sum(out[0].astype(jnp.float32))

        val, grads = jax.value_and_grad(loss)(params)
        return val + sum(jnp.sum(g.astype(jnp.float32)) for g in jax.tree_util.tree_leaves(grads))

    def run_fwd(n):
        v = None
        for _ in range(n):
            v = fwd(params, x)
        float(v)

    def run_fwdbwd(n):
        v = None
        for _ in range(n):
            v = fwdbwd(params, x)
        float(v)

    t_f = slope(run_fwd)
    t_fb = slope(run_fwdbwd)
    t_b = t_fb - t_f
    print(
        f"{kind:10s} dropout={int(dropout)}  fwd {t_f*1e3:7.2f} ms   "
        f"fwd+bwd {t_fb*1e3:7.2f} ms   bwd {t_b*1e3:7.2f} ms   bwd/fwd {t_b/t_f:5.2f}x",
        flush=True,
    )


def main():
    cfg = EncoderConfig(
        input_dim=640, d_model=288, num_layers=6, num_heads=6, ffn_dim=1152,
        depthwise_conv_kernel_size=15, dropout=0.12, subsample_factor=2,
        compute_dtype="bfloat16",
    )
    kinds = sys.argv[1:] or ["block", "attn", "conv", "conv_ln", "ffn"]
    for kind in kinds:
        if kind.endswith("_nodrop"):
            bench_component(kind[: -len("_nodrop")], cfg, dropout=False)
        else:
            bench_component(kind, cfg)


if __name__ == "__main__":
    main()
