"""Conformer EMG encoder (flax).

Behavioral rebuild of the reference encoder (``src/models/emg_encoder.py``):
a strided-conv temporal subsampler followed by N Conformer blocks with
torchaudio ``models.Conformer`` semantics —

* macaron half-residual feed-forward sandwiches (LayerNorm → Linear → SiLU →
  Dropout → Linear → Dropout, scaled by ½),
* multi-head self-attention with a key-padding mask and **no positional
  encoding** (the depthwise conv module carries position),
* conv module: LayerNorm → pointwise 2d → GLU → depthwise(k) → BatchNorm →
  SiLU → pointwise → Dropout,
* per-block final LayerNorm.

Length arithmetic of the subsampler replays the conv formula
``floor((L + 2p − k)/s) + 1`` exactly (reference ``emg_encoder.py:67-74``) —
required for CTC length parity.

All shapes are static; padding is handled with masks so a single compiled
executable serves a length bucket.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ssd_tpu.ops.dropout import FastDropout
from ssd_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, ambient_model_axis_size


def _sp(x: jnp.ndarray, enabled: bool, shard_t: bool = True, shard_f: bool = False):
    """Sequence-parallel activation sharding constraint (Megatron-SP style).

    ``shard_t``: shard the time axis of (B, T, ·) over ``model`` — the layout
    for the per-position regions (norms, dropout, residual adds, the whole
    conv module), where it divides that elementwise work and its activation
    memory by the tensor-parallel degree. ``shard_f``: shard the feature axis
    instead — the layout of the FFN hidden, matching the column-parallel
    ``w1``. Neither: full-T per data shard (the attention region, where every
    query needs all keys). GSPMD turns the layout changes into the standard
    all-gather / reduce-scatter pair that replaces tensor parallelism's
    all-reduces (same bytes, but the sandwiched elementwise work runs
    1/model-th per chip).

    No-op when traced outside a ``with mesh:`` whose ``model`` axis is >1, so
    the same module serves single-device eval/serving unchanged.
    """
    if not enabled or ambient_model_axis_size() <= 1:
        return x
    spec = (DATA_AXIS, MODEL_AXIS if shard_t else None, MODEL_AXIS if shard_f else None)
    return jax.lax.with_sharding_constraint(x, jax.sharding.PartitionSpec(*spec))


@dataclass(frozen=True)
class EncoderConfig:
    """Mirrors the reference ``EncoderConfig`` (``emg_encoder.py:13-22``)."""

    input_dim: int
    d_model: int = 256
    num_layers: int = 6
    num_heads: int = 4
    ffn_dim: int = 512
    depthwise_conv_kernel_size: int = 15
    dropout: float = 0.1
    subsample_factor: int = 4
    conv_norm: str = "batch"  # batch (torchaudio parity) | layer
    compute_dtype: str = "float32"  # float32 | bfloat16 (params stay fp32)
    remat: bool = False  # rematerialize blocks in backward (memory ↔ FLOPs)
    # What remat SAVES (only read when remat: true). full: save nothing,
    # recompute the whole block (max memory savings, max recompute). dots:
    # save matmul outputs (jax.checkpoint_policies.checkpoint_dots) — the
    # backward recomputes only cheap elementwise/norm work, trading a little
    # memory for most of full-remat's step-time cost back. dots_no_batch:
    # like dots but skips batched dots (saves less, recomputes more).
    remat_policy: str = "full"  # full | dots | dots_no_batch
    # flax: XLA dot_product_attention. fused: whole-head-in-VMEM Pallas
    # kernel (ops/attention.py) — same params/checkpoints, fp32 softmax.
    attention_impl: str = "flax"  # flax | fused
    # Rematerialize ONLY the attention submodule: the (B, H, T, T) score/
    # probability tensors are the largest residuals in the step by far
    # (57 MB/block at flagship shapes — the round-4 device trace attributes
    # 2.6 ms/step of zero-FLOP copies/waits to staging them for backward).
    # With attn_remat the backward recomputes attention from the 8.5 MB
    # block input instead. Math-identical (equivalence-tested); ignored
    # when remat: true (block-level remat already subsumes it).
    attn_remat: bool = False
    # lax: nn.Conv grouped conv. pallas: VMEM stencil (ops/depthwise_conv.py)
    # — same params/checkpoints.
    depthwise_impl: str = "lax"  # lax | pallas
    # none: dense matmuls in compute_dtype. int8: INFERENCE-ONLY dynamic
    # W8A8 on the FFN / conv-pointwise Dense layers (ops/quant.py) — same
    # params/checkpoints, ~2× MXU rate on v5e; training always runs float.
    quantize: str = "none"  # none | int8
    # Megatron-style sequence parallelism: under a >1 `model` mesh axis,
    # activations in the per-position regions are sharded on T over `model`
    # (see _sp above). Checkpoint-compatible (annotations only, no params);
    # ignored outside a model-parallel mesh. parallel: {sequence: true}.
    sequence_parallel: bool = False
    # Roll the block stack into one nn.scan'd program: params/batch_stats get
    # a leading (num_layers,) axis and XLA compiles ONE block body regardless
    # of depth (compile time O(1) in num_layers — matters for the scaled-up
    # encoders, where unrolled xl compiles take minutes on the remote
    # compiler). Math-identical to the unrolled stack; checkpoints convert
    # both ways via stack_block_tree/unstack_block_tree.
    scan_layers: bool = False
    # >0: GPipe pipeline parallelism — the block stack (same stacked
    # blocks/block layout as scan_layers) runs microbatch-pipelined over the
    # `model` mesh axis as stages (ssd_tpu/parallel/pipeline.py). Requires
    # conv_norm: layer; excludes scan_layers/sequence_parallel/tp. Without a
    # >1 `model` mesh the same checkpoint runs as a plain scan.
    pipeline_microbatches: int = 0

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    def conv_meta(self) -> list[dict]:
        """(kernel, stride, padding) per subsampler conv — length arithmetic."""
        metas = []
        remaining = self.subsample_factor
        while remaining > 1:
            metas.append({"kernel_size": 5, "stride": 2, "padding": 2})
            remaining //= 2
        if not metas:
            metas.append({"kernel_size": 1, "stride": 1, "padding": 0})
        return metas


def subsampled_lengths(lengths: jnp.ndarray, cfg: EncoderConfig) -> jnp.ndarray:
    out = lengths
    for m in cfg.conv_meta():
        out = (out + 2 * m["padding"] - m["kernel_size"]) // m["stride"] + 1
    return out


def _length_mask(lengths: jnp.ndarray, t: int) -> jnp.ndarray:
    """(B,) lengths → (B, t) bool validity mask."""
    return jnp.arange(t)[None, :] < lengths[:, None]


class Conv1dSubsampler(nn.Module):
    """Temporal ×2ᵏ subsampling with stride-2 convs + ReLU (k=5, p=2)."""

    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        metas = self.cfg.conv_meta()
        for i, m in enumerate(metas):
            x = nn.Conv(
                features=self.cfg.d_model,
                kernel_size=(m["kernel_size"],),
                strides=(m["stride"],),
                padding=[(m["padding"], m["padding"])],
                dtype=self.cfg.dtype,
                name=f"conv_{i}",
            )(x)
            if m["stride"] > 1:
                x = nn.relu(x)
        return x


def _dense_dot_general(quantize: str, train: bool):
    """Dense ``dot_general`` override: int8 W8A8 at inference, else default.

    Quantized TRAINING is deliberately not supported (no QAT here): with
    ``quantize: int8`` the forward quantizes only when ``train=False``, so
    a float-trained checkpoint serves quantized with the same param tree.
    """
    if quantize == "int8" and not train:
        from ssd_tpu.ops.quant import int8_dot_general

        return int8_dot_general
    return None  # flax default (lax.dot_general)


def _dense_cls(quantize: str, train: bool, dtype):
    """Constructor for the FFN / conv-pointwise Dense layers.

    ``int8``: flax Dense with the dynamic W8A8 ``dot_general`` hook (same
    param tree as float). ``int8_prequant``: QuantDense over the
    weight-prequantized tree ``ops.quant.prequantize_tree`` produces —
    int8 kernel + per-channel scale loaded once, the forward pays only the
    activation-side quantization. Inference-only either way.
    """
    if quantize == "int8_prequant":
        if train:
            raise ValueError(
                "quantize=int8_prequant is inference-only (the param tree "
                "holds int8 kernels); train with quantize: none"
            )
        from ssd_tpu.ops.quant import QuantDense

        return lambda features, name: QuantDense(features, dtype=dtype, name=name)
    dg = _dense_dot_general(quantize, train)
    return lambda features, name: nn.Dense(
        features, dtype=dtype, dot_general=dg, name=name
    )


class _FeedForward(nn.Module):
    d_model: int
    ffn_dim: int
    dropout: float
    dtype: jnp.dtype = jnp.float32
    quantize: str = "none"
    sequence_parallel: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        dense = _dense_cls(self.quantize, train, self.dtype)
        sp = self.sequence_parallel
        x = nn.LayerNorm(dtype=jnp.float32, name="ln")(x)
        x = dense(self.ffn_dim, name="w1")(x)
        # hidden sharded on the ffn dim (column-parallel w1): the all-gather
        # of T happens on the d_model-wide input, not this ffn_dim-wide tensor
        x = _sp(x, sp, shard_t=False, shard_f=True)
        x = nn.silu(x)
        x = FastDropout(self.dropout, deterministic=not train)(x)
        x = dense(self.d_model, name="w2")(x)
        # back to sequence-sharded: row-parallel w2's psum becomes a
        # reduce-scatter, and the trailing dropout runs 1/model-th per chip
        x = _sp(x, sp)
        return FastDropout(self.dropout, deterministic=not train)(x)


class MaskedBatchNorm(nn.Module):
    """BatchNorm whose batch statistics ignore padded frames.

    Departure from torchaudio (which normalizes over padded frames too),
    chosen deliberately: with length-bucketed static shapes the model output
    must not depend on the bucket's padded length. Running stats live in the
    ``batch_stats`` collection, torch-compatible momentum 0.1 (flax 0.9).
    """

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray, train: bool) -> jnp.ndarray:
        d = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((d,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((d,)))
        scale = self.param("scale", nn.initializers.ones, (d,))
        bias = self.param("bias", nn.initializers.zeros, (d,))

        if train:
            # single-pass masked statistics (E[x²] − E[x]²) in fp32: one
            # reduction over the activation instead of two, and the fp32
            # cast fuses into the reduce — x itself is never materialized
            # in fp32 (backward cost: measured ~1 ms/step at production
            # shapes for the two-pass fp32 version)
            m = mask[:, :, None].astype(jnp.float32)
            xf = x.astype(jnp.float32)
            cnt = jnp.maximum(jnp.sum(m), 1.0)
            mean = jnp.sum(xf * m, axis=(0, 1)) / cnt
            ex2 = jnp.sum(jnp.square(xf) * m, axis=(0, 1)) / cnt
            var = jnp.maximum(ex2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        # normalize in the input dtype: per-channel affine precomputed in
        # fp32, applied as one fused multiply-add
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        a = inv.astype(x.dtype)
        b = (bias - mean * inv).astype(x.dtype)
        return x * a + b


class _ConvModule(nn.Module):
    d_model: int
    kernel_size: int
    dropout: float
    conv_norm: str

    dtype: jnp.dtype = jnp.float32
    depthwise_impl: str = "lax"  # lax | pallas (same param tree)
    quantize: str = "none"
    sequence_parallel: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, pad_mask: jnp.ndarray, train: bool) -> jnp.ndarray:
        # the whole conv module is per-position (pointwise matmuls, GLU,
        # BatchNorm psums over the sharded axis, SiLU) except the depthwise
        # conv's K-1 halo — it runs entirely sequence-sharded
        dense = _dense_cls(self.quantize, train, self.dtype)
        x = _sp(x, self.sequence_parallel)
        x = nn.LayerNorm(dtype=jnp.float32, name="ln")(x)
        x = dense(2 * self.d_model, name="pw1")(x)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * nn.sigmoid(b)  # GLU
        # zero padded frames so the depthwise conv sees the same zeros a
        # shorter bucket would — exact padding invariance
        x = jnp.where(pad_mask[:, :, None], x, jnp.zeros((), x.dtype))
        pad = (self.kernel_size - 1) // 2
        if self.depthwise_impl == "pallas":
            from ssd_tpu.ops.depthwise_conv import DepthwiseConv1d

            x = DepthwiseConv1d(
                features=self.d_model,
                kernel_size=self.kernel_size,
                dtype=self.dtype,
                name="dw",
            )(x)
        else:
            x = nn.Conv(
                features=self.d_model,
                kernel_size=(self.kernel_size,),
                padding=[(pad, pad)],
                feature_group_count=self.d_model,
                dtype=self.dtype,
                name="dw",
            )(x)
        if self.conv_norm == "batch":
            x = MaskedBatchNorm(name="bn")(x, pad_mask, train)
        else:
            x = nn.LayerNorm(dtype=jnp.float32, name="cn")(x)
        x = nn.silu(x)
        x = dense(self.d_model, name="pw2")(x)
        x = _sp(x, self.sequence_parallel)
        return FastDropout(self.dropout, deterministic=not train)(x)


class _SelfAttention(nn.Module):
    d_model: int
    num_heads: int
    dropout: float
    dtype: jnp.dtype = jnp.float32
    impl: str = "flax"  # flax | fused (ops/attention.py, same param tree)
    sequence_parallel: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, pad_mask: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = nn.LayerNorm(dtype=jnp.float32, name="ln")(x)
        # every query attends to all keys → gather the full T here (the
        # narrowest point: one d_model-wide all-gather per block under sp);
        # inside MHA the head axis is what the tp rules shard
        x = _sp(x, self.sequence_parallel, shard_t=False)
        # key-padding mask: every query may attend to all *valid* keys
        attn_mask = pad_mask[:, None, None, :]  # (B, 1, 1, T)
        attention_fn = nn.dot_product_attention
        if self.impl == "fused":
            from ssd_tpu.ops.attention import fused_attention_fn

            attention_fn = fused_attention_fn
        x = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.d_model,
            out_features=self.d_model,
            dropout_rate=self.dropout,
            deterministic=not train,
            dtype=self.dtype,
            attention_fn=attention_fn,
            name="mha",
        )(x, x, mask=attn_mask)
        # row-parallel out-projection: back to sequence-sharded (psum →
        # reduce-scatter), dropout + residual add run sharded
        x = _sp(x, self.sequence_parallel)
        return FastDropout(self.dropout, deterministic=not train)(x)


class ConformerBlock(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, pad_mask: jnp.ndarray, train: bool) -> jnp.ndarray:
        c = self.cfg
        sp = c.sequence_parallel
        x = _sp(x, sp)  # residual stream sequence-sharded between modules
        x = x + 0.5 * _FeedForward(
            c.d_model, c.ffn_dim, c.dropout, c.dtype, c.quantize, sp, name="ffn1"
        )(x, train)
        attn_cls = _SelfAttention
        if c.attn_remat and not c.remat:
            # Save only the attention submodule's inputs; the (B, H, T, T)
            # probs are recomputed in backward instead of being staged as
            # residuals (the biggest zero-FLOP cost in the round-4 trace).
            attn_cls = nn.remat(_SelfAttention, static_argnums=(3,))
        x = x + attn_cls(
            c.d_model, c.num_heads, c.dropout, c.dtype, c.attention_impl, sp,
            name="attn",
        )(x, pad_mask, train)
        x = x + _ConvModule(
            c.d_model, c.depthwise_conv_kernel_size, c.dropout, c.conv_norm, c.dtype,
            c.depthwise_impl, c.quantize, sp, name="conv",
        )(x, pad_mask, train)
        x = x + 0.5 * _FeedForward(
            c.d_model, c.ffn_dim, c.dropout, c.dtype, c.quantize, sp, name="ffn2"
        )(x, train)
        return nn.LayerNorm(dtype=jnp.float32, name="final_ln")(x)


_ATTN_REMAT_WARNED = False

_REMAT_POLICIES = {
    "full": None,  # save nothing — recompute the whole block in backward
    "dots": "checkpoint_dots",
    "dots_no_batch": "checkpoint_dots_with_no_batch_dims",
}


def _block_cls(cfg: EncoderConfig):
    """ConformerBlock, wrapped in nn.remat per (remat, remat_policy)."""
    if not cfg.remat:
        return ConformerBlock
    if cfg.attn_remat:
        # block-level remat already recomputes attention; the finer knob is
        # inert here — say so once per process (this runs on every trace:
        # init + each jit compile) instead of silently ignoring the config
        global _ATTN_REMAT_WARNED
        if not _ATTN_REMAT_WARNED:
            _ATTN_REMAT_WARNED = True
            import logging

            logging.getLogger(__name__).warning(
                "attn_remat=True is subsumed by remat=True (the whole block "
                "is rematerialized); the attention-only knob has no effect."
            )
    if cfg.remat_policy not in _REMAT_POLICIES:
        raise ValueError(
            f"remat_policy={cfg.remat_policy!r} — expected one of "
            f"{sorted(_REMAT_POLICIES)}"
        )
    policy_name = _REMAT_POLICIES[cfg.remat_policy]
    kwargs: dict = {"static_argnums": (3,)}
    if policy_name is not None:
        kwargs["policy"] = getattr(jax.checkpoint_policies, policy_name)
    return nn.remat(ConformerBlock, **kwargs)


class _ScanBody(nn.Module):
    """One scan step: carry = activations; layer-stacked params/stats."""

    cfg: EncoderConfig
    train: bool

    @nn.compact
    def __call__(self, x: jnp.ndarray, pad_mask: jnp.ndarray):
        return _block_cls(self.cfg)(self.cfg, name="block")(
            x, pad_mask, self.train
        ), None


def _scan_blocks(cfg: EncoderConfig, train: bool):
    """nn.scan over the block stack: one compiled body, (L, …) params."""
    return nn.scan(
        _ScanBody,
        variable_axes={"params": 0, "batch_stats": 0},
        split_rngs={"params": True, "dropout": True},
        in_axes=(nn.broadcast,),  # pad_mask is the same every layer
        length=cfg.num_layers,
    )(cfg, train, name="blocks")


def stack_block_tree(tree: dict, num_layers: int) -> dict:
    """Convert an unrolled encoder subtree (``block_0`` … ``block_{L-1}``)
    to the scan layout (``blocks/block`` with a leading (L,) axis on every
    leaf). Non-block entries (subsampler, …) pass through unchanged. Works
    for ``params`` and ``batch_stats`` collections alike."""
    out = {k: v for k, v in tree.items() if not k.startswith("block_")}
    blocks = [tree[f"block_{i}"] for i in range(num_layers)]
    out["blocks"] = {
        "block": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
    }
    return out


def unstack_block_tree(tree: dict, num_layers: int) -> dict:
    """Inverse of :func:`stack_block_tree`."""
    out = {k: v for k, v in tree.items() if k != "blocks"}
    stacked = tree["blocks"]["block"]
    for i in range(num_layers):
        out[f"block_{i}"] = jax.tree_util.tree_map(lambda x: x[i], stacked)
    return out


class EMGConformerEncoder(nn.Module):
    """Subsampler + Conformer stack. Returns (hidden, out_lengths)."""

    cfg: EncoderConfig

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        lengths: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        c = self.cfg
        x = Conv1dSubsampler(c, name="subsample")(x)
        t_out = x.shape[1]
        if lengths is None:
            lengths = jnp.full((x.shape[0],), x.shape[1] * c.subsample_factor)
        out_lengths = jnp.clip(subsampled_lengths(lengths, c), 0, t_out)
        pad_mask = _length_mask(out_lengths, t_out)
        if c.pipeline_microbatches > 0:
            from ssd_tpu.parallel.pipeline import (
                init_stacked_blocks,
                pipelined_stack,
            )

            stacked = self.param(
                "blocks", lambda rng: init_stacked_blocks(c, rng, c.d_model)
            )
            key = (
                self.make_rng("dropout")
                if train and c.dropout > 0 and self.has_rng("dropout")
                else None
            )
            if self.is_initializing():
                # init only shapes the params — no need to satisfy the
                # pipeline's batch-divisibility contract on the dummy batch
                from ssd_tpu.parallel.pipeline import scan_stack

                x = scan_stack(c, stacked["block"], x, pad_mask, train, key)
            else:
                x = pipelined_stack(
                    c, stacked["block"], x, pad_mask, train, key,
                    c.pipeline_microbatches,
                )
        elif c.scan_layers:
            # scan carries must be dtype-stable: blocks emit fp32 (final_ln)
            # while the subsampler emits compute_dtype. fp32 is the right
            # uniform carry — under bf16 the unrolled stack runs block_0's
            # residual adds in bf16 and every later block's in fp32, a mixed
            # scheme no stable carry reproduces; fp32 everywhere is the
            # strictly-more-precise resolution (block_0 outputs differ from
            # unrolled by one bf16 rounding; fp32 compute is bit-identical —
            # tests/test_scan_layers.py pins both).
            x, _ = _scan_blocks(c, train)(x.astype(jnp.float32), pad_mask)
        else:
            block_cls = _block_cls(c)
            for i in range(c.num_layers):
                x = block_cls(c, name=f"block_{i}")(x, pad_mask, train)
        # leave sequence parallelism: heads are cheap per-position matmuls but
        # the CTC scan consumes full (B, T', V) rows per example
        x = _sp(x, c.sequence_parallel, shard_t=False)
        # zero padded frames (torchaudio masks attention only, but downstream
        # losses/decoders here consume masked positions explicitly anyway)
        x = jnp.where(pad_mask[:, :, None], x, 0.0)
        return x.astype(jnp.float32), out_lengths
