"""GPipe-style pipeline parallelism for the Conformer stack.

The reference is strictly single-device (SURVEY.md §2 "Parallelism"); this
module is the scaled-encoder growth path, TPU-native: the ``model`` mesh axis
becomes a ring of pipeline *stages* inside one ``jax.shard_map`` — each stage
holds ``num_layers / S`` layers of the stacked block params (the same
``blocks/block`` (L, …) layout ``scan_layers`` uses, so checkpoints
interchange freely between scanned, unrolled — via
``ssd_tpu.training.convert_layout`` — and pipelined runs), microbatches flow
stage-to-stage over ICI via ``lax.ppermute``, and the batch stays sharded on
``data`` so dp×pp compose in one jitted train step.

Schedule: plain GPipe. ``T = M + S − 1`` ticks; at tick ``t`` stage ``s``
processes microbatch ``j = t − s`` (bubble ticks compute on a clamped
microbatch and are discarded — branchless, so the scan body stays a single
fused program). Bubble fraction (S−1)/(M+S−1); pick M ≥ 4·S for >90%
utilization. Backward is ``jax.grad`` straight through the scan + ppermute
(activation stash = the scan's carries; compose with
``model.encoder.remat: true`` to rematerialize block internals).

Restrictions (validated): ``conv_norm: layer`` (BatchNorm's cross-microbatch
batch statistics don't commute with pipelining), no tensor/sequence
parallelism (pp consumes the ``model`` axis), ``num_layers % S == 0``,
``per-process batch % (data_degree · M) == 0``.

Without an ambient mesh whose ``model`` axis is >1 (single-device eval,
serving, tests) the same param layout runs through :func:`scan_stack` — a
plain ``lax.scan`` over the stacked layers — so a pipelined checkpoint
serves anywhere with no conversion.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from ssd_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, ambient_mesh


def init_stacked_blocks(cfg, rng, d_model: int) -> Dict[str, Any]:
    """Init one ``blocks/block`` stacked tree: per-layer ConformerBlock init
    with distinct fold_in streams, leaves stacked on a leading (L,) axis —
    the same layout ``nn.scan`` produces under ``scan_layers``."""
    from ssd_tpu.models.conformer import ConformerBlock

    block = ConformerBlock(cfg)
    dummy_x = jnp.zeros((1, 8, d_model), jnp.float32)
    dummy_mask = jnp.ones((1, 8), bool)
    layers = [
        block.init(jax.random.fold_in(rng, i), dummy_x, dummy_mask, False)["params"]
        for i in range(cfg.num_layers)
    ]
    return {"block": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)}


def _apply_block(cfg, params, x, mask, train: bool, key):
    from ssd_tpu.models.conformer import ConformerBlock

    block = ConformerBlock(cfg)
    rngs = {"dropout": key} if (train and key is not None) else None

    def run(p, x):
        return block.apply({"params": p}, x, mask, train, rngs=rngs)

    if cfg.remat:
        run = jax.checkpoint(run)
    return run(params, x)


def scan_stack(cfg, stacked, x, mask, train: bool, key=None):
    """``lax.scan`` the stacked layers over ``x`` — the no-mesh execution of
    the pipelined param layout (and each stage's inner loop)."""
    x = x.astype(jnp.float32)  # dtype-stable carry, as in scan_layers

    def body(carry, layer):
        params_i, i = layer
        k = jax.random.fold_in(key, i) if key is not None else None
        return _apply_block(cfg, params_i, carry, mask, train, k), None

    n = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    out, _ = lax.scan(body, x, (stacked, jnp.arange(n)))
    return out


def pipelined_stack(cfg, stacked, x, mask, train: bool, key=None,
                    n_microbatches: int = 0):
    """Run the block stack GPipe-pipelined over the ``model`` mesh axis.

    Falls back to :func:`scan_stack` when no ambient mesh has a >1 ``model``
    axis. ``stacked`` is the full (L, …) tree (GSPMD keeps it sharded on the
    stack axis between steps; the shard_map in_spec just adopts that layout).
    """
    mesh = ambient_mesh()
    n_stages = int(mesh.shape[MODEL_AXIS]) if mesh is not None and MODEL_AXIS in mesh.axis_names else 1
    if n_stages <= 1:
        return scan_stack(cfg, stacked, x, mask, train, key)

    num_layers = cfg.num_layers
    if num_layers % n_stages:
        raise ValueError(
            f"pipeline: num_layers={num_layers} not divisible by "
            f"{n_stages} stages (mesh 'model' axis)"
        )
    data_deg = int(mesh.shape.get(DATA_AXIS, 1))
    B, T, D = x.shape
    M = int(n_microbatches) or 1
    if B % (data_deg * M):
        raise ValueError(
            f"pipeline: global batch {B} not divisible by data degree "
            f"{data_deg} × microbatches {M}"
        )

    spec_stacked = jax.tree_util.tree_map(
        lambda l: P(MODEL_AXIS, *([None] * (l.ndim - 1))), stacked
    )
    have_key = train and key is not None
    in_specs = (P(DATA_AXIS), P(DATA_AXIS), spec_stacked) + ((P(),) if have_key else ())
    x = x.astype(jnp.float32)

    def body(x_loc, mask_loc, stacked_loc, *maybe_key):
        s = lax.axis_index(MODEL_AXIS)
        if have_key:
            # distinct dropout streams per data shard / stage / tick / layer
            k_base = jax.random.fold_in(
                jax.random.fold_in(maybe_key[0], lax.axis_index(DATA_AXIS)), s
            )
        b_loc = x_loc.shape[0]
        mb = b_loc // M
        xs = x_loc.reshape(M, mb, T, D)
        ms = mask_loc.reshape(M, mb, T)

        def tick(cur, t):
            j = t - s  # microbatch index this stage works on at tick t
            jc = jnp.clip(j, 0, M - 1)
            x_in = jnp.where(s == 0, jnp.take(xs, jc, axis=0), cur)
            m_in = jnp.take(ms, jc, axis=0)
            k = jax.random.fold_in(k_base, t) if have_key else None
            y = scan_stack(cfg, stacked_loc, x_in, m_in, train, k)
            # ring-shift activations to the next stage (last→0 is ignored:
            # stage 0 always injects a fresh microbatch)
            cur = lax.ppermute(
                y, MODEL_AXIS,
                [(i, (i + 1) % n_stages) for i in range(n_stages)],
            )
            return cur, y  # y stacks into the scan output — no carried buffer

        cur0 = jnp.zeros((mb, T, D), jnp.float32)
        _, ys = lax.scan(tick, cur0, jnp.arange(M + n_stages - 1))
        # the LAST stage's valid outputs are exactly ticks S-1 … S-1+M-1
        # (j = t − (S−1) runs 0…M−1, bubble-free in that window); the slice
        # start is a python int so every stage slices the same rows, and the
        # psum over the ring zeroes every stage but the last
        out_buf = lax.dynamic_slice_in_dim(ys, n_stages - 1, M, axis=0)
        out = lax.psum(
            jnp.where(s == n_stages - 1, out_buf, jnp.zeros((), out_buf.dtype)),
            MODEL_AXIS,
        )
        return out.reshape(b_loc, T, D)

    args = (x, mask, stacked) + ((key,) if have_key else ())
    return jax.shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=P(DATA_AXIS),
        check_vma=False,
    )(*args)


def validate_pipeline_config(enc_cfg) -> None:
    """Static (mesh-independent) pipeline restrictions — raise early."""
    if enc_cfg.pipeline_microbatches <= 0:
        return
    if enc_cfg.conv_norm != "layer":
        raise ValueError(
            "pipeline parallelism requires model.encoder.conv_norm: layer "
            "(BatchNorm batch statistics do not commute with microbatching)"
        )
    if enc_cfg.scan_layers:
        raise ValueError(
            "pipeline_microbatches and scan_layers are mutually exclusive "
            "(the pipeline declares the same stacked blocks/block layout)"
        )
    if enc_cfg.sequence_parallel:
        raise ValueError(
            "pipeline parallelism consumes the 'model' mesh axis; disable "
            "parallel.sequence (tensor/sequence parallelism) to pipeline"
        )
