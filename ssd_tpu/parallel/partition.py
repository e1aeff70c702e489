"""Parameter partitioning rules: tensor parallelism over the ``model`` axis
and optional FSDP (ZeRO-style) sharding over the ``data`` axis.

The reference has no model parallelism (SURVEY.md §2 "Parallelism" — strictly
single-device); here the ``model`` mesh axis is a first-class option wired
into the production trainer (``parallel:`` config block, see
:func:`ssd_tpu.parallel.mesh.mesh_from_config`). The rules are Megatron-style
and dataflow-aware so XLA inserts exactly one all-reduce per sandwiched pair:

* Conformer FFN: ``w1`` column-parallel ``P(None, 'model')`` → ``w2``
  row-parallel ``P('model', None)`` (activation stays sharded on the ffn dim
  between them; psum after ``w2``);
* attention: query/key/value kernels shard the *head* axis
  ``P(None, 'model', None)`` and the output projection is row-parallel
  ``P('model', None, None)`` (heads are independent; psum after ``out``);
* conv module, subsampler, norms, heads: replicated (element-wise /
  small — sharding them would add collectives worth more than the FLOPs).

**FSDP** (``parallel: {fsdp: true}``): every sufficiently large parameter —
and, via the shared rule function, its optimizer moments and accumulated
gradients — additionally shards one eligible dimension over ``data``, so
per-chip state memory scales down with the data degree. GSPMD then
all-gathers each weight just-in-time for its matmul and reduce-scatters its
gradient (the standard JAX FSDP recipe: annotate, let XLA insert the
collectives). Batch statistics stay replicated: they are read every forward
and updated from batch reductions, so sharding them trades an all-gather per
BatchNorm for negligible memory.

One rule function serves the whole TrainState: optimizer moments (adamw
``mu``/``nu``) embed the same param path names, so mapping
:func:`param_pspec` over the abstract state shards them identically.
"""

from __future__ import annotations

import logging
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ssd_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

logger = logging.getLogger(__name__)

# Leaves smaller than this stay replicated under FSDP: sharding a 288-float
# bias saves nothing and costs an all-gather's latency floor per use.
FSDP_MIN_SIZE = 1024


def _path_names(path) -> list[str]:
    return [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]


def _tp_pspec(names: list[str], ndim: int) -> P:
    """Megatron-style tensor-parallel spec over the ``model`` axis.

    With ``encoder.scan_layers`` the block params live under ``blocks`` with
    a leading (num_layers,) stack axis; the same rules apply shifted one dim
    right (the stack axis itself is never tensor-parallel).
    """
    stacked = "blocks" in names
    if stacked:
        ndim -= 1
    spec = _tp_pspec_base(names, ndim)
    if stacked and any(e is not None for e in spec):
        return P(None, *spec)
    return spec


def _tp_pspec_base(names: list[str], ndim: int) -> P:
    leaf_name = names[-1] if names else ""

    if "w1" in names:  # ffn up-projection: column parallel
        if leaf_name == "kernel" and ndim == 2:
            return P(None, MODEL_AXIS)
        if leaf_name == "bias" and ndim == 1:
            return P(MODEL_AXIS)
    if "w2" in names:  # ffn down-projection: row parallel
        if leaf_name == "kernel" and ndim == 2:
            return P(MODEL_AXIS, None)
        return P()
    if "mha" in names:
        if any(n in ("query", "key", "value") for n in names):
            if leaf_name == "kernel" and ndim == 3:  # (d_model, heads, head_dim)
                return P(None, MODEL_AXIS, None)
            if leaf_name == "bias" and ndim == 2:  # (heads, head_dim)
                return P(MODEL_AXIS, None)
        if "out" in names:
            if leaf_name == "kernel" and ndim == 3:  # (heads, head_dim, d_model)
                return P(MODEL_AXIS, None, None)
            return P()
    return P()


def _with_fsdp(spec: P, names: list[str], shape, fsdp_data: int) -> P:
    """Additionally shard one eligible dim of ``spec`` over ``data``.

    Eligible: a dim the tp rules left unsharded whose size is a multiple of
    the data degree (e.g. on a 32-wide data axis a 288-dim does NOT shard);
    the LARGEST such dim is taken (most memory saved, and for kernels that
    is usually a contraction dim XLA all-gathers just-in-time).
    Batch statistics and small leaves are excluded (see module docstring).
    """
    if fsdp_data <= 1 or "batch_stats" in names:
        return spec
    shape = tuple(shape or ())
    if not shape or int(np.prod(shape)) < FSDP_MIN_SIZE:
        return spec
    entries = list(spec) + [None] * (len(shape) - len(spec))
    # under scan_layers dim 0 is the (num_layers,) stack axis: sharding it
    # would make every scan step's dynamic-slice a cross-chip fetch
    first = 1 if "blocks" in names else 0
    best = -1
    for d, size in enumerate(shape):
        if d >= first and entries[d] is None and size % fsdp_data == 0:
            if best < 0 or size > shape[best]:
                best = d
    if best < 0:
        return spec
    entries[best] = DATA_AXIS
    return P(*entries)


def param_pspec(path, leaf, fsdp_data: int = 0, pipeline: bool = False) -> P:
    """Partition spec for one TrainState leaf (params or optimizer moments).

    ``leaf`` may be a concrete array or a ShapeDtypeStruct (eval_shape).
    ``fsdp_data`` > 1 additionally shards large leaves over the ``data``
    axis (FSDP); 0/1 reproduces the pure-tp rules. ``pipeline=True`` switches
    the ``model`` axis from tensor-parallel to pipeline-stage semantics: the
    stacked ``blocks`` leaves shard their (num_layers,) dim 0 over ``model``
    (each stage holds L/S layers) and no tp spec applies.
    """
    names = _path_names(path)
    shape = tuple(getattr(leaf, "shape", ()) or ())
    if pipeline:
        spec = (
            P(MODEL_AXIS, *([None] * (len(shape) - 1)))
            if "blocks" in names and shape
            else P()
        )
    else:
        spec = _tp_pspec(names, len(shape))
    return _with_fsdp(spec, names, shape, fsdp_data)


def check_tp_divisibility(cfg_model: dict, model_par: int) -> bool:
    """True when the encoder dims divide the tensor-parallel degree."""
    enc = cfg_model["encoder"]
    return (
        int(enc["ffn_dim"]) % model_par == 0
        and int(enc["num_heads"]) % model_par == 0
    )


def state_shardings(
    mesh: Mesh, abstract_state: Any, fsdp: bool = False, pipeline: bool = False
):
    """NamedShardings for a full TrainState pytree (params + batch_stats +
    opt_state + step) from :func:`param_pspec`; non-matching leaves replicate.
    ``fsdp=True`` additionally shards large leaves over the ``data`` axis;
    ``pipeline=True`` switches ``model`` to pipeline-stage semantics."""
    fsdp_data = mesh.shape[DATA_AXIS] if fsdp else 0
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, param_pspec(path, leaf, fsdp_data=fsdp_data, pipeline=pipeline)
        ),
        abstract_state,
    )


def shard_state(mesh: Mesh, state: Any, fsdp: bool = False, pipeline: bool = False):
    """Place an (unsharded) TrainState according to the partition rules."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s),
        state,
        state_shardings(mesh, state, fsdp, pipeline=pipeline),
    )
