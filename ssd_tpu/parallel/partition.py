"""Parameter partitioning rules: tensor parallelism over the ``model`` axis.

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

One rule function serves the whole TrainState: optimizer moments (adamw
``mu``/``nu``) embed the same param path names, so mapping
:func:`param_pspec` over the abstract state shards them identically.
"""

from __future__ import annotations

import logging
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ssd_tpu.parallel.mesh import MODEL_AXIS

logger = logging.getLogger(__name__)


def _path_names(path) -> list[str]:
    return [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]


def param_pspec(path, leaf) -> P:
    """Partition spec for one TrainState leaf (params or optimizer moments).

    ``leaf`` may be a concrete array or a ShapeDtypeStruct (eval_shape).
    """
    names = _path_names(path)
    ndim = getattr(leaf, "ndim", len(getattr(leaf, "shape", ())))
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


def check_tp_divisibility(cfg_model: dict, model_par: int) -> bool:
    """True when the encoder dims divide the tensor-parallel degree."""
    enc = cfg_model["encoder"]
    return (
        int(enc["ffn_dim"]) % model_par == 0
        and int(enc["num_heads"]) % model_par == 0
    )


def state_shardings(mesh: Mesh, abstract_state: Any):
    """NamedShardings for a full TrainState pytree (params + batch_stats +
    opt_state + step) from :func:`param_pspec`; non-matching leaves replicate."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, param_pspec(path, leaf)),
        abstract_state,
    )


def shard_state(mesh: Mesh, state: Any):
    """Place an (unsharded) TrainState according to the partition rules."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), state, state_shardings(mesh, state)
    )
