"""Checkpointing: orbax-backed last/best with embedded config.

Artifact parity with reference ``save_checkpoint`` (``train.py:138-165``):
``<run_dir>/last`` every epoch, ``<run_dir>/best`` on val improvement, and
``config.json`` alongside. The payload carries epoch, step, params,
batch_stats, and optimizer state; eval reconstructs the model from the
embedded config (reference ``evaluate.py:183-184``).

``load_params_partial`` reproduces ``load_state_dict(strict=False)``
(``train.py:441-446``): intersecting paths with matching shapes are copied,
everything else keeps its fresh initialization — used for silent fine-tuning
warm starts.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

logger = logging.getLogger(__name__)


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    run_dir: Path,
    state: Dict[str, Any],
    cfg: Dict[str, Any],
    is_best: bool = False,
) -> None:
    """Write ``last`` (and optionally ``best``) + ``config.json``."""
    run_dir = Path(run_dir).resolve()
    run_dir.mkdir(parents=True, exist_ok=True)
    payload = _to_numpy(state)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(run_dir / "last", payload, force=True)
    if is_best:
        ckptr.save(run_dir / "best", payload, force=True)
    ckptr.wait_until_finished()
    (run_dir / "config.json").write_text(json.dumps(cfg, indent=2))


class CheckpointWriter:
    """Per-epoch checkpoint writer with optional async (overlapped) saves.

    orbax's ``StandardCheckpointer`` is an ``AsyncCheckpointer``: ``save``
    returns once the host copy is snapshotted and the serialization/IO runs
    on a background thread. ``async_saves=False`` (default) preserves the
    reference's synchronous semantics (wait immediately);
    ``async_saves=True`` (``logging: {async_checkpoints: true}``) waits only
    *before the next save* (orbax allows one in-flight save, and 'last' is
    rewritten in place every epoch), overlapping checkpoint IO with the next
    epoch's compute — material at the 439M-param xl scale, noise at 13M.
    Call :meth:`finalize` before reading the files or exiting.
    """

    def __init__(self, async_saves: bool = False) -> None:
        self.async_saves = async_saves
        self._ckptr = ocp.StandardCheckpointer()

    def save(
        self,
        run_dir: Path,
        state: Dict[str, Any],
        cfg: Dict[str, Any],
        is_best: bool = False,
        wait: bool = False,
    ) -> None:
        run_dir = Path(run_dir).resolve()
        run_dir.mkdir(parents=True, exist_ok=True)
        payload = _to_numpy(state)  # device→host snapshot (sync point)
        self._ckptr.wait_until_finished()  # previous epoch's write must land
        self._ckptr.save(run_dir / "last", payload, force=True)
        if is_best:
            self._ckptr.wait_until_finished()
            self._ckptr.save(run_dir / "best", payload, force=True)
        if wait or not self.async_saves:
            self._ckptr.wait_until_finished()
        (run_dir / "config.json").write_text(json.dumps(cfg, indent=2))

    def finalize(self) -> None:
        self._ckptr.wait_until_finished()


def load_checkpoint(path: Path, target: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Restore a checkpoint directory (``…/last`` or ``…/best``).

    ``target`` (an abstract pytree, e.g. from ``jax.eval_shape``) makes the
    restore topology-checked; without it orbax restores as saved.
    """
    path = Path(path).resolve()
    if not path.exists():
        raise FileNotFoundError(path)
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        return ckptr.restore(path, target)
    return ckptr.restore(path)


def load_checkpoint_np(path: Path) -> Dict[str, Any]:
    """Restore a checkpoint as RAW NUMPY, never touching a device.

    The default restore follows the saved sharding metadata onto the default
    device; on a remote backend (axon) that round-trips every leaf through
    the tunnel — measured on the 166M `tpu_scaled_large` checkpoint:
    numpy restore seconds vs ~16 min device-path (docs/PERF.md "Scaled
    config through the product CLIs"). Host-side tools (layout converter,
    checkpoint averaging, comparisons) must use this.
    """
    path = Path(path).resolve()
    if not path.exists():
        raise FileNotFoundError(path)
    ckptr = ocp.PyTreeCheckpointer()
    meta = ckptr.metadata(str(path)).item_metadata.tree
    rargs = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta
    )
    return ckptr.restore(str(path), restore_args=rargs)


def load_config_for(path: Path) -> Dict[str, Any]:
    """Config stored next to a checkpoint dir (embedded-config contract)."""
    cfg_path = Path(path).resolve().parent / "config.json"
    if not cfg_path.exists():
        raise FileNotFoundError(cfg_path)
    return json.loads(cfg_path.read_text())


def load_params_partial(fresh: Dict[str, Any], loaded: Dict[str, Any]) -> Dict[str, Any]:
    """Copy intersecting, shape-matching leaves of ``loaded`` onto ``fresh``."""
    flat_fresh = dict(
        jax.tree_util.tree_flatten_with_path(fresh)[0]
    )
    flat_loaded = dict(jax.tree_util.tree_flatten_with_path(loaded)[0])
    copied = skipped = 0
    merged = {}
    for path, leaf in flat_fresh.items():
        other = flat_loaded.get(path)
        if other is not None and np.shape(other) == np.shape(leaf):
            merged[path] = other
            copied += 1
        else:
            merged[path] = leaf
            if other is not None:
                skipped += 1
    logger.info("Warm start: copied %d tensors, kept %d fresh", copied, skipped)
    treedef = jax.tree_util.tree_structure(fresh)
    ordered = [merged[p] for p, _ in jax.tree_util.tree_flatten_with_path(fresh)[0]]
    return jax.tree_util.tree_unflatten(treedef, ordered)
