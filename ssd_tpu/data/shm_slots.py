"""Shared-memory batch transport for ``DataLoader`` worker processes.

The torch-``DataLoader``-style worker pool (reference ``src/data/dataset.py``
:251-259 uses ``num_workers``/``prefetch_factor``) originally handed finished
batches back through ``multiprocessing.Pool``'s result pipe — a pickle →
pipe-write → pipe-read → unpickle round trip over ~100 MB of padded arrays at
flagship shapes.  Measured on this host that costs 7× the in-process rate
(413 → 60 utt/s, ``scripts/profile_input.py --workers 0,2``), i.e. the IPC
eats far more than the collate work it parallelizes.

This module replaces the pipe payload with tmpfs-backed mmap *slot files*:

* the parent creates N fixed slot files under ``/dev/shm`` (tmpfs — sparse
  until written) and hands the paths to the workers at pool start;
* a worker memcpys the collated arrays into its assigned slot and returns
  only a tiny descriptor ``{slot, offsets, shapes, dtypes}`` through the
  pool pipe;
* the parent rebuilds the batch as **zero-copy** numpy views over its own
  mmap of the slot.  The views share one PEP-688 buffer-exporting sentinel
  (`_SlotBuffer`); a ``weakref.finalize`` on the sentinel returns the slot
  to the free queue when the *last* view (including sub-views) dies, so a
  slot can never be overwritten while the training step still reads it,
  and backpressure is automatic: submission blocks on ``acquire()`` until
  the consumer releases a batch.

Slot files grow on demand (worker ``ftruncate`` + both sides re-mmap), so
no batch-size bound needs to be known up front.  Linux-first by design
(``/dev/shm``); falls back to a regular temp dir, which is still
page-cache-backed mmap I/O.
"""

from __future__ import annotations

import mmap
import os
import queue
import shutil
import tempfile
import weakref
from typing import Dict, List, Tuple

import numpy as np

_ALIGN = 64  # array offsets aligned for vectorized memcpy


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


class _SlotBuffer:
    """Buffer-protocol exporter tying numpy-view lifetime to slot recycling.

    ``np.ndarray(buffer=sentinel)`` keeps the sentinel referenced by every
    array (and transitively by any sub-view) built on it; when the last one
    is garbage-collected the sentinel dies and its finalizer releases the
    slot.  Verified: a ``a[2:4]`` sub-view outliving ``a`` still pins the
    slot (see ``tests/test_dataset.py::test_shm_slot_recycling``).
    """

    def __init__(self, mm: mmap.mmap) -> None:
        self._mm = mm

    def __buffer__(self, flags: int) -> memoryview:  # PEP 688 (py3.12+)
        return memoryview(self._mm)

    def __release_buffer__(self, view: memoryview) -> None:
        view.release()


# descriptor: (slot_index, total_bytes, {name: (offset, shape, dtype_str)})
Descriptor = Tuple[int, int, Dict[str, Tuple[int, Tuple[int, ...], str]]]


def _dtype_token(dt: np.dtype) -> str:
    """Serializable dtype identity. ``dt.str`` collapses extension dtypes
    (ml_dtypes bfloat16/float8) to raw void ('|V2'), which jax then rejects —
    transport those by NAME and resolve via ml_dtypes on the other side."""
    return dt.name if dt.kind == "V" else dt.str


def _resolve_dtype(token: str) -> np.dtype:
    try:
        dt = np.dtype(token)
        if dt.kind != "V":
            return dt
    except TypeError:
        pass
    import ml_dtypes

    return np.dtype(getattr(ml_dtypes, token))


def _layout(arrays: Dict[str, np.ndarray]) -> Tuple[int, Dict]:
    off = 0
    fields: Dict[str, Tuple[int, Tuple[int, ...], str]] = {}
    for name, arr in arrays.items():
        off = _round_up(off, _ALIGN)
        fields[name] = (off, arr.shape, _dtype_token(arr.dtype))
        off += arr.nbytes
    return off, fields


class SlotPool:
    """Parent-side slot manager: files, mmaps, free queue, reconstruction."""

    def __init__(self, n_slots: int, initial_size: int = 1 << 23) -> None:
        base = "/dev/shm" if os.path.isdir("/dev/shm") else None
        self._dir = tempfile.mkdtemp(prefix="ssd_loader_", dir=base)
        self.paths: List[str] = []
        self._files = []
        self._maps: List[mmap.mmap] = []
        for i in range(n_slots):
            path = os.path.join(self._dir, f"slot{i}")
            f = open(path, "w+b")
            f.truncate(initial_size)
            self.paths.append(path)
            self._files.append(f)
            self._maps.append(mmap.mmap(f.fileno(), initial_size))
        self._free: "queue.SimpleQueue[int]" = queue.SimpleQueue()
        for i in range(n_slots):
            self._free.put(i)
        self._closed = False

    def acquire(self) -> int:
        """Blocking free-slot wait that survives ``close()`` mid-iteration
        (same polling contract as ``DataLoader._await``)."""
        while True:
            try:
                return self._free.get(timeout=0.5)
            except queue.Empty:
                if self._closed:
                    raise RuntimeError(
                        "DataLoader.close() was called during iteration"
                    ) from None

    def release(self, idx: int) -> None:
        if not self._closed:
            self._free.put(idx)

    def open_batch(self, desc: Descriptor) -> Dict[str, np.ndarray]:
        """Zero-copy views over the slot; recycles when the last view dies."""
        idx, nbytes, fields = desc
        mm = self._maps[idx]
        if len(mm) < nbytes:
            # the worker grew the file; old mm stays alive until any views
            # from earlier batches on it are gone (mmap closes at GC)
            mm = mmap.mmap(self._files[idx].fileno(), nbytes)
            self._maps[idx] = mm
        sentinel = _SlotBuffer(mm)
        weakref.finalize(sentinel, self.release, idx)
        out = {}
        for name, (off, shape, dtype) in fields.items():
            out[name] = np.ndarray(
                shape, dtype=_resolve_dtype(dtype), buffer=sentinel, offset=off
            )
        return out

    def close(self) -> None:
        self._closed = True
        for f in self._files:
            try:
                f.close()
            except OSError:  # pragma: no cover
                pass
        # live batches may still export views of a map; those mmaps close at
        # GC once the views die — only unexported maps can close now
        for mm in self._maps:
            try:
                mm.close()
            except (BufferError, ValueError):
                pass
        shutil.rmtree(self._dir, ignore_errors=True)


class SlotWriter:
    """Worker-side writer: lazily mmaps slot files by path, grows on demand."""

    def __init__(self, paths: List[str]) -> None:
        self.paths = paths
        self._maps: Dict[int, mmap.mmap] = {}
        self._files: Dict[int, object] = {}

    def _map(self, idx: int, need: int) -> mmap.mmap:
        if idx not in self._files:
            self._files[idx] = open(self.paths[idx], "r+b")
        f = self._files[idx]
        size = os.fstat(f.fileno()).st_size
        if size < need:
            os.ftruncate(f.fileno(), _round_up(need, 1 << 20))
            self._maps.pop(idx, None)
        mm = self._maps.get(idx)
        if mm is None or len(mm) < need:
            self._maps[idx] = mm = mmap.mmap(
                f.fileno(), os.fstat(f.fileno()).st_size
            )
        return mm

    def write(self, idx: int, arrays: Dict[str, np.ndarray]) -> Descriptor:
        nbytes, fields = _layout(arrays)
        mm = self._map(idx, nbytes)
        for name, arr in arrays.items():
            off = fields[name][0]
            dst = np.ndarray(arr.shape, dtype=arr.dtype, buffer=mm, offset=off)
            np.copyto(dst, arr)
        return (idx, nbytes, fields)
