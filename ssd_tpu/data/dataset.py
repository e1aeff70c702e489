"""Host-side dataset + bucketed static-shape batching.

Replaces the reference's ``EMGFeatureDataset``/``collate_batch``/torch
``DataLoader`` (``src/data/dataset.py:69-259``) with an XLA-idiomatic loader:

* same filtering semantics — split/subset selection, transcript
  normalization with empty-row dropping at construction, strict vs lenient
  teacher loading;
* same per-item contract — cached EMG ``(T, C, M)`` flattened to
  ``(T, C·M)``, optional teacher ``(T_t, 768)``, tokenized transcript;
* **length-bucketed, statically padded batches** instead of per-batch ragged
  padding: every batch's time/token axes are rounded up to a bucket boundary
  so the jitted train step compiles once per bucket instead of once per
  shape (the key departure from the PyTorch loader, SURVEY.md §7.3);
* deterministic per-epoch shuffling and augmentation via seeded numpy RNG;
* multi-host sharding that is correct by construction: every process builds
  the SAME global batch list (same seed ⇒ same permutation ⇒ same
  bucket-sorted global batches) and takes its contiguous row slice, padding
  to the GLOBAL batch's bucket shapes and a fixed row count — all processes
  therefore run identical step counts with identical compiled shapes, the
  requirement for assembling global arrays with
  ``jax.make_array_from_process_local_data`` (see ``parallel/mesh.py``);
* background prefetch thread in place of DataLoader worker processes.
"""

from __future__ import annotations

import logging
import queue
import threading
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from ssd_tpu.data.augment import (
    ChannelDropoutConfig,
    SpecAugmentConfig,
    channel_dropout_np,
    spec_augment_np,
)
from ssd_tpu.data.index_dataset import load_index
from ssd_tpu.data.text_normalizer import normalize_transcript
from ssd_tpu.data.vocab import Vocab

logger = logging.getLogger(__name__)

# Time axis (feature frames) rounds up to a multiple of this; token axis to
# TOKEN_BUCKET. Small multiples keep padding waste low (<~6% at 128 frames for
# the ~8 s mean utterance at 100 fps) while bounding the compile cache.
TIME_BUCKET = 128
TOKEN_BUCKET = 32
TEACHER_BUCKET = 64


def _round_up(n: int, m: int) -> int:
    return max(m, ((n + m - 1) // m) * m)


@dataclass
class Batch:
    """One padded batch; all arrays numpy, ready to feed the device."""

    utterance_ids: List[str]
    transcripts: List[str]
    emg: np.ndarray  # (B, T, C·M) float32
    emg_lengths: np.ndarray  # (B,) int32
    tokens: np.ndarray  # (B, S) int32
    token_lengths: np.ndarray  # (B,) int32
    teacher: Optional[np.ndarray]  # (B, T_t, D) float32 | None
    teacher_lengths: Optional[np.ndarray]  # (B,) int32 | None

    @property
    def size(self) -> int:
        return len(self.utterance_ids)


class EMGFeatureDataset:
    """Loads cached EMG/teacher features + tokenized transcripts."""

    def __init__(
        self,
        index_path: Path,
        features_root: Path,
        splits: Sequence[str],
        vocab: Vocab,
        subsets: Optional[Sequence[str]] = None,
        include_teacher: bool = True,
        strict: bool = True,
        channel_dropout_cfg: Optional[ChannelDropoutConfig] = None,
        raw: bool = False,
    ) -> None:
        df = load_index(Path(index_path))
        df = df[df["split"].isin(list(splits))].reset_index(drop=True)
        if subsets:
            if "subset" not in df.columns:
                raise KeyError("Index missing 'subset' column; re-run indexing.")
            df = df[df["subset"].isin(list(subsets))].reset_index(drop=True)
        df["transcript_norm"] = df["transcript"].apply(normalize_transcript)
        df = df[df["transcript_norm"].astype(bool)].reset_index(drop=True)
        self.df = df
        # plain-dict row cache: pandas .iloc row materialization costs ~0.4 ms
        # per access, ~11% of the input pipeline (scripts/profile_input.py)
        self._rows = df.to_dict("records")
        self.features_root = Path(features_root)
        self.vocab = vocab
        self.include_teacher = include_teacher
        self.strict = strict
        # raw mode: items carry the ORIGINAL (samples, channels) EMG signal
        # from the index's emg_path (no feature cache); featurization happens
        # on device inside the train step. ~8× fewer host/transfer bytes than
        # cached log-mels at hop 10 (docs/PERF.md "Epoch mode").
        self.raw = raw
        self.channel_dropout_cfg = channel_dropout_cfg or ChannelDropoutConfig()
        self._lengths_cache: Dict[int, int] = {}
        self._teacher_lengths_cache: Dict[int, int] = {}
        self._token_lengths_cache: Dict[int, int] = {}
        self._teacher_dim: Optional[int] = None

    def __len__(self) -> int:
        return len(self.df)

    # ------------------------------------------------------------ loading
    def _emg_path(self, utterance_id: str) -> Path:
        return self.features_root / "emg" / f"{utterance_id}.npy"

    def _teacher_path(self, utterance_id: str) -> Path:
        return self.features_root / "teacher" / f"{utterance_id}.npy"

    def feature_length(self, idx: int) -> int:
        """Time length of item ``idx`` — feature frames, or raw samples in
        raw mode (mmap header read only; cached)."""
        if idx not in self._lengths_cache:
            row = self._rows[idx]
            path = (
                Path(row["emg_path"]) if self.raw
                else self._emg_path(row["utterance_id"])
            )
            if not path.exists():
                raise FileNotFoundError(path)
            self._lengths_cache[idx] = int(np.load(path, mmap_mode="r").shape[0])
        return self._lengths_cache[idx]

    def teacher_length(self, idx: int) -> int:
        """Teacher frame count of item ``idx`` (0 when absent; header only)."""
        if idx not in self._teacher_lengths_cache:
            path = self._teacher_path(self._rows[idx]["utterance_id"])
            if not path.exists():
                self._teacher_lengths_cache[idx] = 0
            else:
                arr = np.load(path, mmap_mode="r")
                self._teacher_lengths_cache[idx] = int(arr.shape[0])
                self._teacher_dim = int(arr.shape[1])
        return self._teacher_lengths_cache[idx]

    def teacher_dim(self) -> Optional[int]:
        """Teacher feature dim, from the first existing teacher file."""
        if self._teacher_dim is None:
            for i in range(len(self.df)):
                if self.teacher_length(i) > 0:
                    break
        return self._teacher_dim

    def token_length(self, idx: int) -> int:
        if idx not in self._token_lengths_cache:
            transcript = self._rows[idx]["transcript_norm"]
            self._token_lengths_cache[idx] = len(self.vocab.encode(transcript))
        return self._token_lengths_cache[idx]

    def get(self, idx: int, rng: Optional[np.random.Generator] = None) -> Dict:
        row = self._rows[idx]
        uid = row["utterance_id"]
        if self.raw:
            path = Path(row["emg_path"])
            if not path.exists():
                raise FileNotFoundError(path)
            # (samples, channels) — augmentation happens on device in this
            # mode (host channel dropout needs the (T, C, M) feature layout)
            emg = np.load(path, mmap_mode="r").astype(np.float32, copy=False)
        else:
            path = self._emg_path(uid)
            if not path.exists():
                raise FileNotFoundError(path)
            # mmap + copy=False: the cache is float32 by contract, so the bytes
            # flow page-cache → collate buffer with ONE copy (np.load + astype
            # was two). Augments copy before mutating, so mmap stays read-only.
            feat = np.load(path, mmap_mode="r").astype(np.float32, copy=False)
            if rng is not None:
                feat = channel_dropout_np(feat, self.channel_dropout_cfg, rng)
            t, c, m = feat.shape
            emg = feat.reshape(t, c * m)

        teacher = None
        if self.include_teacher:
            tp = self._teacher_path(uid)
            if tp.exists():
                teacher = np.load(tp, mmap_mode="r").astype(np.float32, copy=False)
            elif self.strict:
                raise FileNotFoundError(tp)

        transcript = row["transcript_norm"]
        tokens = np.asarray(self.vocab.encode(transcript), dtype=np.int32)
        return {
            "utterance_id": uid,
            "transcript": transcript,
            "emg": emg,
            "teacher": teacher,
            "tokens": tokens,
        }


def collate(
    items: List[Dict],
    vocab: Vocab,
    spec_augment_cfg: Optional[SpecAugmentConfig] = None,
    rng: Optional[np.random.Generator] = None,
    time_bucket: int = TIME_BUCKET,
    token_bucket: int = TOKEN_BUCKET,
    teacher_bucket: int = TEACHER_BUCKET,
    pad_time_to: Optional[int] = None,
    pad_tokens_to: Optional[int] = None,
    pad_teacher_to: Optional[int] = None,
    pad_rows_to: Optional[int] = None,
    teacher_dim: Optional[int] = None,
    teacher_dtype=np.float32,
    emg_dtype=np.float32,
) -> Batch:
    """Right-pad items to bucket-rounded static shapes.

    The ``pad_*_to`` targets force larger paddings than this item list needs
    — multi-host loaders pass the GLOBAL batch's bucket shapes so every
    process produces identically shaped arrays. ``pad_rows_to`` appends
    all-zero rows (length 0, weight handled by the caller via
    :attr:`Batch.size`). ``pad_teacher_to``+``teacher_dim`` force the teacher
    arrays to exist even when no local item carries teacher features.
    """
    emg_lengths = np.asarray([it["emg"].shape[0] for it in items], np.int32)
    token_lengths = np.asarray([len(it["tokens"]) for it in items], np.int32)
    T = max(_round_up(int(emg_lengths.max()), time_bucket), pad_time_to or 0)
    S = max(_round_up(int(token_lengths.max()), token_bucket), pad_tokens_to or 0)
    F = items[0]["emg"].shape[1]
    B = max(len(items), pad_rows_to or 0)

    # bf16 option halves the feature bytes (the dominant host copy/transfer);
    # only sound when the consumer computes in bf16 anyway — train_from_config
    # enforces that (train.py rejects emg_dtype=bf16 with an fp32 encoder);
    # direct loader callers opting in take on that responsibility
    emg = np.zeros((B, T, F), emg_dtype)
    tokens = np.full((B, S), vocab.pad_id, np.int32)
    for i, it in enumerate(items):
        x = it["emg"]
        if spec_augment_cfg is not None and rng is not None:
            x = spec_augment_np(x, spec_augment_cfg, rng)
        emg[i, : x.shape[0]] = x
        tokens[i, : len(it["tokens"])] = it["tokens"]
    if B > len(items):
        emg_lengths = np.pad(emg_lengths, (0, B - len(items)))
        token_lengths = np.pad(token_lengths, (0, B - len(items)))

    teacher = None
    teacher_lengths = None
    if any(it["teacher"] is not None for it in items) or pad_teacher_to:
        t_lens = np.asarray(
            [0 if it["teacher"] is None else it["teacher"].shape[0] for it in items],
            np.int32,
        )
        Tt = max(
            _round_up(int(t_lens.max()) if len(t_lens) else 1, teacher_bucket),
            pad_teacher_to or 0,
        )
        D = next(
            (it["teacher"].shape[1] for it in items if it["teacher"] is not None),
            teacher_dim,
        )
        # bf16 option halves the dominant teacher bytes (host collate copy +
        # host→device transfer); the distill loss upcasts to fp32 on device
        teacher = np.zeros((B, Tt, D), teacher_dtype)
        for i, it in enumerate(items):
            if it["teacher"] is not None:
                teacher[i, : it["teacher"].shape[0]] = it["teacher"]
        teacher_lengths = np.pad(t_lens, (0, B - len(t_lens)))

    return Batch(
        utterance_ids=[it["utterance_id"] for it in items],
        transcripts=[it["transcript"] for it in items],
        emg=emg,
        emg_lengths=emg_lengths,
        tokens=tokens,
        token_lengths=token_lengths,
        teacher=teacher,
        teacher_lengths=teacher_lengths,
    )


class DataLoader:
    """Bucketed batch iterator over an :class:`EMGFeatureDataset`.

    Shuffling strategy: each epoch, items are shuffled, sorted into coarse
    length pools (bucketed by feature frame count), batches drawn from pools,
    and the batch order shuffled again — randomness with near-uniform batch
    shapes. Without shuffling (eval), items keep index order and batches are
    cut sequentially (reference eval behavior).

    Multi-host (``num_shards > 1``): batches are built GLOBALLY — size
    ``batch_size × num_shards``, cut from the same seeded permutation on
    every process — and each process takes its contiguous ``batch_size``-row
    slice, padded to the global batch's bucket shapes and exactly
    ``batch_size`` rows. All processes therefore iterate the same number of
    identically-shaped steps (no cross-process deadlock), and the per-process
    arrays assemble into one global batch via
    ``jax.make_array_from_process_local_data``. Requires the feature cache on
    a filesystem visible to every process (same contract as the reference's
    shared ``results/features`` tree).
    """

    def __init__(
        self,
        dataset: EMGFeatureDataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        spec_augment_cfg: Optional[SpecAugmentConfig] = None,
        max_items: Optional[int] = None,
        num_shards: int = 1,
        shard_index: int = 0,
        drop_last: bool = False,
        bucket_batches: bool = True,
        time_bucket: int = TIME_BUCKET,
        teacher_dtype=np.float32,
        emg_dtype=np.float32,
        num_workers: int = 0,
    ) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.spec_augment_cfg = spec_augment_cfg
        # time-axis padding granularity: feature frames normally, raw samples
        # (frames × hop) when the dataset is in raw mode
        self.time_bucket = time_bucket
        self.teacher_dtype = teacher_dtype
        self.emg_dtype = emg_dtype
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.drop_last = drop_last
        self.bucket_batches = bucket_batches
        # item-load + collate worker processes (the torch DataLoader
        # num_workers analog, reference dataset.py:251-259). Spawn context
        # because the parent holds jax/XLA threads (fork-unsafe); note spawn
        # re-imports the launching __main__ in each worker, so workers pay
        # the trainer's import cost once at pool start. Batches arrive IN
        # ORDER and bit-identical to num_workers=0 — augmentation RNG is
        # derived per batch, not drawn from one sequential stream.
        self.num_workers = int(num_workers)
        self._pool = None
        self._slots = None  # shm transport, created with the pool
        self.epoch = 0

        indices = list(range(len(dataset)))
        if max_items is not None:
            indices = indices[: min(max_items, len(indices))]
        self._indices = indices

    @property
    def _global_batch_size(self) -> int:
        return self.batch_size * self.num_shards

    def __len__(self) -> int:
        n = len(self._indices)
        bg = self._global_batch_size
        if self.drop_last:
            return n // bg
        return (n + bg - 1) // bg

    def _epoch_batches(self, rng: np.random.Generator) -> List[List[int]]:
        """Global batch index lists — identical on every process (same seed)."""
        indices = list(self._indices)
        if self.shuffle:
            rng.shuffle(indices)
        if self.shuffle and self.bucket_batches:
            # stable sort by bucketed length keeps shuffle randomness within
            # equal-bucket groups while minimizing padding waste
            indices.sort(
                key=lambda i: _round_up(self.dataset.feature_length(i), self.time_bucket)
            )
        bg = self._global_batch_size
        batches = [indices[i : i + bg] for i in range(0, len(indices), bg)]
        if self.drop_last and batches and len(batches[-1]) < bg:
            batches.pop()
        if self.shuffle:
            rng.shuffle(batches)
        return batches

    def _shard_pad_kwargs(self, global_batch: List[int]) -> Dict:
        """Bucket shapes of the GLOBAL batch, for cross-process agreement."""
        ds = self.dataset
        t_max = max(ds.feature_length(i) for i in global_batch)
        s_max = max(ds.token_length(i) for i in global_batch)
        kwargs: Dict = dict(
            pad_time_to=_round_up(t_max, self.time_bucket),
            pad_tokens_to=_round_up(s_max, TOKEN_BUCKET),
            pad_rows_to=self.batch_size,
        )
        if ds.include_teacher:
            tt_max = max(ds.teacher_length(i) for i in global_batch)
            if tt_max > 0:
                kwargs["pad_teacher_to"] = _round_up(tt_max, TEACHER_BUCKET)
                kwargs["teacher_dim"] = ds.teacher_dim()
        return kwargs

    def _batch_rng(self, epoch: int, batch_idx: int) -> np.random.Generator:
        """Per-batch augmentation RNG.

        Derived from (seed, epoch, batch index) rather than drawn from one
        sequential per-epoch stream, so batch construction is
        order-independent: worker processes reproduce the serial loader
        bit-exactly, and a batch's augmentation does not depend on how many
        RNG draws earlier batches consumed.
        """
        return np.random.default_rng((self.seed, epoch, batch_idx))

    def _build_batch(self, epoch: int, batch_idx: int, global_batch: List[int]) -> Batch:
        """Materialize this shard's padded batch for one global batch."""
        rng = self._batch_rng(epoch, batch_idx) if self.shuffle else None
        if self.num_shards == 1:
            batch_indices = global_batch
            pad_kwargs: Dict = {}
        else:
            lo = self.shard_index * self.batch_size
            batch_indices = global_batch[lo : lo + self.batch_size]
            pad_kwargs = self._shard_pad_kwargs(global_batch)
        if batch_indices:
            items = [self.dataset.get(i, rng) for i in batch_indices]
            return collate(
                items,
                self.dataset.vocab,
                spec_augment_cfg=self.spec_augment_cfg if self.shuffle else None,
                rng=rng,
                time_bucket=self.time_bucket,
                teacher_dtype=self.teacher_dtype,
                emg_dtype=self.emg_dtype,
                **pad_kwargs,
            )
        # a tiny final global batch can leave this shard empty; all
        # processes must still step — emit an all-padding batch
        donor = self.dataset.get(global_batch[0])
        batch = collate(
            [donor], self.dataset.vocab,
            time_bucket=self.time_bucket,
            teacher_dtype=self.teacher_dtype,
            emg_dtype=self.emg_dtype, **pad_kwargs,
        )
        batch.emg[:] = 0.0
        batch.emg_lengths[:] = 0
        batch.tokens[:] = self.dataset.vocab.pad_id
        batch.token_lengths[:] = 0
        if batch.teacher is not None:
            batch.teacher[:] = 0.0
            batch.teacher_lengths[:] = 0
        batch.utterance_ids = []
        batch.transcripts = []
        return batch

    # --------------------------------------------------- worker processes
    def __getstate__(self):
        d = self.__dict__.copy()
        d["_pool"] = None  # pools don't pickle; workers never nest pools
        d["_slots"] = None  # parent-side mmaps; workers get paths via initargs
        return d

    def _ensure_pool(self):
        if self._pool is None:
            import multiprocessing as mp

            from .shm_slots import SlotPool

            # slots = in-flight bound (num_workers+2, _iter_workers) + head-
            # room for already-yielded batches still alive in the consumer
            # (prefetch queue + the step's current batch)
            self._slots = SlotPool(self.num_workers + 6)
            ctx = mp.get_context("spawn")
            self._pool = ctx.Pool(
                self.num_workers,
                initializer=_worker_init,
                initargs=(self, self._slots.paths),
            )
        return self._pool

    def close(self) -> None:
        """Terminate worker processes (idempotent; also runs at GC)."""
        if self._pool is not None:
            self._pool.terminate()
            self._pool.join()
            self._pool = None
        if self._slots is not None:
            self._slots.close()
            self._slots = None

    def __del__(self):  # pragma: no cover - GC timing
        try:
            self.close()
        except Exception:
            pass

    def _await(self, async_result):
        """``AsyncResult.get`` that cannot block forever across ``close()``.

        A plain ``get()`` on a terminated pool never returns; polling with a
        timeout lets an iterator (often the prefetch producer thread) detect
        the teardown and raise instead of leaking a permanently-blocked
        thread.
        """
        import multiprocessing as mp

        while True:
            try:
                return async_result.get(0.5)
            except mp.TimeoutError:
                if self._pool is None:
                    raise RuntimeError(
                        "DataLoader.close() was called during iteration"
                    ) from None

    def _iter_workers(self, epoch: int, batches: List[List[int]]) -> Iterator[Batch]:
        """Ordered worker-pool iteration with bounded lookahead.

        At most ``num_workers + 2`` batches are in flight so worker results
        (full padded arrays) cannot accumulate unboundedly while the device
        step drains them in order. An abandoned iterator (mid-epoch break)
        simply drops its pending AsyncResults — the already-submitted builds
        finish in the pool and are discarded, which can delay the NEXT
        epoch's first batch by up to that many builds but affects nothing
        else (results travel through per-iteration handles, not a shared
        queue).
        """
        from collections import deque

        pool = self._ensure_pool()
        pending: "deque" = deque()  # of (slot, AsyncResult)
        tasks = iter([(epoch, bi, gb) for bi, gb in enumerate(batches)])
        try:
            for task in tasks:
                # blocking: a slot frees when a previously-yielded batch's
                # last array view is GC'd — submission backpressure mirrors
                # the consumer's actual drain rate, not just the pipe's
                slot = self._slots.acquire()
                pending.append((slot, pool.apply_async(_worker_build, (task, slot))))
                if len(pending) < self.num_workers + 2:
                    continue
                yield self._open_result(self._await(pending.popleft()[1]))
            while pending:
                yield self._open_result(self._await(pending.popleft()[1]))
        finally:
            # abandoned mid-epoch: wait out the already-submitted builds and
            # recycle their slots, else the free queue starves next epoch
            while pending:
                slot, result = pending.popleft()
                try:
                    self._await(result)
                except RuntimeError:  # close() during teardown
                    pass
                self._slots.release(slot)

    def _open_result(self, result) -> Batch:
        """Rebuild a Batch from a worker's (descriptor, metadata) pair as
        zero-copy views over the shm slot (see shm_slots.SlotPool)."""
        desc, meta = result
        arrays = self._slots.open_batch(desc)
        return Batch(
            utterance_ids=meta["utterance_ids"],
            transcripts=meta["transcripts"],
            emg=arrays["emg"],
            emg_lengths=arrays["emg_lengths"],
            tokens=arrays["tokens"],
            token_lengths=arrays["token_lengths"],
            teacher=arrays.get("teacher"),
            teacher_lengths=arrays.get("teacher_lengths"),
        )

    def __iter__(self) -> Iterator[Batch]:
        epoch = self.epoch
        self.epoch += 1
        rng = np.random.default_rng((self.seed, epoch))
        batches = self._epoch_batches(rng)
        if self.num_workers > 0:
            yield from self._iter_workers(epoch, batches)
            return
        for bi, global_batch in enumerate(batches):
            yield self._build_batch(epoch, bi, global_batch)


# worker-process state: one DataLoader clone per worker (spawn context — the
# pickled clone carries the dataset/table state but no pool); tasks are
# ((epoch, batch_idx, global_batch), slot) and return (shm descriptor,
# small-field metadata) — the arrays travel through the mmap slot, not the
# result pipe (shm_slots module docstring has the measured rationale)
_WORKER_LOADER: Optional["DataLoader"] = None
_WORKER_SLOTS = None


def _worker_init(loader: "DataLoader", slot_paths) -> None:
    global _WORKER_LOADER, _WORKER_SLOTS
    from .shm_slots import SlotWriter

    _WORKER_LOADER = loader
    _WORKER_SLOTS = SlotWriter(slot_paths)


def _worker_build(task, slot: int):
    epoch, batch_idx, global_batch = task
    batch = _WORKER_LOADER._build_batch(epoch, batch_idx, global_batch)
    arrays = {
        "emg": batch.emg,
        "emg_lengths": batch.emg_lengths,
        "tokens": batch.tokens,
        "token_lengths": batch.token_lengths,
    }
    if batch.teacher is not None:
        arrays["teacher"] = batch.teacher
        arrays["teacher_lengths"] = batch.teacher_lengths
    desc = _WORKER_SLOTS.write(slot, arrays)
    meta = {
        "utterance_ids": batch.utterance_ids,
        "transcripts": batch.transcripts,
    }
    return desc, meta


def prefetch(loader: DataLoader, size: int = 2) -> Iterator[Batch]:
    """Background-thread prefetch (the device-overlap path for the default
    in-process loader; composes with ``num_workers`` worker pools).

    Closing/abandoning the returned generator (mid-epoch break, preemption)
    stops the producer thread promptly instead of leaving it blocked on the
    bounded queue — long-lived callers (orchestrator, test harnesses) would
    otherwise accumulate one stuck thread per interrupted epoch."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()
    err: List[BaseException] = []
    stop = threading.Event()

    def _put(item) -> bool:
        """Bounded put that gives up once the consumer is gone."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def producer() -> None:
        try:
            for batch in loader:
                if not _put(batch):
                    return
        except BaseException as e:  # pragma: no cover - defensive
            err.append(e)
        finally:
            _put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()


def make_dataloader(
    index_path: Path,
    features_root: Path,
    splits: Sequence[str],
    subsets: Optional[Sequence[str]],
    vocab: Vocab,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    spec_augment_cfg: Optional[SpecAugmentConfig] = None,
    include_teacher: bool = True,
    strict: bool = True,
    max_items: Optional[int] = None,
    channel_dropout_cfg: Optional[ChannelDropoutConfig] = None,
    num_shards: int = 1,
    shard_index: int = 0,
    raw: bool = False,
    raw_hop_length: int = 10,
    teacher_dtype=np.float32,
    emg_dtype=np.float32,
    num_workers: int = 0,
) -> DataLoader:
    """Reference-surface factory (``dataset.py:220-259``).

    ``raw=True`` loads the ORIGINAL (samples, channels) EMG from the index's
    ``emg_path`` instead of cached features; featurization then happens on
    device inside the train step (``data.train_from_raw`` config key). Host
    augmentation is unavailable in this mode — use ``augmentation.on_device``.
    """
    if raw and (spec_augment_cfg is not None or channel_dropout_cfg is not None):
        raise ValueError(
            "raw mode featurizes on device; host augmentation configs must be "
            "moved on device (augmentation.on_device: true)"
        )
    if raw and emg_dtype != np.float32:
        raise ValueError(
            "emg_dtype applies to cached features only: the on-device "
            "featurizer needs float32 raw samples for librosa parity"
        )
    dataset = EMGFeatureDataset(
        index_path=index_path,
        features_root=features_root,
        splits=splits,
        vocab=vocab,
        subsets=subsets,
        include_teacher=include_teacher,
        strict=strict,
        channel_dropout_cfg=channel_dropout_cfg,
        raw=raw,
    )
    return DataLoader(
        dataset,
        batch_size=batch_size,
        shuffle=shuffle,
        seed=seed,
        spec_augment_cfg=spec_augment_cfg,
        max_items=max_items,
        num_shards=num_shards,
        shard_index=shard_index,
        # same frame granularity as feature mode, expressed in samples
        time_bucket=TIME_BUCKET * raw_hop_length if raw else TIME_BUCKET,
        teacher_dtype=teacher_dtype,
        emg_dtype=emg_dtype,
        num_workers=num_workers,
    )
