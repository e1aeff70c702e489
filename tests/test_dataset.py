"""Loader tests over a synthetic feature cache (reference test_dataset.py
strategy, extended with bucketing invariants)."""

import json

import numpy as np
import pandas as pd
import pytest

from ssd_tpu.data.augment import (
    ChannelDropoutConfig,
    SpecAugmentConfig,
    channel_dropout_np,
    spec_augment_np,
)
from ssd_tpu.data.dataset import (
    TIME_BUCKET,
    TOKEN_BUCKET,
    DataLoader,
    EMGFeatureDataset,
    collate,
    make_dataloader,
    prefetch,
)
from ssd_tpu.data.index_dataset import save_index
from ssd_tpu.data.vocab import default_vocab


@pytest.fixture
def cache(tmp_path):
    rng = np.random.default_rng(0)
    rows = []
    feats_root = tmp_path / "features"
    for i, (split, subset, t) in enumerate(
        [
            ("voiced_parallel_data", "train", 50),
            ("voiced_parallel_data", "train", 180),
            ("voiced_parallel_data", "val", 90),
            ("silent_parallel_data", "train", 70),
        ]
    ):
        uid = f"{split}/s1/{i}_0"
        rows.append(
            dict(
                utterance_id=uid,
                split=split,
                subset=subset,
                speaker="s1",
                stem=f"{i}_0",
                emg_path=f"{uid}_emg.npy",
                audio_path=None,
                transcript=f"sample text {i}",
                sentence_index=i,
                book="b",
                has_audio=False,
                metadata_json="{}",
            )
        )
        emg_dir = feats_root / "emg" / split / "s1"
        emg_dir.mkdir(parents=True, exist_ok=True)
        np.save(emg_dir / f"{i}_0.npy", rng.normal(size=(t, 8, 80)).astype(np.float32))
        if split == "voiced_parallel_data":
            tdir = feats_root / "teacher" / split / "s1"
            tdir.mkdir(parents=True, exist_ok=True)
            np.save(tdir / f"{i}_0.npy", rng.normal(size=(t // 2, 16)).astype(np.float32))
    index_path = tmp_path / "index.parquet"
    save_index(pd.DataFrame(rows), index_path)
    return index_path, feats_root


def test_dataset_filtering_and_flattening(cache):
    index_path, feats_root = cache
    ds = EMGFeatureDataset(
        index_path, feats_root, ["voiced_parallel_data"], default_vocab(), subsets=["train"]
    )
    assert len(ds) == 2
    item = ds.get(0)
    assert item["emg"].shape[1] == 640  # (T, 8*80)
    assert item["teacher"] is not None
    assert item["tokens"].dtype == np.int32


def test_teacher_strict_vs_lenient(cache):
    index_path, feats_root = cache
    strict = EMGFeatureDataset(
        index_path, feats_root, ["silent_parallel_data"], default_vocab(), strict=True
    )
    with pytest.raises(FileNotFoundError):
        strict.get(0)
    lenient = EMGFeatureDataset(
        index_path, feats_root, ["silent_parallel_data"], default_vocab(), strict=False
    )
    assert lenient.get(0)["teacher"] is None


def test_collate_bucketed_shapes(cache):
    index_path, feats_root = cache
    vocab = default_vocab()
    ds = EMGFeatureDataset(index_path, feats_root, ["voiced_parallel_data"], vocab)
    batch = collate([ds.get(i) for i in range(3)], vocab)
    # max T = 180 -> rounded to 256; tokens "sample text i" = 13 -> 32
    assert batch.emg.shape == (3, 2 * TIME_BUCKET, 640)
    assert batch.tokens.shape == (3, TOKEN_BUCKET)
    assert batch.emg_lengths.tolist() == [50, 180, 90]
    # padding zeroed / pad_id
    assert np.all(batch.emg[0, 50:] == 0)
    assert np.all(batch.tokens[0, batch.token_lengths[0] :] == vocab.pad_id)
    assert batch.teacher is not None
    assert batch.teacher_lengths.tolist() == [25, 90, 45]


def test_dataloader_epochs_and_shuffle(cache):
    index_path, feats_root = cache
    loader = make_dataloader(
        index_path,
        feats_root,
        ["voiced_parallel_data", "silent_parallel_data"],
        None,
        default_vocab(),
        batch_size=2,
        shuffle=True,
        include_teacher=False,
        seed=7,
    )
    assert len(loader) == 2
    seen = [uid for b in loader for uid in b.utterance_ids]
    assert len(seen) == 4 and len(set(seen)) == 4
    seen2 = [uid for b in loader for uid in b.utterance_ids]
    assert set(seen) == set(seen2)


def test_max_items_and_prefetch(cache):
    index_path, feats_root = cache
    loader = make_dataloader(
        index_path,
        feats_root,
        ["voiced_parallel_data"],
        None,
        default_vocab(),
        batch_size=2,
        shuffle=False,
        include_teacher=False,
        max_items=2,
    )
    batches = list(prefetch(loader))
    assert sum(b.size for b in batches) == 2


def test_sharding_partitions(cache):
    index_path, feats_root = cache
    uids = set()
    for shard in range(2):
        loader = make_dataloader(
            index_path,
            feats_root,
            ["voiced_parallel_data", "silent_parallel_data"],
            None,
            default_vocab(),
            batch_size=4,
            shuffle=False,
            include_teacher=False,
            num_shards=2,
            shard_index=shard,
        )
        for b in loader:
            uids.update(b.utterance_ids)
    assert len(uids) == 4  # both shards together cover everything


def test_spec_augment_masks():
    rng = np.random.default_rng(0)
    cfg = SpecAugmentConfig(p=1.0, time_masks=2, time_mask_width=0.1, freq_masks=1, freq_mask_width=8)
    x = np.ones((100, 64), np.float32)
    out = spec_augment_np(x, cfg, rng)
    assert out.shape == x.shape
    assert (out == 0).any()
    # no-op when p=0
    assert spec_augment_np(x, SpecAugmentConfig(p=0.0), rng) is x


def test_channel_dropout():
    rng = np.random.default_rng(0)
    x = np.ones((20, 8, 10), np.float32)
    out = channel_dropout_np(x, ChannelDropoutConfig(p=1.0, max_channels=3), rng)
    dropped = [c for c in range(8) if np.all(out[:, c] == 0)]
    assert 1 <= len(dropped) <= 3
    # never drops all channels
    out2 = channel_dropout_np(
        np.ones((5, 2, 4), np.float32), ChannelDropoutConfig(p=1.0, max_channels=5), rng
    )
    assert sum(np.all(out2[:, c] == 0) for c in range(2)) <= 1


def test_teacher_bf16_transfer_option(tmp_path):
    """data.teacher_dtype=bfloat16: loader yields bf16 teacher arrays and the
    distill loss (which upcasts on device) stays within bf16 rounding."""
    import ml_dtypes
    import jax.numpy as jnp

    from ssd_tpu.models.losses import distillation_mse

    from .helpers import make_tiny_setup

    cfg, vocab, root = make_tiny_setup(tmp_path)
    kw = dict(batch_size=2, shuffle=False, include_teacher=True)
    fp32_loader = make_dataloader(
        cfg["data"]["index"], cfg["data"]["features_root"],
        ["voiced_parallel_data"], ["train"], vocab, **kw)
    bf16_loader = make_dataloader(
        cfg["data"]["index"], cfg["data"]["features_root"],
        ["voiced_parallel_data"], ["train"], vocab,
        teacher_dtype=ml_dtypes.bfloat16, **kw)
    b32 = next(iter(fp32_loader))
    b16 = next(iter(bf16_loader))
    assert b16.teacher.dtype == ml_dtypes.bfloat16
    assert b32.teacher.dtype == np.float32
    assert b16.teacher.nbytes * 2 == b32.teacher.nbytes

    rng = np.random.default_rng(0)
    student = jnp.asarray(rng.normal(size=(2, b32.teacher.shape[1], 12)).astype(np.float32))
    lengths = jnp.asarray([b32.teacher.shape[1]] * 2, np.int32)
    want = distillation_mse(student, lengths, jnp.asarray(b32.teacher),
                            jnp.asarray(b32.teacher_lengths))
    got = distillation_mse(student, lengths, jnp.asarray(b16.teacher),
                           jnp.asarray(b16.teacher_lengths))
    np.testing.assert_allclose(float(got), float(want), rtol=2e-2)


def test_emg_bf16_transfer_option(tmp_path):
    """data.emg_dtype=bfloat16 (valid only with a bf16-compute encoder):
    loader yields bf16 features, losses match fp32 transfer within bf16
    rounding (the encoder's first op casts to bf16 either way)."""
    import ml_dtypes
    import jax
    import jax.numpy as jnp

    from ssd_tpu.models.ssd_model import build_model
    from ssd_tpu.training.schedules import build_optimizer
    from ssd_tpu.training.train import batch_to_arrays, init_state, make_eval_step

    from .helpers import make_tiny_setup

    cfg, vocab, root = make_tiny_setup(tmp_path)
    cfg["model"]["encoder"]["compute_dtype"] = "bfloat16"
    input_dim = 16
    model = build_model(cfg, input_dim=input_dim, vocab_size=vocab.size)
    tx, _ = build_optimizer({"optim": {"lr": 1e-3, "weight_decay": 0.0,
                                       "clip_grad_norm": 5.0, "grad_accum": 1}}, 10)
    state = init_state(model, tx, input_dim, jax.random.PRNGKey(0))
    eval_step = make_eval_step(model, vocab.blank_id, False)
    lambdas = jnp.asarray([0.6, 0.4], jnp.float32)

    kw = dict(batch_size=2, shuffle=False, include_teacher=True)
    f32 = next(iter(make_dataloader(
        cfg["data"]["index"], cfg["data"]["features_root"],
        ["voiced_parallel_data"], ["train"], vocab, **kw)))
    bf16 = next(iter(make_dataloader(
        cfg["data"]["index"], cfg["data"]["features_root"],
        ["voiced_parallel_data"], ["train"], vocab,
        emg_dtype=ml_dtypes.bfloat16, **kw)))
    assert bf16.emg.dtype == ml_dtypes.bfloat16
    want = eval_step(state, batch_to_arrays(f32, include_teacher=True), lambdas)
    got = eval_step(state, batch_to_arrays(bf16, include_teacher=True), lambdas)
    np.testing.assert_allclose(float(got["total"]), float(want["total"]), rtol=2e-2)


def _collect_epoch(loader):
    out = []
    for b in loader:
        out.append(
            (
                b.emg.copy(),
                b.emg_lengths.copy(),
                b.tokens.copy(),
                b.token_lengths.copy(),
                list(b.utterance_ids),
            )
        )
    return out


def test_num_workers_bit_identical(cache):
    """Worker-process loading (optim.num_workers analog, reference
    train.py:396) must reproduce the in-process loader bit-exactly —
    including shuffling and augmentation — because the augmentation RNG is
    derived per (seed, epoch, batch), not drawn from one sequential stream."""
    index_path, feats_root = cache
    kw = dict(
        splits=["voiced_parallel_data", "silent_parallel_data"],
        subsets=None,
        vocab=default_vocab(),
        batch_size=2,
        shuffle=True,
        include_teacher=False,
        seed=11,
        spec_augment_cfg=SpecAugmentConfig(
            p=1.0, time_masks=2, time_mask_width=0.1, freq_masks=1, freq_mask_width=8
        ),
        channel_dropout_cfg=ChannelDropoutConfig(p=0.5, max_channels=2),
    )
    serial = make_dataloader(index_path, feats_root, **kw)
    workers = make_dataloader(index_path, feats_root, num_workers=2, **kw)
    try:
        for _ in range(2):  # two epochs: epoch-dependent shuffle + RNG both covered
            a = _collect_epoch(serial)
            b = _collect_epoch(workers)
            assert len(a) == len(b)
            for (ae, al, at, atl, aid), (be, bl, bt, btl, bid) in zip(a, b):
                assert aid == bid
                np.testing.assert_array_equal(ae, be)
                np.testing.assert_array_equal(al, bl)
                np.testing.assert_array_equal(at, bt)
                np.testing.assert_array_equal(atl, btl)
    finally:
        workers.close()
    workers.close()  # idempotent


def test_num_workers_abandoned_iteration_and_close(cache):
    """Breaking mid-epoch and closing must not hang (the close-during-get
    guard) and a fresh epoch on the same loader must still be correct."""
    import threading
    import time

    index_path, feats_root = cache
    kw = dict(
        splits=["voiced_parallel_data", "silent_parallel_data"],
        subsets=None, vocab=default_vocab(), batch_size=1,
        shuffle=False, include_teacher=False,
    )
    loader = make_dataloader(index_path, feats_root, num_workers=1, **kw)
    try:
        it = iter(loader)
        next(it)  # start the pool, take one batch, abandon the rest
        del it
        # the same pool serves the next full epoch correctly
        serial = _collect_epoch(make_dataloader(index_path, feats_root, **kw))
        again = _collect_epoch(loader)
        # epochs advance the shuffle seed; with shuffle=False ordering matches
        assert [a[4] for a in serial] == [b[4] for b in again]
    finally:
        t0 = time.time()
        loader.close()
        assert time.time() - t0 < 10.0
    # prefetch consumer abandonment stops the producer thread promptly
    from ssd_tpu.data.dataset import prefetch

    n_before = threading.active_count()
    gen = prefetch(make_dataloader(index_path, feats_root, **kw), size=1)
    next(gen)
    gen.close()
    deadline = time.time() + 10.0
    while threading.active_count() > n_before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= n_before


def test_num_workers_sharded_empty_batch(cache):
    """Workers must also reproduce the all-padding batch a small final global
    batch leaves on a high-index shard."""
    index_path, feats_root = cache
    kw = dict(
        splits=["voiced_parallel_data", "silent_parallel_data"],
        subsets=None,
        vocab=default_vocab(),
        batch_size=3,
        shuffle=False,
        include_teacher=False,
        num_shards=2,
        shard_index=1,
    )
    serial = _collect_epoch(make_dataloader(index_path, feats_root, **kw))
    loader = make_dataloader(index_path, feats_root, num_workers=1, **kw)
    try:
        worked = _collect_epoch(loader)
    finally:
        loader.close()
    assert len(serial) == len(worked)
    for (ae, al, at, atl, aid), (be, bl, bt, btl, bid) in zip(serial, worked):
        assert aid == bid
        np.testing.assert_array_equal(ae, be)
        np.testing.assert_array_equal(al, bl)
        np.testing.assert_array_equal(at, bt)
        np.testing.assert_array_equal(atl, btl)


def test_shm_slot_recycling():
    """The worker→parent shm transport's slot lifetime contract: a slot is
    pinned while ANY numpy view (including sub-views) of its batch is alive,
    recycles at GC of the last view, grows on demand, and is reusable."""
    import gc

    from ssd_tpu.data.shm_slots import SlotPool, SlotWriter

    pool = SlotPool(2, initial_size=1024)
    writer = SlotWriter(pool.paths)
    try:
        s0, s1 = pool.acquire(), pool.acquire()
        a_ref = np.arange(12, dtype=np.float32).reshape(3, 4)
        desc0 = writer.write(s0, {"a": a_ref, "b": np.array([7], np.int32)})
        arrays0 = pool.open_batch(desc0)
        np.testing.assert_array_equal(arrays0["a"], a_ref)
        assert arrays0["b"][0] == 7
        # growth: a payload larger than the initial slot size
        big = np.random.default_rng(0).normal(size=600)  # 4800 B > 1024
        arrays1 = pool.open_batch(writer.write(s1, {"big": big}))
        np.testing.assert_array_equal(arrays1["big"], big)
        assert pool._free.qsize() == 0  # both slots pinned by live views
        sub = arrays0["a"][1:]  # sub-view outlives the batch dict
        del arrays0
        gc.collect()
        assert pool._free.qsize() == 0
        del sub
        gc.collect()
        assert pool._free.qsize() == 1
        del arrays1
        gc.collect()
        assert pool._free.qsize() == 2
        # recycled slot serves a fresh batch
        arrays2 = pool.open_batch(writer.write(pool.acquire(), {"c": np.full(5, 3, np.int8)}))
        np.testing.assert_array_equal(arrays2["c"], np.full(5, 3, np.int8))
    finally:
        pool.close()


def test_emg_bf16_rejected_in_raw_mode(tmp_path):
    import ml_dtypes
    import pytest

    from .helpers import make_tiny_setup

    cfg, vocab, root = make_tiny_setup(tmp_path)
    with pytest.raises(ValueError, match="cached features only"):
        make_dataloader(
            cfg["data"]["index"], cfg["data"]["features_root"],
            ["voiced_parallel_data"], ["train"], vocab, batch_size=2,
            raw=True, emg_dtype=ml_dtypes.bfloat16,
        )


def test_num_workers_preserves_bf16_teacher_dtype(cache):
    """REGRESSION (round 5): the shm worker hand-off serialized dtypes via
    ``dtype.str``, which collapses ml_dtypes.bfloat16 to raw void ('|V2') —
    jax then rejects the batch at device_put. bf16 teacher arrays must
    round-trip the worker transport with their dtype identity AND bytes."""
    import ml_dtypes

    index_path, feats_root = cache
    kw = dict(
        splits=["voiced_parallel_data"],
        subsets=None, vocab=default_vocab(), batch_size=2, shuffle=False,
        include_teacher=True, strict=False,
        teacher_dtype=ml_dtypes.bfloat16,
    )
    serial = make_dataloader(index_path, feats_root, **kw)
    workers = make_dataloader(index_path, feats_root, num_workers=2, **kw)
    try:
        for sb, wb in zip(serial, workers):
            assert wb.teacher.dtype == ml_dtypes.bfloat16, wb.teacher.dtype
            np.testing.assert_array_equal(
                sb.teacher.view(np.uint16), wb.teacher.view(np.uint16)
            )
            import jax.numpy as jnp

            arr = jnp.asarray(wb.teacher)  # device_put must accept it
            assert arr.dtype == jnp.bfloat16
    finally:
        workers.close()
