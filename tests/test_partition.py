"""Tensor parallelism in the PRODUCTION trainer + multi-host loader/assembly.

VERDICT r1 items 2 and 3: the `parallel:` config block must drive real tp
shardings through ``train_from_config`` (not just the driver dryrun), with
model=2 matching model=1 losses on the 8-device CPU mesh; and the multi-host
input path must produce identical shapes/step counts across simulated
processes that assemble into the right global batch.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ssd_tpu.data.dataset import make_dataloader
from ssd_tpu.data.vocab import default_vocab
from ssd_tpu.parallel.mesh import batch_sharding, make_mesh, mesh_from_config
from ssd_tpu.parallel.partition import (
    check_tp_divisibility,
    param_pspec,
    shard_state,
    state_shardings,
)
from ssd_tpu.training.schedules import build_optimizer
from ssd_tpu.training.train import init_state, make_train_step, train_from_config
from tests.helpers import make_tiny_setup


# --------------------------------------------------------------------------
# partition rules
# --------------------------------------------------------------------------


def _make_state(model_kwargs=None):
    from ssd_tpu.models.conformer import EncoderConfig
    from ssd_tpu.models.ssd_model import SSDModel

    enc = EncoderConfig(
        input_dim=16, d_model=32, num_layers=1, num_heads=4, ffn_dim=64,
        depthwise_conv_kernel_size=7, dropout=0.0, subsample_factor=2,
        **(model_kwargs or {}),
    )
    model = SSDModel(encoder_cfg=enc, projection_dim=12, vocab_size=48)
    cfg = {"optim": {"lr": 1e-3, "weight_decay": 1e-2, "clip_grad_norm": 1.0,
                     "grad_accum": 1}}
    tx, _ = build_optimizer(cfg, 10)
    return model, tx, init_state(model, tx, 16, jax.random.PRNGKey(0))


def test_param_pspec_rules():
    model, tx, state = _make_state()
    mesh = make_mesh(model=2)
    shardings = state_shardings(mesh, state)

    blk = shardings.params["encoder"]["block_0"]
    assert blk["ffn1"]["w1"]["kernel"].spec == P(None, "model")
    assert blk["ffn1"]["w1"]["bias"].spec == P("model")
    assert blk["ffn2"]["w2"]["kernel"].spec == P("model", None)
    assert blk["ffn2"]["w2"]["bias"].spec == P()
    assert blk["attn"]["mha"]["query"]["kernel"].spec == P(None, "model", None)
    assert blk["attn"]["mha"]["query"]["bias"].spec == P("model", None)
    assert blk["attn"]["mha"]["out"]["kernel"].spec == P("model", None, None)
    assert blk["attn"]["mha"]["out"]["bias"].spec == P()
    # conv module + heads stay replicated
    assert blk["conv"]["pw1"]["kernel"].spec == P()
    assert shardings.params["ctc_head"]["fc"]["kernel"].spec == P()

    # optimizer moments (mu/nu) carry the same param paths → same shardings
    flat = jax.tree_util.tree_flatten_with_path(shardings.opt_state)[0]
    mu_w1 = [
        s for path, s in flat
        if ".mu" in jax.tree_util.keystr(path)
        and "['w1']['kernel']" in jax.tree_util.keystr(path)
    ]
    assert mu_w1 and all(s.spec == P(None, "model") for s in mu_w1)


def test_fsdp_pspec_rules():
    """FSDP adds a `data` entry on one eligible dim of each large leaf;
    biases (< FSDP_MIN_SIZE), batch_stats, and step stay replicated."""
    model, tx, state = _make_state()
    mesh = make_mesh(data=4, model=2)
    sh = state_shardings(mesh, state, fsdp=True)

    blk = sh.params["encoder"]["block_0"]
    # (32, 64) w1 kernel: ffn dim already `model`-sharded → d_model gets fsdp
    assert blk["ffn1"]["w1"]["kernel"].spec == P("data", "model")
    # (64, 32) w2 kernel: row dim `model`-sharded → d_model (dim 1) gets fsdp
    assert blk["ffn2"]["w2"]["kernel"].spec == P("model", "data")
    # (32, 4, 8) qkv kernels: heads `model`-sharded → d_model gets fsdp
    assert blk["attn"]["mha"]["query"]["kernel"].spec == P("data", "model", None)
    # (32, 48) ctc head: largest divisible dim (vocab) gets fsdp
    assert sh.params["ctc_head"]["fc"]["kernel"].spec == P(None, "data")
    # small biases replicated; batch_stats and step always replicated
    assert blk["ffn1"]["w1"]["bias"].spec == P("model")
    assert blk["ffn2"]["w2"]["bias"].spec == P()
    flat_bs = jax.tree_util.tree_leaves(sh.batch_stats)
    assert flat_bs and all(s.spec == P() for s in flat_bs)
    assert sh.step.spec == P()

    # optimizer moments follow their params
    flat = jax.tree_util.tree_flatten_with_path(sh.opt_state)[0]
    mu_w1 = [
        s for path, s in flat
        if ".mu" in jax.tree_util.keystr(path)
        and "['w1']['kernel']" in jax.tree_util.keystr(path)
    ]
    assert mu_w1 and all(s.spec == P("data", "model") for s in mu_w1)

    # fsdp off reproduces the pure-tp rules bit-for-bit
    off = state_shardings(mesh, state, fsdp=False)
    assert off.params["encoder"]["block_0"]["ffn1"]["w1"]["kernel"].spec == P(
        None, "model"
    )


def test_fsdp_train_steps_match_replicated():
    """Three train steps under dp4×tp2+fsdp must match the single-mesh
    replicated run, and the state must actually be sharded over `data`."""
    rng = np.random.default_rng(0)
    B, T, S = 8, 32, 6
    batch_np = {
        "emg": rng.normal(size=(B, T, 16)).astype(np.float32),
        "emg_lengths": np.full((B,), T, np.int32),
        "tokens": rng.integers(2, 48, size=(B, S)).astype(np.int32),
        "token_lengths": np.full((B,), S, np.int32),
        "weight": np.ones((B,), np.float32),
    }
    lam = jnp.asarray([1.0, 0.0], jnp.float32)

    results = {}
    for fsdp in (False, True):
        model, tx, state = _make_state()
        mesh = make_mesh(data=4, model=2) if fsdp else make_mesh(model=1)
        train_step = make_train_step(model, tx, blank_id=1, normalize_distill=False)
        with mesh:
            st = shard_state(mesh, state, fsdp=fsdp)
            if fsdp:
                w1 = st.params["encoder"]["block_0"]["ffn1"]["w1"]["kernel"]
                # (32, 64) over (data=4, model=2) → (8, 32) per-device shards
                assert w1.addressable_shards[0].data.shape == (8, 32)
            sh = batch_sharding(mesh)
            losses = None
            for _ in range(3):
                batch = {k: jax.device_put(v, sh) for k, v in batch_np.items()}
                st, losses = train_step(st, batch, lam, jax.random.PRNGKey(0))
            results[fsdp] = (
                float(losses["total"]),
                np.asarray(
                    jax.device_get(st.params["encoder"]["block_0"]["ffn1"]["w1"]["kernel"])
                ),
            )
    np.testing.assert_allclose(results[False][0], results[True][0], rtol=5e-5)
    np.testing.assert_allclose(results[False][1], results[True][1], rtol=2e-4, atol=1e-6)


def test_train_from_config_fsdp(tmp_path):
    """The PRODUCTION path trains with parallel.fsdp and matches the
    replicated run. grad_accum=2 additionally shards MultiSteps' accumulated
    gradients (they carry the param paths through the same rule function)."""
    cfg, vocab, root = make_tiny_setup(tmp_path)
    cfg["optim"]["max_epochs"] = 1
    cfg["optim"]["grad_accum"] = 2
    cfg["augmentation"] = {}
    cfg["model"]["encoder"]["dropout"] = 0.0
    cfg["model"]["ctc_dropout"] = 0.0

    vals = {}
    for fsdp in (False, True):
        cfg["parallel"] = {"data": "auto", "model": 2 if fsdp else 1, "fsdp": fsdp}
        summary = train_from_config(cfg, tmp_path / f"run_fsdp{int(fsdp)}")
        vals[fsdp] = summary["best_val"]
    assert np.isfinite(vals[False]) and np.isfinite(vals[True])
    np.testing.assert_allclose(vals[False], vals[True], rtol=1e-4)


def test_fsdp_checkpoint_topology_portable(tmp_path):
    """Checkpoints are topology-free: orbax saves the full logical arrays, so
    a run saved under fsdp resumes replicated and vice versa (shard_state
    re-places after restore)."""
    import json

    cfg, vocab, root = make_tiny_setup(tmp_path)
    cfg["optim"]["max_epochs"] = 1
    run_dir = tmp_path / "run_port"
    cfg = json.loads(json.dumps(cfg))
    cfg["parallel"] = {"data": "auto", "model": 1, "fsdp": True}
    train_from_config(cfg, run_dir)

    # resume the fsdp checkpoint WITHOUT fsdp (and with tp=2 instead)
    cfg["parallel"] = {"data": "auto", "model": 2, "fsdp": False}
    cfg["optim"]["max_epochs"] = 2
    summary = train_from_config(cfg, run_dir, resume=True)
    assert summary["epochs"] == 2 and np.isfinite(summary["best_val"])

    # and back onto fsdp
    cfg["parallel"] = {"data": "auto", "model": 1, "fsdp": True}
    cfg["optim"]["max_epochs"] = 3
    summary = train_from_config(cfg, run_dir, resume=True)
    assert summary["epochs"] == 3 and np.isfinite(summary["best_val"])


def test_tp_divisibility_check():
    cfg_model = {"encoder": {"ffn_dim": 64, "num_heads": 4}}
    assert check_tp_divisibility(cfg_model, 2)
    assert not check_tp_divisibility({"encoder": {"ffn_dim": 63, "num_heads": 4}}, 2)
    assert not check_tp_divisibility({"encoder": {"ffn_dim": 64, "num_heads": 3}}, 2)


def test_tp_train_step_matches_replicated():
    """One train step with tp=2 must match the replicated result."""
    rng = np.random.default_rng(0)
    B, T, S = 8, 32, 6
    batch_np = {
        "emg": rng.normal(size=(B, T, 16)).astype(np.float32),
        "emg_lengths": np.full((B,), T, np.int32),
        "tokens": rng.integers(2, 48, size=(B, S)).astype(np.int32),
        "token_lengths": np.full((B,), S, np.int32),
        "weight": np.ones((B,), np.float32),
    }
    lam = jnp.asarray([1.0, 0.0], jnp.float32)

    results = {}
    for model_par in (1, 2):
        # fresh state per mesh: the train step donates its input buffers
        model, tx, state = _make_state()
        mesh = make_mesh(model=model_par)
        train_step = make_train_step(model, tx, blank_id=1, normalize_distill=False)
        with mesh:
            st = shard_state(mesh, state)
            sh = batch_sharding(mesh)
            batch = {k: jax.device_put(v, sh) for k, v in batch_np.items()}
            st2, losses = train_step(st, batch, lam, jax.random.PRNGKey(0))
            results[model_par] = (
                float(losses["total"]),
                np.asarray(
                    jax.device_get(st2.params["encoder"]["block_0"]["ffn1"]["w1"]["kernel"])
                ),
            )
    np.testing.assert_allclose(results[1][0], results[2][0], rtol=2e-5)
    np.testing.assert_allclose(results[1][1], results[2][1], rtol=1e-4, atol=1e-6)


def test_train_from_config_tp(tmp_path):
    """The PRODUCTION path trains with parallel.model=2 and matches model=1."""
    cfg, vocab, root = make_tiny_setup(tmp_path)
    cfg["optim"]["max_epochs"] = 1
    cfg["optim"]["grad_accum"] = 1
    cfg["augmentation"] = {}
    cfg["model"]["encoder"]["dropout"] = 0.0
    cfg["model"]["ctc_dropout"] = 0.0

    vals = {}
    for model_par in (1, 2):
        cfg["parallel"] = {"data": "auto", "model": model_par}
        summary = train_from_config(cfg, tmp_path / f"run_tp{model_par}")
        vals[model_par] = summary["best_val"]
    assert np.isfinite(vals[1]) and np.isfinite(vals[2])
    np.testing.assert_allclose(vals[1], vals[2], rtol=1e-4)


def test_mesh_from_config():
    mesh = mesh_from_config({"parallel": {"data": "auto", "model": 2}})
    assert mesh.shape == {"data": 4, "model": 2}
    assert mesh_from_config({}).shape == {"data": 8, "model": 1}
    assert mesh_from_config({"parallel": {"data": 8}}).shape["data"] == 8


# --------------------------------------------------------------------------
# multi-host input path (simulated: two loader shards, one process)
# --------------------------------------------------------------------------


def _corpus(tmp_path, n=11):
    """A synthetic corpus with ragged lengths to stress bucket agreement."""
    import pandas as pd

    from ssd_tpu.data.index_dataset import save_index

    rng = np.random.default_rng(1)
    vocab = default_vocab()
    feats_root = tmp_path / "features"
    rows = []
    texts = ["hello world", "a much longer transcript for bucketing", "hi",
             "the quick brown fox", "silent speech"]
    for i in range(n):
        t = int(rng.integers(30, 200))
        uid = f"voiced_parallel_data/s1/{i}_0"
        rows.append(dict(
            utterance_id=uid, split="voiced_parallel_data", subset="train",
            speaker="s1", stem=f"{i}_0", emg_path="x", audio_path=None,
            transcript=texts[i % len(texts)], sentence_index=i, book="",
            has_audio=True, metadata_json="{}",
        ))
        d = feats_root / "emg" / "voiced_parallel_data" / "s1"
        d.mkdir(parents=True, exist_ok=True)
        np.save(d / f"{i}_0.npy", rng.normal(size=(t, 2, 8)).astype(np.float32))
        td = feats_root / "teacher" / "voiced_parallel_data" / "s1"
        td.mkdir(parents=True, exist_ok=True)
        np.save(td / f"{i}_0.npy", rng.normal(size=(t // 2, 12)).astype(np.float32))
    index_path = tmp_path / "index.parquet"
    save_index(pd.DataFrame(rows), index_path)
    return index_path, feats_root, vocab


def _loader(index_path, feats_root, vocab, shard, num_shards, **kw):
    return make_dataloader(
        index_path=index_path, features_root=feats_root,
        splits=["voiced_parallel_data"], subsets=["train"], vocab=vocab,
        batch_size=2, shuffle=True, seed=7, num_shards=num_shards,
        shard_index=shard, include_teacher=True, strict=False, **kw,
    )


def test_multihost_loader_shapes_agree(tmp_path):
    """Two simulated processes: same step count, identical shapes per step,
    disjoint coverage, fixed row counts."""
    index_path, feats_root, vocab = _corpus(tmp_path)
    l0 = _loader(index_path, feats_root, vocab, 0, 2)
    l1 = _loader(index_path, feats_root, vocab, 1, 2)
    assert len(l0) == len(l1)

    b0s, b1s = list(l0), list(l1)
    assert len(b0s) == len(b1s) == len(l0)
    seen = []
    for b0, b1 in zip(b0s, b1s):
        assert b0.emg.shape == b1.emg.shape  # (batch_size, T_global, F)
        assert b0.emg.shape[0] == 2
        assert b0.tokens.shape == b1.tokens.shape
        assert (b0.teacher is None) == (b1.teacher is None)
        if b0.teacher is not None:
            assert b0.teacher.shape == b1.teacher.shape
        seen += b0.utterance_ids + b1.utterance_ids
    assert len(seen) == len(set(seen)) == 11  # disjoint, complete


def test_multihost_loader_matches_single_host_coverage(tmp_path):
    """Union of two shards' items == the single-loader epoch (same seed)."""
    index_path, feats_root, vocab = _corpus(tmp_path)
    single = _loader(index_path, feats_root, vocab, 0, 1)
    ids_single = sorted(u for b in single for u in b.utterance_ids)
    l0 = _loader(index_path, feats_root, vocab, 0, 2)
    l1 = _loader(index_path, feats_root, vocab, 1, 2)
    ids_sharded = sorted(
        u for lo in (l0, l1) for b in lo for u in b.utterance_ids
    )
    assert ids_single == ids_sharded


def test_multihost_global_assembly(tmp_path):
    """The two shards' rows, assembled in process order, form the global
    batch `make_array_from_process_local_data` would build: process k's rows
    occupy rows [k·B_local, (k+1)·B_local) of the global array."""
    index_path, feats_root, vocab = _corpus(tmp_path, n=8)
    l0 = _loader(index_path, feats_root, vocab, 0, 2)
    l1 = _loader(index_path, feats_root, vocab, 1, 2)
    mesh = make_mesh(data=4, devices=jax.devices()[:4])  # 2 "processes" × 2
    sharding = batch_sharding(mesh)
    for b0, b1 in zip(l0, l1):
        global_np = np.concatenate([b0.emg, b1.emg], axis=0)  # (4, T, F)
        arr = jax.device_put(global_np, sharding)
        # per-device shards, ordered by global row offset, must reassemble
        shards = sorted(arr.addressable_shards, key=lambda s: s.index[0].start)
        local = [np.asarray(s.data) for s in shards]
        np.testing.assert_array_equal(np.concatenate(local), global_np)
        # row blocks: process 0's rows first, then process 1's
        np.testing.assert_array_equal(np.asarray(arr)[: b0.emg.shape[0]], b0.emg)
        np.testing.assert_array_equal(np.asarray(arr)[b0.emg.shape[0] :], b1.emg)


def test_multihost_empty_shard_emits_padding_batch(tmp_path):
    """A final global batch smaller than one shard's offset still yields a
    zero-weight batch on the starved process (no cross-process deadlock)."""
    index_path, feats_root, vocab = _corpus(tmp_path, n=5)
    # batch 2 × 2 shards = global 4 → last global batch has 1 item
    l0 = _loader(index_path, feats_root, vocab, 0, 2)
    l1 = _loader(index_path, feats_root, vocab, 1, 2)
    b0s, b1s = list(l0), list(l1)
    assert len(b0s) == len(b1s) == 2
    # find the (shuffled-position) step holding the 1-item global batch
    small = [(a, b) for a, b in zip(b0s, b1s) if a.size + b.size == 1]
    assert len(small) == 1
    last0, last1 = small[0]
    assert last0.emg.shape == last1.emg.shape
    empty = last0 if last0.size == 0 else last1
    assert empty.emg.shape[0] == 2 and not empty.utterance_ids
    assert float(np.abs(empty.emg).sum()) == 0.0
    assert int(empty.emg_lengths.sum()) == 0
