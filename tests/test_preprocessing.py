"""Preprocessing CLI tests: cache contract + idempotency (reference
test_preprocessing.py strategy; teacher path tested via the WavLM module's own
tests)."""

import json

import numpy as np
import pandas as pd
import pytest

from ssd_tpu.data.index_dataset import save_index, load_index
from ssd_tpu.data.preprocessing import process_emg_rows
from ssd_tpu.ops.featurizer import FeaturizerConfig, logmel


@pytest.fixture
def raw_dataset(tmp_path):
    rng = np.random.default_rng(0)
    root = tmp_path / "emg_data"
    rows = []
    for i, n in enumerate([1500, 2750]):
        d = root / "voiced_parallel_data" / "s1"
        d.mkdir(parents=True, exist_ok=True)
        np.save(d / f"{i}_0_emg.npy", rng.normal(size=(n, 8)).astype(np.float32))
        uid = f"voiced_parallel_data/s1/{i}_0"
        rows.append(
            dict(
                utterance_id=uid,
                split="voiced_parallel_data",
                subset="train",
                speaker="s1",
                stem=f"{i}_0",
                emg_path=f"voiced_parallel_data/s1/{i}_0_emg.npy",
                audio_path=None,
                transcript="x",
                sentence_index=i,
                book="",
                has_audio=False,
                metadata_json="{}",
            )
        )
    index_path = tmp_path / "index.parquet"
    save_index(pd.DataFrame(rows), index_path)
    return root, index_path, tmp_path / "out"


def test_emg_cache_contract(raw_dataset):
    root, index_path, out = raw_dataset
    rows = list(load_index(index_path).itertuples(index=False))
    cfg = FeaturizerConfig(sample_rate=1000, n_fft=320, hop_length=10, n_mels=80)
    n = process_emg_rows(rows, root, out, cfg, overwrite=False, fused=False)
    assert n == 2
    for i, samples in enumerate([1500, 2750]):
        feat = np.load(out / f"voiced_parallel_data/s1/{i}_0.npy")
        T = cfg.frame_count(samples)
        assert feat.shape == (T, 8, 80)
        assert feat.dtype == np.float32
        meta = json.loads((out / f"voiced_parallel_data/s1/{i}_0.json").read_text())
        assert meta["frames"] == T
        assert meta["n_fft"] == 320 and meta["hop_length"] == 10
        assert "mean" in meta and "std" in meta
        # batched output == single-utterance golden path
        raw = np.load(root / f"voiced_parallel_data/s1/{i}_0_emg.npy")
        want, _ = logmel(raw, cfg)
        np.testing.assert_allclose(feat, want, atol=2e-4, rtol=2e-4)


def test_emg_idempotent_skip(raw_dataset):
    root, index_path, out = raw_dataset
    rows = list(load_index(index_path).itertuples(index=False))
    cfg = FeaturizerConfig(n_fft=320, hop_length=10)
    assert process_emg_rows(rows, root, out, cfg, overwrite=False, fused=False) == 2
    assert process_emg_rows(rows, root, out, cfg, overwrite=False, fused=False) == 0
    assert process_emg_rows(rows, root, out, cfg, overwrite=True, fused=False) == 2


def test_double_buffer_output_identical(raw_dataset, tmp_path):
    """double_buffer only reorders dispatch vs readback — the on-disk cache
    must be BIT-identical to the sequential path (and the tail batch left in
    the double-buffer must be drained)."""
    root, index_path, out = raw_dataset
    rows = list(load_index(index_path).itertuples(index=False))
    cfg = FeaturizerConfig(sample_rate=1000, n_fft=320, hop_length=10, n_mels=80)
    out_seq = tmp_path / "seq"
    out_db = tmp_path / "db"
    # batch_size=1 → two flushes → exercises the k/k+1 overlap AND the drain
    n1 = process_emg_rows(rows, root, out_seq, cfg, overwrite=False,
                          fused=False, batch_size=1, double_buffer=False)
    n2 = process_emg_rows(rows, root, out_db, cfg, overwrite=False,
                          fused=False, batch_size=1, double_buffer=True)
    assert n1 == n2 == 2
    for i in range(2):
        a = np.load(out_seq / f"voiced_parallel_data/s1/{i}_0.npy")
        b = np.load(out_db / f"voiced_parallel_data/s1/{i}_0.npy")
        np.testing.assert_array_equal(a, b)
        ma = json.loads((out_seq / f"voiced_parallel_data/s1/{i}_0.json").read_text())
        mb = json.loads((out_db / f"voiced_parallel_data/s1/{i}_0.json").read_text())
        assert ma == mb


def test_bf16_fetch_close_and_fp32_on_disk(raw_dataset, tmp_path):
    """--fetch-dtype bfloat16 changes only the transfer dtype: on-disk .npy
    stays float32 (reference cache contract) and values agree with the fp32
    fetch to bf16 resolution (log-mel dB are O(±80) → ~0.4 absolute)."""
    root, index_path, out = raw_dataset
    rows = list(load_index(index_path).itertuples(index=False))
    cfg = FeaturizerConfig(sample_rate=1000, n_fft=320, hop_length=10, n_mels=80)
    out32 = tmp_path / "f32"
    out16 = tmp_path / "bf16"
    process_emg_rows(rows, root, out32, cfg, overwrite=False, fused=False)
    process_emg_rows(rows, root, out16, cfg, overwrite=False, fused=False,
                     fetch_dtype="bfloat16")
    for i in range(2):
        a = np.load(out32 / f"voiced_parallel_data/s1/{i}_0.npy")
        b = np.load(out16 / f"voiced_parallel_data/s1/{i}_0.npy")
        assert b.dtype == np.float32
        assert a.shape == b.shape
        # per-file z-normed features are O(1); bf16 relative step is 2^-8
        np.testing.assert_allclose(a, b, atol=0.05)
        # and the normalization stats in metadata are fp32-path values
        ma = json.loads((out32 / f"voiced_parallel_data/s1/{i}_0.json").read_text())
        mb = json.loads((out16 / f"voiced_parallel_data/s1/{i}_0.json").read_text())
        assert ma["mean"] == pytest.approx(mb["mean"], abs=1e-6)
