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
