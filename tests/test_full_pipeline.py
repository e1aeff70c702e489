"""Full artifact pipeline on a synthetic raw corpus, via the real CLIs:

  index_dataset → preprocessing(emg) → train → evaluate

validating the reference's on-disk contracts end-to-end (manifest schema,
feature cache, checkpoint dir, metrics artifacts)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

REPO = Path(__file__).resolve().parent.parent


def _run(cmd, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["PYTHONPATH"] = str(REPO)
    r = subprocess.run(cmd, cwd=cwd, env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, f"{' '.join(map(str, cmd))}\n{r.stderr[-3000:]}"
    return r


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    """Synthetic raw corpus: 6 voiced utterances with 8-channel EMG."""
    rng = np.random.default_rng(0)
    wd = tmp_path_factory.mktemp("pipeline")
    root = wd / "data" / "emg_data"
    d = root / "voiced_parallel_data" / "spk"
    d.mkdir(parents=True)
    texts = ["hello there", "good morning", "silent speech", "the cat", "a dog", "end now"]
    for i, text in enumerate(texts):
        n = int(rng.integers(1200, 2400))
        np.save(d / f"{i}_0_emg.npy", rng.normal(size=(n, 8)).astype(np.float32))
        (d / f"{i}_0_info.json").write_text(
            json.dumps({"text": text, "sentence_index": i, "book": "b"})
        )
    (wd / "configs").mkdir()
    from ssd_tpu.data.vocab import default_vocab

    default_vocab().to_json(wd / "configs" / "vocab.json")
    return wd


def test_pipeline(workdir):
    wd = workdir
    py = sys.executable

    # 1. index
    _run(
        [py, "-m", "ssd_tpu.data.index_dataset", "--root", "data/emg_data",
         "--out", "results/index.parquet", "--splits", "voiced_parallel_data",
         "--stats", "--durations"],
        cwd=wd,
    )
    from ssd_tpu.data.index_dataset import load_index

    df = load_index(wd / "results/index.parquet")
    assert len(df) == 6
    assert set(df["subset"]) <= {"train", "val", "test"}

    # 2. featurize EMG (XLA path on CPU)
    _run(
        [py, "-m", "ssd_tpu.data.preprocessing", "--mode", "emg",
         "--index", "results/index.parquet", "--root", "data/emg_data",
         "--out", "results/features/emg", "--emg-n-fft", "320",
         "--emg-hop-length", "10", "--no-fused"],
        cwd=wd,
    )
    feats = sorted((wd / "results/features/emg").rglob("*.npy"))
    assert len(feats) == 6
    assert np.load(feats[0]).shape[1:] == (8, 80)

    # 3. train (tiny encoder, 1 epoch, all subsets as train+val)
    cfg = {
        "data": {
            "index": "results/index.parquet",
            "features_root": "results/features",
            "train_splits": ["voiced_parallel_data"],
            "val_splits": ["voiced_parallel_data"],
            "train_subsets": None,
            "val_subsets": None,
            "vocab": "configs/vocab.json",
            "include_teacher": False,
            "teacher_strict": False,
        },
        "features": {"teacher": {"dim": 768}},
        "model": {
            "encoder": {"d_model": 16, "num_layers": 1, "num_heads": 2,
                         "ffn_dim": 32, "depthwise_conv_kernel_size": 7,
                         "dropout": 0.1, "subsample_factor": 2},
            "projection_dim": 8,
            "ctc_dropout": 0.1,
        },
        "loss": {"lambda_distill": 0.0, "lambda_ctc": 1.0},
        "optim": {"batch_size": 3, "grad_accum": 1, "lr": 1e-3,
                  "weight_decay": 0.0, "max_epochs": 1, "clip_grad_norm": 5.0},
        "logging": {"seed": 0, "run_name": "pipe", "log_interval": 1},
    }
    (wd / "configs" / "pipe.yaml").write_text(yaml.safe_dump(cfg))
    _run(
        [py, "-m", "ssd_tpu.training.train", "--config", "configs/pipe.yaml",
         "--run-dir", "results/checkpoints/pipe"],
        cwd=wd,
    )
    assert (wd / "results/checkpoints/pipe/best").exists()
    assert (wd / "results/checkpoints/pipe/config.json").exists()

    # 4. evaluate with on-device beam
    _run(
        [py, "-m", "ssd_tpu.evaluation.evaluate",
         "--checkpoint", "results/checkpoints/pipe/best",
         "--decoder", "beam", "--beam-width", "8", "--batch-size", "3",
         "--splits", "voiced_parallel_data",
         "--subsets", "train", "val", "test",
         "--output", "results/eval/pipe", "--run-name", "pipe"],
        cwd=wd,
    )
    metrics = json.loads((wd / "results/eval/pipe/metrics.json").read_text())
    assert 0 <= metrics["cer"]
    assert metrics["decoder"]["type"] == "beam"
    preds = (wd / "results/eval/pipe/predictions.jsonl").read_text().strip().splitlines()
    assert len(preds) == metrics["data"]["num_samples"]
