"""End-to-end training smoke: loader → jitted step → checkpoint → warm start
(reference tests/test_training.py strategy, on an 8-device CPU mesh)."""

import json
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from ssd_tpu.data.index_dataset import save_index
from ssd_tpu.data.vocab import default_vocab
from ssd_tpu.training.train import train_from_config


@pytest.fixture
def tiny_setup(tmp_path):
    rng = np.random.default_rng(0)
    vocab = default_vocab()
    feats_root = tmp_path / "features"
    rows = []
    for split in ("voiced_parallel_data",):
        for i, (subset, t) in enumerate([("train", 40), ("train", 60), ("val", 50)]):
            uid = f"{split}/s1/{i}_0"
            rows.append(
                dict(
                    utterance_id=uid,
                    split=split,
                    subset=subset,
                    speaker="s1",
                    stem=f"{i}_0",
                    emg_path="x",
                    audio_path=None,
                    transcript="hello world",
                    sentence_index=i,
                    book="",
                    has_audio=True,
                    metadata_json="{}",
                )
            )
            d = feats_root / "emg" / split / "s1"
            d.mkdir(parents=True, exist_ok=True)
            np.save(d / f"{i}_0.npy", rng.normal(size=(t, 2, 8)).astype(np.float32))
            td = feats_root / "teacher" / split / "s1"
            td.mkdir(parents=True, exist_ok=True)
            np.save(td / f"{i}_0.npy", rng.normal(size=(t // 2, 12)).astype(np.float32))
    index_path = tmp_path / "index.parquet"
    save_index(pd.DataFrame(rows), index_path)
    vocab_path = tmp_path / "vocab.json"
    vocab.to_json(vocab_path)

    cfg = {
        "data": {
            "index": str(index_path),
            "features_root": str(feats_root),
            "train_splits": ["voiced_parallel_data"],
            "val_splits": ["voiced_parallel_data"],
            "train_subsets": ["train"],
            "val_subsets": ["val"],
            "vocab": str(vocab_path),
            "include_teacher": True,
        },
        "features": {"teacher": {"dim": 12}},
        "model": {
            "encoder": {
                "d_model": 16,
                "num_layers": 1,
                "num_heads": 2,
                "ffn_dim": 32,
                "depthwise_conv_kernel_size": 7,
                "dropout": 0.1,
                "subsample_factor": 2,
            },
            "projection_dim": 12,
            "ctc_dropout": 0.1,
        },
        "loss": {"lambda_distill": 0.4, "lambda_ctc": 0.6, "distill_warmup_epochs": 1},
        "optim": {
            "batch_size": 2,
            "grad_accum": 2,
            "lr": 1e-3,
            "weight_decay": 1e-2,
            "max_epochs": 2,
            "clip_grad_norm": 5.0,
            "scheduler": {"name": "warmup_hold", "warmup_steps": 2},
        },
        "augmentation": {"specaugment": {"p": 0.5, "time_masks": 1, "freq_masks": 1}},
        "logging": {"seed": 0, "run_name": "tiny", "log_interval": 1},
    }
    return cfg, tmp_path


def test_train_epoch_and_checkpoint(tiny_setup):
    cfg, tmp_path = tiny_setup
    run_dir = tmp_path / "run"
    summary = train_from_config(cfg, run_dir)
    assert (run_dir / "last").exists()
    assert (run_dir / "best").exists()
    assert json.loads((run_dir / "config.json").read_text())["logging"]["run_name"] == "tiny"
    assert np.isfinite(summary["best_val"])
    assert summary["best_epoch"] >= 1


def test_warm_start_and_dry_run(tiny_setup):
    cfg, tmp_path = tiny_setup
    run_dir = tmp_path / "run1"
    train_from_config(cfg, run_dir, dry_run=True)
    # fine-tune config (silent-style: no teacher, CTC only) warm-started
    cfg2 = json.loads(json.dumps(cfg))
    cfg2["data"]["include_teacher"] = False
    cfg2["loss"] = {"lambda_distill": 0.0, "lambda_ctc": 1.0}
    run_dir2 = tmp_path / "run2"
    summary = train_from_config(
        cfg2, run_dir2, init_checkpoint=run_dir / "best", dry_run=True
    )
    assert np.isfinite(summary["best_val"])


def test_overfit_batches_limits_data(tiny_setup):
    cfg, tmp_path = tiny_setup
    summary = train_from_config(
        cfg, tmp_path / "run3", dry_run=True, overfit_batches=1
    )
    assert np.isfinite(summary["best_val"])
