"""Orchestrator executed FOR REAL (no --dry-run) on a synthetic corpus.

VERDICT r1 item 6: run the full two-stage pipeline — voiced probes →
pick_best → stage-2 voiced → best checkpoint seeds silent probes → stage-2
silent — through the actual subprocess entry points, asserting the
summary.json/csv structure, the init-checkpoint chain, the LM-skip path, and
idempotent --resume. Values on random synthetic data are not pinned (they
are platform-dependent); the structure is the regression surface.
"""

from __future__ import annotations

import csv
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest
import yaml

from ssd_tpu.data.index_dataset import save_index
from ssd_tpu.data.vocab import default_vocab

REPO = Path(__file__).resolve().parents[1]

TINY_MODEL = {
    "encoder": {
        "d_model": 16, "num_layers": 1, "num_heads": 2, "ffn_dim": 32,
        "depthwise_conv_kernel_size": 7, "dropout": 0.05, "subsample_factor": 2,
    },
    "projection_dim": 8,
    "ctc_dropout": 0.05,
}


def _write_corpus(wd: Path) -> None:
    rng = np.random.default_rng(0)
    rows = []
    texts = ["hello world", "go go", "a cat sat", "silent speech here", "hi there"]
    for split, n in (("voiced_parallel_data", 10), ("silent_parallel_data", 8)):
        d = wd / "results/features/emg" / split / "s1"
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            t = int(rng.integers(40, 90))
            np.save(d / f"{i}_0.npy", rng.normal(size=(t, 2, 8)).astype(np.float32))
            rows.append(dict(
                utterance_id=f"{split}/s1/{i}_0", split=split,
                subset=["train", "train", "train", "val", "test"][i % 5],
                speaker="s1", stem=f"{i}_0", emg_path="x", audio_path=None,
                transcript=texts[i % len(texts)], sentence_index=i, book="",
                has_audio=split == "voiced_parallel_data", metadata_json="{}",
            ))
    save_index(pd.DataFrame(rows), wd / "results/index.parquet")


def _write_configs(wd: Path) -> None:
    (wd / "configs/experiments").mkdir(parents=True, exist_ok=True)
    default_vocab().to_json(wd / "configs/vocab.json")

    def base_cfg(splits):
        return {
            "data": {
                "index": "results/index.parquet",
                "features_root": "results/features",
                "train_splits": [splits], "train_subsets": ["train"],
                "val_splits": [splits], "val_subsets": ["val"],
                "vocab": "configs/vocab.json",
                "include_teacher": False, "teacher_strict": False,
            },
            "features": {"teacher": {"dim": 8}},
            "model": TINY_MODEL,
            "loss": {"lambda_distill": 0.0, "lambda_ctc": 1.0},
            "optim": {
                "batch_size": 4, "grad_accum": 1, "lr": 2e-3,
                "weight_decay": 1e-3, "max_epochs": 2, "clip_grad_norm": 5.0,
                "scheduler": {"name": "warmup_hold", "warmup_steps": 4},
                "early_stopping": {"patience": 1, "min_delta": 0.0},
            },
            "decoding": {"type": "beam", "beam_width": 8},
            "logging": {"seed": 0, "run_name": "base", "log_interval": 50},
        }

    (wd / "configs/tpu_fast_plus.yaml").write_text(
        yaml.safe_dump(base_cfg("voiced_parallel_data")))
    (wd / "configs/tpu_silent_finetune_plus.yaml").write_text(
        yaml.safe_dump(base_cfg("silent_parallel_data")))

    (wd / "configs/experiments/voiced_probes.yaml").write_text(yaml.safe_dump({
        "base_overrides": {"optim": {"max_epochs": 1}},
        "variants": [{"name": "probe_v_base", "overrides": {},
                      "tags": ["baseline"], "description": "tiny probe"}],
    }))
    (wd / "configs/experiments/silent_probes.yaml").write_text(yaml.safe_dump({
        "base_overrides": {"optim": {"max_epochs": 1}},
        "variants": [{"name": "probe_s_base", "overrides": {},
                      "tags": ["baseline"], "description": "tiny silent probe"}],
    }))
    # slim decoder grids; one use_lm entry exercises the LM-missing skip path
    (wd / "configs/experiments/decoder_grids.yaml").write_text(yaml.safe_dump({
        "probe_voiced": [
            {"name": "beam8", "method": "beam", "beam_width": 8, "alpha": 0.45},
        ],
        "probe_silent": [{"name": "greedy", "method": "greedy"}],
        "full_voiced": [
            {"name": "greedy", "method": "greedy"},
            {"name": "beam8_lm", "method": "beam", "beam_width": 8,
             "alpha": 0.5, "use_lm": True, "lm_path": "results/lm/char_5gram.arpa"},
        ],
        "full_silent": [{"name": "greedy", "method": "greedy"}],
    }))


def _run_orchestrate(wd: Path, *extra: str) -> subprocess.CompletedProcess:
    # Hermetic subprocess env: PYTHONPATH = repo ONLY. Inheriting the
    # ambient PYTHONPATH leaks the TPU plugin's sitecustomize, which
    # overrides JAX_PLATFORMS=cpu and routes every orchestrate child onto
    # the single-holder remote TPU — slow, contended, and occasionally a
    # hard hang (observed: eval stuck in the remote event loop with 0 CPU).
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env.pop("PALLAS_AXON_POOL_IPS", None)  # belt + suspenders: gates the plugin
    return subprocess.run(
        [sys.executable, "-m", "ssd_tpu.experiments.orchestrate",
         "--probe-batches", "1", "--probe-batches-silent", "1",
         "--eval-batch-size", "4", *extra],
        cwd=wd, env=env, capture_output=True, text=True, timeout=2700,
    )


def test_orchestrate_two_stage_real_run(tmp_path):
    wd = tmp_path
    _write_corpus(wd)
    _write_configs(wd)

    proc = _run_orchestrate(wd)
    assert proc.returncode == 0, proc.stderr[-4000:]

    summary_json = wd / "results/experiments/summary.json"
    summary_csv = wd / "results/experiments/summary.csv"
    assert summary_json.exists() and summary_csv.exists()
    records = json.loads(summary_json.read_text())

    # every stage×dataset cell executed
    cells = {(r["stage"], r["dataset"]) for r in records}
    assert cells == {("stage1", "voiced"), ("stage2", "voiced"),
                     ("stage1", "silent"), ("stage2", "silent")}, cells

    # metrics present and sane on every record
    for r in records:
        assert r["cer"] is not None and 0.0 <= r["cer"] <= 2.0
        assert r["wer"] is not None and 0.0 <= r["wer"] <= 2.0
        assert (wd / r["checkpoint_path"]).exists()
        assert (wd / r["eval_dir"] / "metrics.json").exists()

    # the pick_best → silent-seed chain: every silent record warm-started
    # from the best voiced stage-2 checkpoint
    from ssd_tpu.experiments.orchestrate import pick_best

    best_voiced = pick_best(records, "voiced", "stage2")
    assert best_voiced is not None
    for r in records:
        if r["dataset"] == "silent":
            assert r["init_checkpoint"] == best_voiced["checkpoint_path"], r["train_run"]

    # LM decoder was skipped (no ARPA present) — no lm_used record exists
    assert not any(r.get("lm_used") for r in records)
    assert not any(r["decoder_name"] == "beam8_lm" for r in records)

    # CSV: exact reference-shaped header, one row per record
    with summary_csv.open() as f:
        reader = csv.reader(f)
        header = next(reader)
        rows = list(reader)
    from ssd_tpu.experiments.orchestrate import CSV_FIELDS

    assert header == CSV_FIELDS
    assert len(rows) == len(records)

    # ---- idempotent --resume: everything skips, record count unchanged
    proc2 = _run_orchestrate(wd, "--resume")
    assert proc2.returncode == 0, proc2.stderr[-4000:]
    records2 = json.loads(summary_json.read_text())
    assert len(records2) == len(records)
    assert "skipping" in (proc2.stderr + proc2.stdout).lower()
