"""Experiments layer: config builders, pick_best, summary writing, dry-run
orchestration command generation."""

import json
from pathlib import Path

import pytest
import yaml

from ssd_tpu.experiments.config_builder import (
    FULL_DECODERS_SILENT,
    FULL_DECODERS_VOICED,
    build_silent_probe_configs,
    build_silent_stage2_configs,
    build_voiced_probe_configs,
    build_voiced_stage2_configs,
)
from ssd_tpu.experiments.orchestrate import (
    best_probe_to_knobs,
    pick_best,
    run_specs,
    write_summary,
)


def test_voiced_probe_configs():
    specs = build_voiced_probe_configs(48)
    assert len(specs) == 5
    names = {s.name for s in specs}
    assert "probe_voiced_hold_lightaug" in names
    for s in specs:
        assert s.stage == "stage1"
        assert s.overfit_batches == 48
        assert s.config["optim"]["max_epochs"] == 6
        assert s.config["experiment"]["probe_batches"] == 48
        assert s.config["logging"]["run_name"] == s.name
        assert len(s.decoder_grid) == 3


def test_silent_probe_configs():
    ckpt = Path("results/checkpoints/foo/best")
    specs = build_silent_probe_configs(24, ckpt)
    assert len(specs) == 4
    subs = {s.name: s.config["model"]["encoder"]["subsample_factor"] for s in specs}
    assert subs["probe_silent_sub4_fast"] == 4
    assert subs["probe_silent_sub2_light"] == 2
    for s in specs:
        assert s.init_checkpoint == ckpt
        assert s.config["data"]["include_teacher"] is False


def test_stage2_adapts_best_probe():
    best = {
        "specaugment_p": 0.28,
        "lambda_ctc": 0.62,
        "lambda_distill": 0.38,
        "channel_dropout_p": 0.15,
        "channel_dropout_max": 2,
        "decoder_type": "beam",
        "beam_width": 20,
        "alpha": 0.45,
        "blank_bias": 0.12,
        "scheduler_cfg": {"name": "warmup_hold", "warmup_steps": 340},
        "dropout": 0.12,
    }
    specs = build_voiced_stage2_configs(best)
    assert [s.name for s in specs] == ["stage2_voiced_baseline", "stage2_voiced_adapted"]
    adapted = specs[1].config
    assert adapted["loss"]["lambda_ctc"] == 0.62
    assert adapted["augmentation"]["channel_dropout"]["p"] == 0.15
    assert adapted["decoding"]["blank_bias"] == 0.12
    assert specs[0].decoder_grid == FULL_DECODERS_VOICED

    silent = build_silent_stage2_configs({"subsample_factor": 2}, Path("ck"))
    assert [s.name for s in silent] == ["stage2_silent_baseline", "stage2_silent_adapted"]
    assert silent[1].decoder_grid == FULL_DECODERS_SILENT
    assert silent[1].init_checkpoint == Path("ck")


def test_pick_best_ordering():
    records = [
        {"dataset": "voiced", "stage": "stage1", "cer": 0.5, "wer": 0.9, "deletion_rate": 0.1, "train_run": "a"},
        {"dataset": "voiced", "stage": "stage1", "cer": 0.4, "wer": 0.95, "deletion_rate": 0.3, "train_run": "b"},
        {"dataset": "voiced", "stage": "stage2", "cer": 0.3, "wer": 0.9, "deletion_rate": 0.1, "train_run": "c"},
        {"dataset": "silent", "stage": "stage1", "cer": 0.2, "wer": 0.9, "deletion_rate": 0.1, "train_run": "d"},
        {"dataset": "voiced", "stage": "stage1", "cer": None, "train_run": "e"},
    ]
    assert pick_best(records, "voiced", "stage1")["train_run"] == "b"
    assert pick_best(records, "voiced")["train_run"] == "c"
    assert pick_best(records, "silent")["train_run"] == "d"
    assert pick_best(records, "closed") is None


def test_write_summary_and_knobs(tmp_path):
    rec = {
        "stage": "stage1",
        "dataset": "voiced",
        "train_run": "run_a",
        "run_name": "run_a__greedy",
        "decoder_name": "greedy",
        "decoder_type": "greedy",
        "wer": 0.9,
        "cer": 0.5,
        "deletion_rate": 0.1,
        "tags": ["x", "y"],
        "features": {"specaugment_p": 0.2, "lambda_ctc": 0.6, "scheduler": "warmup_hold"},
    }
    jp, cp = tmp_path / "summary.json", tmp_path / "summary.csv"
    write_summary([rec], jp, cp)
    assert json.loads(jp.read_text())[0]["train_run"] == "run_a"
    header = cp.read_text().splitlines()[0]
    assert "cer" in header and "specaugment_p" in header
    row = cp.read_text().splitlines()[1]
    assert "run_a" in row and "x,y" in '"'.join(row.split('"'))

    knobs = best_probe_to_knobs(rec)
    assert knobs["specaugment_p"] == 0.2
    assert knobs["decoder_type"] == "greedy"


def test_run_specs_dry_run(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    # regenerate base + experiment-data configs relative to tmp cwd
    import shutil

    (tmp_path / "configs").mkdir()
    shutil.copy(Path("/root/repo/configs/tpu_fast_plus.yaml"), tmp_path / "configs/tpu_fast_plus.yaml")
    shutil.copytree(Path("/root/repo/configs/experiments"), tmp_path / "configs/experiments")
    specs = build_voiced_probe_configs(2)[:1]
    records = run_specs(
        specs,
        dry_run=True,
        force_train=False,
        force_eval=False,
        eval_batch_size=4,
    )
    assert records == []  # dry-run produces no records
    cfg_path = tmp_path / "results/experiments/configs/probe_voiced_hold_lightaug.yaml"
    assert cfg_path.exists()
    cfg = yaml.safe_load(cfg_path.read_text())
    assert cfg["experiment"]["stage"] == "stage1"
