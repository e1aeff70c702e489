"""CLI integration: the reference's subprocess surface end-to-end on tiny
synthetic data — train CLI → evaluate CLI artifacts → orchestrate dry-run."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

from .helpers import make_tiny_setup

REPO = Path(__file__).resolve().parent.parent


def _run(cmd, cwd=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["PYTHONPATH"] = str(REPO)
    return subprocess.run(
        cmd, cwd=cwd or REPO, env=env, capture_output=True, text=True, timeout=600
    )


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    cfg, vocab, root = make_tiny_setup(tmp)
    cfg_path = root / "tiny.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    return cfg, cfg_path, root


def test_train_then_evaluate_cli(setup):
    cfg, cfg_path, root = setup
    run_dir = root / "cli_run"
    r = _run(
        [sys.executable, "-m", "ssd_tpu.training.train", "--config", str(cfg_path),
         "--run-dir", str(run_dir), "--dry-run"]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert (run_dir / "best").exists()

    out_dir = root / "cli_eval"
    r = _run(
        [sys.executable, "-m", "ssd_tpu.evaluation.evaluate",
         "--checkpoint", str(run_dir / "best"),
         "--decoder", "greedy", "--batch-size", "2",
         "--output", str(out_dir), "--run-name", "cli_eval"]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    metrics = json.loads((out_dir / "metrics.json").read_text())
    assert "cer" in metrics and "error_breakdown" in metrics
    assert metrics["run_name"] == "cli_eval"
    assert (out_dir / "predictions.jsonl").exists()
    assert (out_dir / "config_used.json").exists()


def test_build_char_lm_cli(setup, tmp_path):
    cfg, cfg_path, root = setup
    out = tmp_path / "lm" / "char_5gram.arpa"
    r = _run(
        [sys.executable, "-m", "ssd_tpu.decoding.build_char_lm",
         "--index", cfg["data"]["index"], "--order", "3", "--output", str(out)]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists() and out.with_suffix(".txt").exists()
    from ssd_tpu.decoding.lm import NGramLM

    lm = NGramLM.from_arpa(out)
    assert np.isfinite(lm.score_log10("hello world"))


def test_orchestrate_dry_run(setup, tmp_path):
    # run in an isolated workdir (orchestrate resolves configs/ and results/
    # relative to cwd, mirroring the reference's artifact layout)
    import shutil

    (tmp_path / "configs").mkdir()
    for name in ("tpu_fast_plus.yaml", "tpu_silent_finetune_plus.yaml"):
        shutil.copy(REPO / "configs" / name, tmp_path / "configs" / name)
    shutil.copytree(REPO / "configs" / "experiments", tmp_path / "configs" / "experiments")
    r = _run(
        [sys.executable, "-m", "ssd_tpu.experiments.orchestrate", "--dry-run",
         "--stage", "stage1",
         "--summary-json", str(tmp_path / "summary.json")],
        cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    cfg_dir = tmp_path / "results/experiments/configs"
    assert (cfg_dir / "probe_voiced_hold_lightaug.yaml").exists()
    written = yaml.safe_load((cfg_dir / "probe_voiced_hold_lightaug.yaml").read_text())
    assert written["experiment"]["stage"] == "stage1"
