"""End-to-end training smoke: loader → jitted step → checkpoint → warm start
(reference tests/test_training.py strategy, on an 8-device CPU mesh)."""

import json

import numpy as np
import pytest

from ssd_tpu.training.train import train_from_config

from .helpers import make_tiny_setup


@pytest.fixture
def tiny_setup(tmp_path):
    cfg, _, root = make_tiny_setup(tmp_path)
    return cfg, root


def test_train_epoch_and_checkpoint(tiny_setup):
    cfg, tmp_path = tiny_setup
    run_dir = tmp_path / "run"
    summary = train_from_config(cfg, run_dir)
    assert (run_dir / "last").exists()
    assert (run_dir / "best").exists()
    assert json.loads((run_dir / "config.json").read_text())["logging"]["run_name"] == "tiny"
    assert np.isfinite(summary["best_val"])
    assert summary["best_epoch"] >= 1


def test_async_checkpoints_equivalent(tiny_setup):
    """logging.async_checkpoints overlaps orbax IO with the next epoch; the
    written checkpoint must be byte-equivalent to the synchronous one (same
    seed → same params)."""
    import jax
    from ssd_tpu.training.checkpoint import load_checkpoint

    cfg, tmp_path = tiny_setup
    run_sync = tmp_path / "run_sync"
    train_from_config(cfg, run_sync)
    cfg2 = json.loads(json.dumps(cfg))
    cfg2["logging"]["async_checkpoints"] = True
    run_async = tmp_path / "run_async"
    train_from_config(cfg2, run_async)
    a = load_checkpoint(run_sync / "last")
    b = load_checkpoint(run_async / "last")
    assert int(a["epoch"]) == int(b["epoch"])
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x), np.asarray(y)),
        dict(a["params"]),
        dict(b["params"]),
    )


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


def test_mid_run_resume_continues_epochs(tiny_setup):
    """Opt-in --resume: a 1-epoch run resumed with max_epochs=3 continues at
    epoch 2 with restored optimizer state (total epochs span 1..3)."""
    cfg, tmp_path = tiny_setup
    run_dir = tmp_path / "run_resume"
    cfg = json.loads(json.dumps(cfg))
    cfg["optim"]["max_epochs"] = 1
    train_from_config(cfg, run_dir)
    assert (run_dir / "last").exists()

    cfg["optim"]["max_epochs"] = 3
    summary = train_from_config(cfg, run_dir, resume=True)
    assert summary["epochs"] == 3  # final epoch index — resumed, not restarted
    assert np.isfinite(summary["best_val"])

    # resuming a finished run is a no-op (no epochs to run)
    summary2 = train_from_config(cfg, run_dir, resume=True)
    assert summary2["epochs"] == 3
    assert summary2["best_epoch"] == 0  # no new epochs ran


def test_overfit_batches_limits_data(tiny_setup):
    cfg, tmp_path = tiny_setup
    summary = train_from_config(
        cfg, tmp_path / "run3", dry_run=True, overfit_batches=1
    )
    assert np.isfinite(summary["best_val"])


def test_preemption_saves_resumable_checkpoint(tiny_setup, monkeypatch):
    """SIGTERM mid-epoch → flag set → epoch loop saves a resumable `last`
    labeled with the last COMPLETED epoch and returns preempted=True; a
    --resume run then re-runs the interrupted epoch and finishes."""
    import os
    import signal as _signal

    import ssd_tpu.training.train as trainmod

    cfg, tmp_path = tiny_setup
    cfg = json.loads(json.dumps(cfg))
    cfg["optim"]["max_epochs"] = 3
    run_dir = tmp_path / "run_preempt"

    real = trainmod.batch_to_arrays
    calls = {"n": 0}

    def sabotaged(batch, include_teacher):
        calls["n"] += 1
        if calls["n"] == 2:  # deliver SIGTERM during epoch 1's batch loop
            os.kill(os.getpid(), _signal.SIGTERM)
        return real(batch, include_teacher)

    monkeypatch.setattr(trainmod, "batch_to_arrays", sabotaged)
    summary = train_from_config(cfg, run_dir)
    assert summary["preempted"] is True
    assert summary["epochs"] < 3  # stopped early
    assert (run_dir / "last").exists()

    # signal handlers restored after train_from_config
    assert _signal.getsignal(_signal.SIGTERM) is _signal.SIG_DFL

    monkeypatch.setattr(trainmod, "batch_to_arrays", real)
    resumed = train_from_config(cfg, run_dir, resume=True)
    assert resumed["preempted"] is False
    assert resumed["epochs"] == 3  # re-ran epoch 1 (label rolled back) → 3
    assert (run_dir / "best").exists()


def test_emg_dtype_requires_bf16_compute(tmp_path):
    """data.emg_dtype: bfloat16 without a bf16-compute encoder must be
    rejected up front (it would silently change training numerics)."""
    from .helpers import make_tiny_setup

    cfg, vocab, root = make_tiny_setup(tmp_path)
    cfg["data"]["emg_dtype"] = "bfloat16"  # encoder compute_dtype is fp32
    with pytest.raises(ValueError, match="compute_dtype"):
        train_from_config(cfg, root / "run", dry_run=True)
