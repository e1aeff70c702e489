"""Visualization smoke tests (reference visualize.py surface)."""

import numpy as np

from ssd_tpu.evaluation.visualize import (
    load_features,
    plot_emg,
    plot_emg_vs_teacher,
    plot_projection,
)


def test_plots_written(tmp_path):
    rng = np.random.default_rng(0)
    emg = rng.normal(size=(40, 4, 16)).astype(np.float32)
    teacher = rng.normal(size=(20, 12)).astype(np.float32)

    plot_emg(emg, tmp_path / "emg.png")
    plot_emg_vs_teacher(emg, teacher, tmp_path / "both.png")
    plot_projection(teacher, tmp_path / "proj.png")
    for name in ("emg.png", "both.png", "proj.png"):
        assert (tmp_path / name).stat().st_size > 0


def test_load_features(tmp_path):
    d = tmp_path / "emg" / "split" / "s"
    d.mkdir(parents=True)
    np.save(d / "u.npy", np.zeros((5, 2, 3), np.float32))
    emg, teacher = load_features(tmp_path, "split/s/u")
    assert emg.shape == (5, 2, 3)
    assert teacher is None
