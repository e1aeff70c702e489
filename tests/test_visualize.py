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


def test_cli_main_writes_all_artifacts(tmp_path, monkeypatch):
    """End-to-end main(): EMG+teacher caches with metadata sidecars → 3 PNGs."""
    import json
    import sys

    from ssd_tpu.evaluation import visualize

    rng = np.random.default_rng(1)
    utt = "split/spk/utt0"
    emg_dir = tmp_path / "features" / "emg" / "split" / "spk"
    tch_dir = tmp_path / "features" / "teacher" / "split" / "spk"
    emg_dir.mkdir(parents=True)
    tch_dir.mkdir(parents=True)
    np.save(emg_dir / "utt0.npy", rng.normal(size=(30, 8, 10)).astype(np.float32))
    np.save(tch_dir / "utt0.npy", rng.normal(size=(15, 12)).astype(np.float32))
    (emg_dir / "utt0.json").write_text(json.dumps({"hop_length": 10, "sample_rate": 1000}))
    (tch_dir / "utt0.json").write_text(json.dumps({"frame_stride_sec": 0.02}))

    out_dir = tmp_path / "plots"
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "visualize",
            "--features-root",
            str(tmp_path / "features"),
            "--utterance-id",
            utt,
            "--out-dir",
            str(out_dir),
            "--umap",
        ],
    )
    visualize.main()
    safe = utt.replace("/", "_")
    for suffix in ("emg", "emg_teacher", "teacher_umap"):
        assert (out_dir / f"{safe}_{suffix}.png").stat().st_size > 0


def test_load_features(tmp_path):
    d = tmp_path / "emg" / "split" / "s"
    d.mkdir(parents=True)
    np.save(d / "u.npy", np.zeros((5, 2, 3), np.float32))
    emg, teacher = load_features(tmp_path, "split/s/u")
    assert emg.shape == (5, 2, 3)
    assert teacher is None
