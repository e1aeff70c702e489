"""On-device augmentation config path: training runs with
augmentation.on_device and loader-side augmentation is disabled."""

import numpy as np
import pytest

from ssd_tpu.training.train import train_from_config

from .helpers import make_tiny_setup


def test_on_device_augment_trains(tmp_path):
    cfg, _, root = make_tiny_setup(tmp_path)
    cfg["augmentation"] = {
        "on_device": True,
        "specaugment": {"p": 0.5, "time_masks": 1, "freq_masks": 1,
                         "time_mask_width": 0.1, "freq_mask_width": 4},
        "channel_dropout": {"p": 0.5, "max_channels": 1},
    }
    cfg["features"]["emg"] = {"n_mels": 8}  # tiny features are (T, 2, 8)
    summary = train_from_config(cfg, root / "run_dev_aug", dry_run=True)
    assert np.isfinite(summary["best_val"])
