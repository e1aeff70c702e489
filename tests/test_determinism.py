"""Reproducibility: identical seeds produce identical training trajectories
(seeded loader shuffling + augmentation, deterministic device RNG)."""

import numpy as np
import pytest

from ssd_tpu.training.train import train_from_config

from .helpers import make_tiny_setup


def test_same_seed_same_losses(tmp_path):
    cfg, _, root = make_tiny_setup(tmp_path)
    s1 = train_from_config(cfg, root / "r1", dry_run=True)
    s2 = train_from_config(cfg, root / "r2", dry_run=True)
    assert s1["best_val"] == s2["best_val"]


def test_different_seed_different_losses(tmp_path):
    cfg, _, root = make_tiny_setup(tmp_path)
    s1 = train_from_config(cfg, root / "r1", dry_run=True)
    cfg2 = dict(cfg)
    cfg2["logging"] = dict(cfg["logging"], seed=123)
    s2 = train_from_config(cfg2, root / "r2", dry_run=True)
    assert s1["best_val"] != s2["best_val"]
