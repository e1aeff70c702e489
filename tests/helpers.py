"""Shared synthetic-dataset builders for tests."""

from pathlib import Path

import numpy as np
import pandas as pd

from ssd_tpu.data.index_dataset import save_index
from ssd_tpu.data.vocab import default_vocab


def make_tiny_setup(tmp_path: Path, teacher_dim: int = 12):
    """Synthetic cache + config for a tiny end-to-end run."""
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
            np.save(td / f"{i}_0.npy", rng.normal(size=(t // 2, teacher_dim)).astype(np.float32))
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
        "features": {"teacher": {"dim": teacher_dim}},
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
            "projection_dim": teacher_dim,
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
        "decoding": {"type": "beam", "beam_width": 8, "alpha": 0.4, "beam_prune_logp": -10.0},
        "logging": {"seed": 0, "run_name": "tiny", "log_interval": 1},
    }
    return cfg, vocab, tmp_path
