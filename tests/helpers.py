"""Shared synthetic-dataset builders for tests."""

from pathlib import Path
from typing import List, Tuple

import numpy as np
import pandas as pd

from ssd_tpu.data.index_dataset import save_index
from ssd_tpu.data.vocab import default_vocab


# ---------------------------------------------------------------------------
# Separable sine corpus: raw EMG whose oscillation frequency encodes the char
# ---------------------------------------------------------------------------

SEP_WORDS = ["cat", "dog", "sun", "mat", "run", "hat", "pen", "cup"]
SEP_CHANNELS = 2
SEP_FEAT_CFG = dict(sample_rate=1000, n_fft=64, hop_length=16, n_mels=8,
                    normalize="per_file")
SEP_SAMPLES_PER_CHAR = 64  # → 4 feature frames per char at hop 16


def render_sine_emg(
    text: str, rng: np.random.Generator, freqs: np.ndarray, phases: np.ndarray,
    noise: float = 0.05,
) -> np.ndarray:
    """Raw (samples, channels) signal whose per-char frequency encodes ids."""
    vocab = default_vocab()
    ids = vocab.encode(text)
    per = SEP_SAMPLES_PER_CHAR
    sig = np.zeros((len(ids) * per, SEP_CHANNELS), np.float32)
    t = np.arange(per) / SEP_FEAT_CFG["sample_rate"]
    for k, cid in enumerate(ids):
        sig[k * per : (k + 1) * per] = np.sin(
            2 * np.pi * freqs[cid][None, :] * t[:, None] + phases[cid][None, :]
        )
    return sig + rng.normal(size=sig.shape).astype(np.float32) * noise


def sep_char_codes(seed: int = 17) -> Tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    vocab = default_vocab()
    freqs = rng.uniform(30, 450, size=(vocab.size, SEP_CHANNELS))
    phases = rng.uniform(0, 2 * np.pi, size=(vocab.size, SEP_CHANNELS))
    return freqs, phases


def make_separable_setup(
    tmp_path: Path,
    n_train: int = 24,
    n_val: int = 6,
    noise: float = 0.05,
    seed: int = 0,
    words_per_utt: Tuple[int, int] = (2, 4),
    max_epochs: int = 18,
    split: str = "voiced_parallel_data",
):
    """Corpus + config where raw sine EMG encodes the transcript.

    Features are produced by the REAL featurizer (XLA path) at the config's
    ``features.emg`` settings, so a serving engine built from the resulting
    checkpoint featurizes raw EMG identically — usable for streaming and
    accuracy-gate tests where hypotheses must be non-trivial.
    """
    import jax.numpy as jnp

    from ssd_tpu.ops.featurizer import FeaturizerConfig, logmel_batch

    rng = np.random.default_rng(seed)
    vocab = default_vocab()
    freqs, phases = sep_char_codes()
    feat_cfg = FeaturizerConfig(**SEP_FEAT_CFG)
    feats_root = tmp_path / "features"
    rows = []
    texts: List[str] = []
    for i in range(n_train + n_val):
        subset = "train" if i < n_train else "val"
        text = " ".join(
            rng.choice(SEP_WORDS, size=rng.integers(*words_per_utt))
        )
        texts.append(text)
        raw = render_sine_emg(text, rng, freqs, phases, noise)
        feats, n_frames, _, _ = logmel_batch(
            jnp.asarray(raw[None]), jnp.asarray([len(raw)], np.int32),
            feat_cfg, fused=False,
        )
        arr = np.asarray(feats[0, : int(n_frames[0])])  # (T, C, M)
        d = feats_root / "emg" / split / "s1"
        d.mkdir(parents=True, exist_ok=True)
        np.save(d / f"{i}_0.npy", arr.astype(np.float32))
        raw_dir = tmp_path / "raw" / split / "s1"
        raw_dir.mkdir(parents=True, exist_ok=True)
        raw_path = raw_dir / f"{i}_0_emg.npy"
        np.save(raw_path, raw)  # original signal: enables data.train_from_raw
        rows.append(dict(
            utterance_id=f"{split}/s1/{i}_0", split=split, subset=subset,
            speaker="s1", stem=f"{i}_0", emg_path=str(raw_path),
            audio_path=None, transcript=text, sentence_index=i, book="",
            has_audio=True, metadata_json="{}",
        ))
    index_path = tmp_path / "index.parquet"
    save_index(pd.DataFrame(rows), index_path)
    vocab_path = tmp_path / "vocab.json"
    vocab.to_json(vocab_path)

    cfg = {
        "data": {
            "index": str(index_path),
            "features_root": str(feats_root),
            "train_splits": [split],
            "val_splits": [split],
            "train_subsets": ["train"],
            "val_subsets": ["val"],
            "vocab": str(vocab_path),
            "include_teacher": False,
        },
        "features": {"emg": dict(SEP_FEAT_CFG)},
        "model": {
            "encoder": {
                "input_dim": SEP_CHANNELS * SEP_FEAT_CFG["n_mels"],
                "d_model": 48,
                "num_layers": 2,
                "num_heads": 4,
                "ffn_dim": 96,
                "depthwise_conv_kernel_size": 7,
                "dropout": 0.05,
                "subsample_factor": 2,
            },
            "projection_dim": 8,
            "ctc_dropout": 0.05,
        },
        "loss": {"lambda_distill": 0.0, "lambda_ctc": 1.0},
        "optim": {
            "batch_size": 6,
            "grad_accum": 1,
            "lr": 3e-3,
            "weight_decay": 1e-3,
            "max_epochs": max_epochs,
            "clip_grad_norm": 5.0,
            "scheduler": {"name": "warmup_hold", "warmup_steps": 8},
        },
        "augmentation": {},
        "decoding": {"type": "greedy"},
        "logging": {"seed": 0, "run_name": "sep", "log_interval": 10},
    }
    return cfg, vocab, tmp_path, texts, (freqs, phases)


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
