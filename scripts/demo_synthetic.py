"""Self-contained demo: the full pipeline on a synthetic corpus.

    python scripts/demo_synthetic.py [--workdir /tmp/ssd_demo] [--utterances 24]

Creates a synthetic EMG corpus whose signals are rendered deterministically
from their transcripts (band-limited per-character patterns), then runs the
real CLI stages end-to-end:

    index_dataset → preprocessing(emg) → train → evaluate(beam)

and prints the resulting metrics. Because the synthetic "EMG" actually
encodes the text, a short training run reaches low CER — a quick whole-stack
health check on any backend (CPU or TPU).
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np
import yaml

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from ssd_tpu.data.vocab import default_vocab  # noqa: E402

WORDS = ["alpha", "bravo", "cat", "dog", "echo", "fox", "go", "hi"]


def make_corpus(root: Path, n: int, seed: int = 0) -> None:
    rng = np.random.default_rng(seed)
    vocab = default_vocab()
    # each char id gets a characteristic 8-channel oscillation
    freqs = rng.uniform(30, 450, size=(vocab.size, 8))
    phases = rng.uniform(0, 2 * np.pi, size=(vocab.size, 8))
    d = root / "voiced_parallel_data" / "spk"
    d.mkdir(parents=True, exist_ok=True)
    for i in range(n):
        text = " ".join(rng.choice(WORDS, size=rng.integers(2, 5)))
        ids = vocab.encode(text)
        per_char = 160  # samples per char at 1 kHz
        sig = np.zeros((len(ids) * per_char, 8), np.float32)
        t = np.arange(per_char) / 1000.0
        for k, cid in enumerate(ids):
            seg = np.sin(2 * np.pi * freqs[cid][None, :] * t[:, None] + phases[cid][None, :])
            sig[k * per_char : (k + 1) * per_char] = seg
        sig += rng.normal(size=sig.shape).astype(np.float32) * 0.05
        np.save(d / f"{i}_0_emg.npy", sig)
        (d / f"{i}_0_info.json").write_text(
            json.dumps({"text": text, "sentence_index": i, "book": "demo"})
        )


def run(cmd, cwd):
    print("+", " ".join(str(c) for c in cmd))
    import os

    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    subprocess.run([sys.executable, "-m", *cmd], cwd=cwd, check=True, env=env)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", type=Path)
    p.add_argument("--utterances", type=int, default=24)
    p.add_argument("--epochs", type=int, default=12)
    args = p.parse_args()

    wd = args.workdir or Path(tempfile.mkdtemp(prefix="ssd_demo_"))
    wd.mkdir(parents=True, exist_ok=True)
    print(f"workdir: {wd}")

    make_corpus(wd / "data" / "emg_data", args.utterances)
    (wd / "configs").mkdir(exist_ok=True)
    default_vocab().to_json(wd / "configs" / "vocab.json")

    run(["ssd_tpu.data.index_dataset", "--root", "data/emg_data",
         "--out", "results/index.parquet", "--splits", "voiced_parallel_data",
         "--stats", "--overwrite"], wd)
    run(["ssd_tpu.data.preprocessing", "--mode", "emg",
         "--index", "results/index.parquet", "--root", "data/emg_data",
         "--out", "results/features/emg",
         "--emg-n-fft", "128", "--emg-hop-length", "32"], wd)

    cfg = {
        "data": {
            "index": "results/index.parquet",
            "features_root": "results/features",
            "train_splits": ["voiced_parallel_data"],
            "val_splits": ["voiced_parallel_data"],
            "train_subsets": None,
            "val_subsets": None,
            "vocab": "configs/vocab.json",
            "include_teacher": False,
            "teacher_strict": False,
        },
        "features": {
            "emg": {"sample_rate": 1000, "n_fft": 128, "hop_length": 32, "n_mels": 80},
            "teacher": {"dim": 768},
        },
        "model": {
            "encoder": {"d_model": 64, "num_layers": 2, "num_heads": 4,
                         "ffn_dim": 128, "depthwise_conv_kernel_size": 7,
                         "dropout": 0.05, "subsample_factor": 2},
            "projection_dim": 32,
            "ctc_dropout": 0.05,
        },
        "loss": {"lambda_distill": 0.0, "lambda_ctc": 1.0},
        "optim": {"batch_size": 8, "grad_accum": 1, "lr": 2e-3,
                  "weight_decay": 1e-3, "max_epochs": args.epochs,
                  "clip_grad_norm": 5.0,
                  "scheduler": {"name": "warmup_hold", "warmup_steps": 20}},
        "logging": {"seed": 0, "run_name": "demo", "log_interval": 5},
    }
    (wd / "configs" / "demo.yaml").write_text(yaml.safe_dump(cfg))

    run(["ssd_tpu.training.train", "--config", "configs/demo.yaml",
         "--run-dir", "results/checkpoints/demo"], wd)
    run(["ssd_tpu.evaluation.evaluate", "--checkpoint", "results/checkpoints/demo/best",
         "--decoder", "beam", "--beam-width", "16", "--batch-size", "8",
         "--splits", "voiced_parallel_data", "--subsets", "train", "val", "test",
         "--output", "results/eval/demo", "--run-name", "demo"], wd)

    metrics = json.loads((wd / "results/eval/demo/metrics.json").read_text())
    print(json.dumps({
        "cer": metrics["cer"],
        "wer": metrics["wer"],
        "p50_decode_ms": metrics["decode_latency_sec"]["p50"] * 1e3,
        "samples": metrics["data"]["num_samples"],
    }, indent=2))


if __name__ == "__main__":
    main()
