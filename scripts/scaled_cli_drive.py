"""Drive the 166M `tpu_scaled_large` recipe through the PRODUCT CLIs.

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/scaled_cli_drive.py \
        --workdir /tmp/ssd_scaled [--epochs 2] [--utts 96]

VERDICT r4 next #2: every 166M/439M number so far came from
``scripts/profile_scale.py``; the trainer/checkpoint/eval chain had never run
at scale. This script builds a synthetic corpus at flagship shapes (raw EMG
≈7.6 s at 1 kHz → 768 feature frames; bf16 teacher states — the scaled
config's own ``train_from_raw`` recipe) and then runs, as subprocesses, ON
the ambient backend:

1. ``ssd_tpu.training.train`` with a single-chip derivative of
   ``configs/tpu_scaled_large.yaml`` (scan_layers + remat + bf16 compute,
   166M params), a few epochs, orbax save (async);
2. ``ssd_tpu.training.convert_layout`` scan → unrolled → scan round-trip,
   asserting the round-tripped stacked params are bit-identical;
3. ``ssd_tpu.training.average_checkpoints`` over {last, best};
4. ``ssd_tpu.evaluation.evaluate`` of the averaged checkpoint (beam 50).

Prints one JSON line: per-stage wall-clocks, params, checkpoint bytes, eval
metrics path. Reference bar: blog p.13 "larger models" future direction.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
import yaml

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def build_corpus(wd: Path, n_utts: int, val_frac: float = 0.2) -> None:
    import pandas as pd

    from ssd_tpu.data.index_dataset import save_index
    from ssd_tpu.data.vocab import default_vocab

    rng = np.random.default_rng(4)
    words = ["the", "cat", "sat", "on", "mat", "dog", "ran", "quick", "brown"]

    def transcript() -> str:
        s = ""
        while len(s) < 100:  # 97..127 chars → token bucket 128
            s += (" " if s else "") + words[rng.integers(len(words))]
        return s[:127]

    feats = wd / "results/features"
    raw_dir = wd / "raw/voiced_parallel_data/s1"
    teach_dir = feats / "teacher/voiced_parallel_data/s1"
    raw_dir.mkdir(parents=True, exist_ok=True)
    teach_dir.mkdir(parents=True, exist_ok=True)
    rows = []
    n_val = max(4, int(n_utts * val_frac))
    for i in range(n_utts):
        samples = int(rng.integers(7000, 7680))  # → 768-frame bucket at hop 10
        raw = rng.normal(size=(samples, 8)).astype(np.float32)
        np.save(raw_dir / f"{i}_0_emg.npy", raw)
        # teacher states at the post-subsample rate (frames/2, 768)
        frames = (samples - 320) // 10 + 1
        np.save(
            teach_dir / f"{i}_0.npy",
            rng.normal(size=(frames // 2, 768)).astype(np.float32),
        )
        rows.append(dict(
            utterance_id=f"voiced_parallel_data/s1/{i}_0",
            split="voiced_parallel_data",
            subset="train" if i < n_utts - n_val else "val",
            speaker="s1", stem=f"{i}_0",
            emg_path=str(raw_dir / f"{i}_0_emg.npy"),
            audio_path=None, transcript=transcript(), sentence_index=i,
            book="", has_audio=True, metadata_json="{}",
        ))
    save_index(pd.DataFrame(rows), wd / "results/index.parquet")
    default_vocab().to_json(wd / "vocab.json")


def write_config(wd: Path, epochs: int, batch_size: int,
                 tiny: bool = False) -> Path:
    cfg = yaml.safe_load((REPO / "configs/tpu_scaled_large.yaml").read_text())
    cfg.pop("parallel", None)  # single-chip drive (the attached TPU)
    cfg["data"].update({
        "index": str(wd / "results/index.parquet"),
        "features_root": str(wd / "results/features"),
        "vocab": str(wd / "vocab.json"),
        "root": str(wd / "raw"),
    })
    cfg["optim"].update({
        "batch_size": batch_size,
        "max_epochs": epochs,
        "num_workers": 2,
        "scheduler": {"name": "warmup_hold", "warmup_steps": 10},
    })
    cfg["optim"].pop("early_stopping", None)
    cfg["logging"]["log_interval"] = 1
    if tiny:
        # CPU sanity variant: same chain (scan_layers + remat + convert +
        # average + eval), toy dims — validates the CLI plumbing only
        cfg["model"]["encoder"].update(
            d_model=32, num_layers=2, num_heads=4, ffn_dim=64,
            compute_dtype="float32",
        )
        cfg["model"]["projection_dim"] = 768
    path = wd / "scaled_single_chip.yaml"
    path.write_text(yaml.safe_dump(cfg, sort_keys=False))
    return path


def run(cmd: list, env: dict) -> float:
    t0 = time.time()
    subprocess.run([str(c) for c in cmd], check=True, env=env)
    return time.time() - t0


def tree_bytes(path: Path) -> int:
    return sum(f.stat().st_size for f in path.rglob("*") if f.is_file())


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", type=Path, required=True)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--utts", type=int, default=96)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--tiny", action="store_true",
                   help="toy model dims for a CPU plumbing check")
    args = p.parse_args()

    wd = args.workdir
    wd.mkdir(parents=True, exist_ok=True)
    build_corpus(wd, args.utts)
    cfg_path = write_config(wd, args.epochs, args.batch_size, tiny=args.tiny)

    env = dict(os.environ)
    env["SSD_COMPILE_CACHE"] = str(wd / "compile_cache")
    py = sys.executable
    run_dir = wd / "results/checkpoints/scaled"
    timings = {}

    timings["train_s"] = run(
        [py, "-m", "ssd_tpu.training.train",
         "--config", cfg_path, "--run-dir", run_dir], env)

    # scan → unrolled → scan round-trip at 166M
    timings["convert_to_unrolled_s"] = run(
        [py, "-m", "ssd_tpu.training.convert_layout",
         "--checkpoint", run_dir / "best", "--to", "unrolled",
         "--output", wd / "results/checkpoints/scaled_unrolled"], env)
    timings["convert_back_to_scan_s"] = run(
        [py, "-m", "ssd_tpu.training.convert_layout",
         "--checkpoint", wd / "results/checkpoints/scaled_unrolled/last",
         "--to", "scan",
         "--output", wd / "results/checkpoints/scaled_rt"], env)

    # bit-exactness of the round-trip. Restore as RAW NUMPY (RestoreArgs
    # with restore_type=np.ndarray): the default restore follows the saved
    # sharding metadata onto the default device — on the remote axon backend
    # that is 2×650 MB over the tunnel and this parent process then parks in
    # the axon event loop (observed; utils/config "Known behaviors").
    import jax

    from ssd_tpu.training.checkpoint import load_checkpoint_np

    a = load_checkpoint_np(run_dir / "best")
    b = load_checkpoint_np(wd / "results/checkpoints/scaled_rt/last")
    la = jax.tree_util.tree_leaves(a["params"])
    lb = jax.tree_util.tree_leaves(b["params"])
    assert len(la) == len(lb)
    n_bad = sum(
        not np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(la, lb)
    )
    assert n_bad == 0, f"round-trip params differ in {n_bad}/{len(la)} leaves"
    n_params = sum(int(np.prod(np.shape(x))) for x in la)

    timings["average_s"] = run(
        [py, "-m", "ssd_tpu.training.average_checkpoints",
         "--checkpoints", run_dir / "last", run_dir / "best",
         "--output", wd / "results/checkpoints/scaled_avg"], env)

    timings["eval_s"] = run(
        [py, "-m", "ssd_tpu.evaluation.evaluate",
         "--checkpoint", wd / "results/checkpoints/scaled_avg/last",
         "--run-name", "scaled_avg_eval", "--batch-size", "8",
         "--decoder", "beam", "--beam-width", "50",
         "--output", wd / "results/eval/scaled_avg_eval"], env)

    metrics = json.loads(
        (wd / "results/eval/scaled_avg_eval/metrics.json").read_text())
    print(json.dumps({
        "params": n_params,
        "timings_s": {k: round(v, 1) for k, v in timings.items()},
        "ckpt_bytes_best": tree_bytes(run_dir / "best"),
        "ckpt_bytes_unrolled": tree_bytes(
            wd / "results/checkpoints/scaled_unrolled/last"),
        "roundtrip_bit_exact": True,
        "eval_cer": metrics.get("cer"),
        "eval_decode_p50_s": metrics.get("decode_latency_sec", {}).get("p50"),
        "epochs": args.epochs,
        "utts": args.utts,
        "batch_size": args.batch_size,
    }), flush=True)


if __name__ == "__main__":
    main()
