"""Two-stage orchestrator drive on the NON-TRIVIAL gates corpus.

    # build the workdir (any backend; featurization runs locally):
    PYTHONPATH=/root/.axon_site:/root/repo python \
        scripts/orchestrate_gates_corpus.py --workdir /tmp/ssd_orch [--setup-only]

VERDICT r4 next #1: the reference's highest-level entry point
(``src/experiments/orchestrate.py:417``) had only ever run on the virtual CPU
mesh. This script builds a workdir around the accuracy-gates corpus — the
separable-sine corpus at noise 1.5/1.8 where CER lands meaningfully BETWEEN
0 and 1 (tests/helpers.make_separable_setup, same seeds as
tests/test_accuracy_gates.py) — plus scaled-down probe grids (2 per stage)
and an in-domain char LM, then executes the REAL subprocess pipeline:

    stage1 voiced probes → pick_best → stage2 voiced →
    best voiced ckpt seeds silent probes → stage2 silent

With the ambient axon env every train/eval child takes the TPU in turn
(single holder); ``SSD_COMPILE_CACHE`` is exported so children restore
executables instead of recompiling. Without --setup-only the orchestrate CLI
runs to completion and the script prints a one-line JSON summary (per-stage
record counts, best CERs, wall-clock).

Resume demo: run once with --kill-after-records N to SIGTERM the sweep once
summary.json holds >= N records, then rerun with --resume-only.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
import yaml

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def build_workdir(wd: Path) -> None:
    from helpers import make_separable_setup

    from ssd_tpu.decoding.lm import train_ngram

    wd.mkdir(parents=True, exist_ok=True)

    # --- corpus: gates seeds/noise; voiced + silent share one features root.
    # make_separable_setup writes wd/index.parquet per call (the second call
    # overwrites the first), so read each split's rows as it lands and merge.
    import pandas as pd

    from ssd_tpu.data.index_dataset import save_index

    v_cfg, vocab, _, v_texts, _ = make_separable_setup(
        wd, n_train=28, n_val=8, noise=1.5, seed=2,
        words_per_utt=(3, 6), max_epochs=14,
    )
    df_v = pd.read_parquet(wd / "index.parquet")
    s_cfg, _, _, _, _ = make_separable_setup(
        wd, n_train=24, n_val=8, noise=1.8, seed=5,
        words_per_utt=(3, 6), max_epochs=14, split="silent_parallel_data",
    )
    df_s = pd.read_parquet(wd / "index.parquet")
    merged = pd.concat(
        [df_v, df_s[df_s.split == "silent_parallel_data"]], ignore_index=True
    ).drop_duplicates(subset="utterance_id")
    save_index(merged, wd / "results/index.parquet")

    # --- base configs (workdir-relative paths so orchestrate children work)
    def relativize(cfg: dict, splits: list) -> dict:
        cfg = json.loads(json.dumps(cfg))  # deep copy
        cfg["data"]["index"] = "results/index.parquet"
        cfg["data"]["features_root"] = "features"
        cfg["data"]["vocab"] = "vocab.json"
        cfg["data"]["train_splits"] = splits
        cfg["data"]["val_splits"] = splits
        return cfg

    (wd / "configs/experiments").mkdir(parents=True, exist_ok=True)
    (wd / "configs/tpu_fast_plus.yaml").write_text(
        yaml.safe_dump(relativize(v_cfg, ["voiced_parallel_data"]))
    )
    (wd / "configs/tpu_silent_finetune_plus.yaml").write_text(
        yaml.safe_dump(relativize(s_cfg, ["silent_parallel_data"]))
    )

    # --- scaled probe grids: 2 probes per stage (VERDICT: "2–3 probes"),
    # graph-compatible knob variations so the compile cache carries across
    (wd / "configs/experiments/voiced_probes.yaml").write_text(yaml.safe_dump({
        "base_overrides": {"optim": {"max_epochs": 8}},
        "variants": [
            {"name": "probe_v_base", "overrides": {}, "tags": ["baseline"],
             "description": "gates-corpus baseline probe"},
            {"name": "probe_v_lr_hi", "overrides": {"optim": {"lr": 5e-3}},
             "tags": ["lr"], "description": "higher LR probe"},
        ],
    }))
    (wd / "configs/experiments/silent_probes.yaml").write_text(yaml.safe_dump({
        "base_overrides": {"optim": {"max_epochs": 8}},
        "variants": [
            {"name": "probe_s_base", "overrides": {}, "tags": ["baseline"],
             "description": "silent warm-start probe"},
            {"name": "probe_s_lr_lo", "overrides": {"optim": {"lr": 1e-3}},
             "tags": ["lr"], "description": "gentler fine-tune probe"},
        ],
    }))
    (wd / "configs/experiments/decoder_grids.yaml").write_text(yaml.safe_dump({
        "probe_voiced": [
            {"name": "greedy", "method": "greedy"},
        ],
        "probe_silent": [
            {"name": "greedy", "method": "greedy"},
        ],
        "full_voiced": [
            {"name": "greedy", "method": "greedy"},
            {"name": "beam16", "method": "beam", "beam_width": 16,
             "beam_prune_logp": -10.0},
            {"name": "beam16_lm", "method": "beam", "beam_width": 16,
             "alpha": 0.5, "beta": 0.05, "beam_prune_logp": -10.0,
             "use_lm": True, "lm_path": "results/lm/char_5gram.arpa"},
        ],
        "full_silent": [
            {"name": "greedy", "method": "greedy"},
            {"name": "beam16", "method": "beam", "beam_width": 16,
             "beam_prune_logp": -10.0},
        ],
    }))

    # --- in-domain char LM (reference build_char_lm contract: voiced train)
    lm_dir = wd / "results/lm"
    lm_dir.mkdir(parents=True, exist_ok=True)
    train_ngram(v_texts[:28], order=5).to_arpa(lm_dir / "char_5gram.arpa")
    print(f"workdir ready: {wd}", flush=True)


def run_orchestrate(wd: Path, kill_after_records: int | None,
                    resume: bool) -> dict:
    env = dict(os.environ)
    env["SSD_COMPILE_CACHE"] = str(wd / "compile_cache")
    cmd = [
        sys.executable, "-m", "ssd_tpu.experiments.orchestrate",
        "--probe-batches", "5", "--probe-batches-silent", "4",
        "--eval-batch-size", "4",
    ]
    if resume:
        cmd.append("--resume")
    t0 = time.time()
    # own session/process group: the resume-demo SIGTERM must reach the
    # IN-FLIGHT train/eval child too — the trainer's SIGTERM handler saves a
    # resumable checkpoint and releases the TPU (single-holder rule), which
    # is exactly the preemption path the resume rerun then exercises
    proc = subprocess.Popen(cmd, cwd=wd, env=env, start_new_session=True)
    Path("/tmp/orch.pid").write_text(str(proc.pid))
    summary = wd / "results/experiments/summary.json"
    killed = False
    while proc.poll() is None:
        time.sleep(5)
        if kill_after_records and summary.exists():
            try:
                n = len(json.loads(summary.read_text()))
            except Exception:
                n = 0
            if n >= kill_after_records:
                os.killpg(proc.pid, signal.SIGTERM)
                killed = True
                break
    proc.wait(timeout=600)
    wall = time.time() - t0
    # the SIGTERM above can land mid-write of summary.json — treat a torn
    # file like a missing one (same guard as the polling read above)
    try:
        records = json.loads(summary.read_text()) if summary.exists() else []
    except Exception:
        records = []
    by_cell: dict = {}
    for r in records:
        key = f"{r['stage']}/{r['dataset']}"
        by_cell.setdefault(key, []).append(r["cer"])
    return {
        "returncode": proc.returncode,
        "killed_for_resume_demo": killed,
        "wall_s": round(wall, 1),
        "records": len(records),
        "cells": {k: {"n": len(v), "best_cer": round(min(v), 4)}
                  for k, v in sorted(by_cell.items())},
    }


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", type=Path, required=True)
    p.add_argument("--setup-only", action="store_true")
    p.add_argument("--kill-after-records", type=int, default=None,
                   help="SIGTERM the sweep once summary.json has N records "
                        "(resume demo), then exit.")
    p.add_argument("--resume-only", action="store_true",
                   help="Skip setup; rerun orchestrate with --resume.")
    args = p.parse_args()

    if not args.resume_only:
        build_workdir(args.workdir)
    if args.setup_only:
        return
    out = run_orchestrate(args.workdir, args.kill_after_records,
                          resume=args.resume_only)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
