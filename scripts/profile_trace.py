"""Trace-backed roofline for the flagship train step (VERDICT r3 #4).

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_trace.py \
        [--steps 6] [--logdir /tmp/ssd_trace]

Captures a ``jax.profiler`` trace around K already-compiled train steps on
the attached chip, then parses the chrome trace the profiler writes
(``*.trace.json.gz`` — the axon runtime DOES export a full TPU device
plane: per-HLO durations, ``bytes_accessed``, ``model_flops``,
``hlo_category``, source attribution) and prints device ms/step, achieved
TFLOP/s, the per-category time split, and the top ops. Findings for the
flagship step: docs/PERF.md "Trace-backed roofline".
"""

from __future__ import annotations

import argparse
import json
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def build_step():
    """Flagship train step + sharded batch, mirroring bench.bench_train."""
    import jax
    import jax.numpy as jnp

    import bench as bench_mod
    from ssd_tpu.models.conformer import EncoderConfig
    from ssd_tpu.models.ssd_model import SSDModel
    from ssd_tpu.parallel.mesh import make_mesh, shard_batch
    from ssd_tpu.training.schedules import build_optimizer
    from ssd_tpu.training.train import init_state, make_train_step

    enc_cfg = EncoderConfig(
        input_dim=bench_mod.INPUT_DIM, d_model=288, num_layers=6, num_heads=6,
        ffn_dim=1152, depthwise_conv_kernel_size=15, dropout=0.12,
        subsample_factor=2, compute_dtype="bfloat16",
    )
    model = SSDModel(
        encoder_cfg=enc_cfg, projection_dim=bench_mod.TEACHER_DIM,
        vocab_size=bench_mod.VOCAB, ctc_dropout=0.12,
    )
    cfg = {"optim": {"lr": 3e-4, "weight_decay": 1e-2, "clip_grad_norm": 5.0,
                     "grad_accum": 1,
                     "scheduler": {"name": "warmup_hold", "warmup_steps": 800}}}
    tx, _ = build_optimizer(cfg, total_updates=1000)
    state = init_state(model, tx, bench_mod.INPUT_DIM, jax.random.PRNGKey(0))
    train_step = make_train_step(model, tx, blank_id=1, normalize_distill=False)
    rng = np.random.default_rng(0)
    B, T, F = bench_mod.BATCH, bench_mod.T_FRAMES, bench_mod.INPUT_DIM
    batch_np = {
        "emg": rng.normal(size=(B, T, F)).astype(np.float32),
        "emg_lengths": rng.integers(T // 2, T + 1, size=B).astype(np.int32),
        "tokens": rng.integers(2, bench_mod.VOCAB, size=(B, bench_mod.TOKENS)).astype(np.int32),
        "token_lengths": rng.integers(bench_mod.TOKENS // 2, bench_mod.TOKENS + 1, size=B).astype(np.int32),
        "teacher": rng.normal(size=(B, T // 2, bench_mod.TEACHER_DIM)).astype(np.float32),
        "teacher_lengths": np.full((B,), T // 2, np.int32),
        "weight": np.ones((B,), np.float32),
    }
    mesh = make_mesh()
    lambdas = jnp.asarray([0.65, 0.35], jnp.float32)
    drop_rng = jax.random.key(1, impl="rbg")
    with mesh:
        batch = shard_batch(mesh, batch_np)
    return mesh, train_step, state, batch, lambdas, drop_rng


def summarize_trace(logdir: Path, n_steps: int):
    """Parse the newest chrome trace (*.trace.json.gz — the xplane proto is
    not importable in this image); aggregate the TPU device plane."""
    import gzip
    import re

    files = sorted(logdir.rglob("*.trace.json.gz"))
    if not files:
        return None, "no *.trace.json.gz produced"
    with gzip.open(files[-1]) as f:
        evs = json.load(f)["traceEvents"]

    # pid of the TPU device plane, tid of its "XLA Ops" line
    tpu_pid = next((e["pid"] for e in evs
                    if e.get("ph") == "M" and e.get("name") == "process_name"
                    and "TPU" in e["args"].get("name", "")), None)
    if tpu_pid is None:
        return None, "no TPU device plane in trace (host-only capture)"
    ops_tid = next((e["tid"] for e in evs
                    if e.get("ph") == "M" and e.get("name") == "thread_name"
                    and e["pid"] == tpu_pid and e["args"]["name"] == "XLA Ops"), None)

    per_op = defaultdict(lambda: {"time_us": 0.0, "count": 0, "bytes": 0,
                                  "flops": 0, "src": ""})
    cat = defaultdict(lambda: [0.0, 0, 0])  # us, bytes, flops
    total_us = total_bytes = total_flops = 0
    for e in evs:
        if e.get("pid") != tpu_pid or e.get("tid") != ops_tid or e.get("ph") != "X":
            continue
        a = e.get("args") or {}
        b = int(a.get("bytes_accessed", 0))
        fl = int(a.get("model_flops", 0) or 0)
        key = re.sub(r"[._]\d+$", "", e["name"])
        rec = per_op[key]
        rec["time_us"] += e["dur"]
        rec["count"] += 1
        rec["bytes"] += b
        rec["flops"] += fl
        rec["src"] = a.get("tf_op", rec["src"])
        c = a.get("hlo_category", "?")
        cat[c][0] += e["dur"]; cat[c][1] += b; cat[c][2] += fl
        total_us += e["dur"]; total_bytes += b; total_flops += fl

    top = sorted(per_op.items(), key=lambda kv: -kv[1]["time_us"])[:15]
    return {
        "ms_per_step": round(total_us / n_steps / 1e3, 3),
        "model_tflops_per_step": round(total_flops / n_steps / 1e12, 3),
        "achieved_tflops": round(total_flops / (total_us * 1e-6) / 1e12, 1),
        "cost_model_bytes_gb_per_step": round(total_bytes / n_steps / 1e9, 2),
        "categories_ms_per_step": {
            k: round(v[0] / n_steps / 1e3, 3)
            for k, v in sorted(cat.items(), key=lambda kv: -kv[1][0])
        },
        "top_ops": [
            {"op": k, "ms_per_step": round(v["time_us"] / n_steps / 1e3, 4),
             "count_per_step": v["count"] // n_steps,
             "gf_per_step": round(v["flops"] / n_steps / 1e9, 2),
             "src": v["src"][:80]}
            for k, v in top
        ],
    }, None


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=6)
    p.add_argument("--logdir", type=Path, default=Path("/tmp/ssd_trace"))
    args = p.parse_args()

    import jax

    mesh, train_step, state, batch, lambdas, drop_rng = build_step()
    with mesh:
        # warm: compile outside the trace
        for _ in range(2):
            state, losses = train_step(state, batch, lambdas, drop_rng)
        float(losses["total"])

        args.logdir.mkdir(parents=True, exist_ok=True)
        with jax.profiler.trace(str(args.logdir)):
            for _ in range(args.steps):
                state, losses = train_step(state, batch, lambdas, drop_rng)
            float(losses["total"])  # fence inside the trace window

    summary, err = summarize_trace(args.logdir, args.steps)
    if err:
        print(json.dumps({"error": err}))
        return
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
