"""Trace-backed roofline for the flagship train step (VERDICT r3 #4).

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_trace.py \
        [--steps 6] [--logdir /tmp/ssd_trace]

Captures a ``jax.profiler`` trace around K already-compiled train steps on
the attached chip, then parses the xplane protobuf (tensorboard_plugin_
profile ships the proto) and prints, per device plane: total device time,
the top-10 ops by self time, and any bytes-accessed stats the backend
recorded. If the remote (axon) runtime exposes no device plane, that fact
is the documented outcome and the host plane summary is printed instead.
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


def summarize_xplane(logdir: Path):
    """Parse the newest .xplane.pb under logdir; per-plane op summary."""
    from tensorboard_plugin_profile.protobuf import xplane_pb2

    files = sorted(logdir.rglob("*.xplane.pb"))
    if not files:
        return None, "no .xplane.pb produced"
    xspace = xplane_pb2.XSpace()
    xspace.ParseFromString(files[-1].read_bytes())
    out = {}
    for plane in xspace.planes:
        stat_names = {i: m.name for i, m in plane.stat_metadata.items()}
        ev_names = {i: m.name for i, m in plane.event_metadata.items()}
        per_op = defaultdict(lambda: {"time_us": 0.0, "count": 0, "bytes": 0})
        total_us = 0.0
        for line in plane.lines:
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, str(ev.metadata_id))
                dur_us = ev.duration_ps / 1e6
                rec = per_op[name]
                rec["time_us"] += dur_us
                rec["count"] += 1
                total_us += dur_us
                for st in ev.stats:
                    sname = stat_names.get(st.metadata_id, "")
                    if "bytes" in sname.lower():
                        rec["bytes"] += st.int64_value or st.uint64_value
        top = sorted(per_op.items(), key=lambda kv: -kv[1]["time_us"])[:15]
        out[plane.name] = {
            "lines": len(plane.lines),
            "total_event_us": round(total_us, 1),
            "top_ops": [
                {"op": k, "time_us": round(v["time_us"], 1), "count": v["count"],
                 **({"bytes": v["bytes"]} if v["bytes"] else {})}
                for k, v in top
            ],
        }
    return out, None


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

    summary, err = summarize_xplane(args.logdir)
    if err:
        print(json.dumps({"error": err}))
        return
    print(json.dumps({"planes": list(summary)}, indent=0))
    for plane, data in summary.items():
        print(f"\n=== {plane} (lines={data['lines']}, "
              f"total {data['total_event_us'] / 1e3:.1f} ms) ===")
        for op in data["top_ops"]:
            extra = f"  bytes={op['bytes']:,}" if "bytes" in op else ""
            print(f"  {op['time_us'] / 1e3:9.3f} ms  ×{op['count']:<4d} {op['op'][:90]}{extra}")


if __name__ == "__main__":
    main()
