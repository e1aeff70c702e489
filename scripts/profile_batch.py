"""Train-step batch sweep: does a bigger batch buy MFU? (round-4 trace work)

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_batch.py \
        [--attn-remat] [B ...]

``--attn-remat`` additionally A/Bs the round-4 attention-only remat knob
(EncoderConfig.attn_remat): the trace shows 2.6 ms/step of zero-FLOP
copies staging the per-block (B, H, T, T) score tensors for backward;
attn_remat recomputes them from the 8.5 MB block input instead.

The round-4 device trace (docs/PERF.md "Trace") shows the MXU fusions
running at ~58% internal efficiency at B=32 — weight/activation streaming
bounded, which larger batches amortize. This sweeps the FULL production
train step (donated state, dropout, CTC+distill, AdamW) over batch sizes
with the same on-device fori_loop chain as the bench headline and reports
ms/step, utt/s/chip, and MFU.
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

T, F, V, S, TD = 768, 640, 48, 128, 768
PEAK_BF16_TFLOPS = 197.0  # v5e


def run_one(B: int, attn_remat: bool = False) -> dict:
    import jax
    import jax.numpy as jnp

    import bench as bench_mod
    from ssd_tpu.models.conformer import EncoderConfig
    from ssd_tpu.models.ssd_model import SSDModel
    from ssd_tpu.parallel.mesh import make_mesh, shard_batch
    from ssd_tpu.training.schedules import build_optimizer
    from ssd_tpu.training.train import init_state, make_train_step

    enc_cfg = EncoderConfig(
        input_dim=F, d_model=288, num_layers=6, num_heads=6, ffn_dim=1152,
        depthwise_conv_kernel_size=15, dropout=0.12, subsample_factor=2,
        compute_dtype="bfloat16", attn_remat=attn_remat,
    )
    model = SSDModel(encoder_cfg=enc_cfg, projection_dim=TD, vocab_size=V,
                     ctc_dropout=0.12)
    cfg = {"optim": {"lr": 3e-4, "weight_decay": 1e-2, "clip_grad_norm": 5.0,
                     "grad_accum": 1,
                     "scheduler": {"name": "warmup_hold", "warmup_steps": 800}}}
    tx, _ = build_optimizer(cfg, total_updates=1000)
    state = init_state(model, tx, F, jax.random.PRNGKey(0))
    train_step = make_train_step(model, tx, blank_id=1, normalize_distill=False)

    rng = np.random.default_rng(0)
    batch_np = {
        "emg": rng.normal(size=(B, T, F)).astype(np.float32),
        "emg_lengths": rng.integers(T // 2, T + 1, size=B).astype(np.int32),
        "tokens": rng.integers(2, V, size=(B, S)).astype(np.int32),
        "token_lengths": rng.integers(S // 2, S + 1, size=B).astype(np.int32),
        "teacher": rng.normal(size=(B, T // 2, TD)).astype(np.float32),
        "teacher_lengths": np.full((B,), T // 2, np.int32),
        "weight": np.ones((B,), np.float32),
    }
    mesh = make_mesh()
    lambdas = jnp.asarray([0.65, 0.35], jnp.float32)
    drop_rng = jax.random.key(1, impl="rbg")

    with mesh:
        batch = shard_batch(mesh, batch_np)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run_k(st, k):
            def body(_, carry):
                st, _ = carry
                st, losses = train_step(st, batch, lambdas, drop_rng)
                return st, losses["total"]

            return jax.lax.fori_loop(0, k, body, (st, jnp.float32(0)))

        t0 = time.time()
        state, total = run_k(state, jnp.int32(2))
        float(total)
        compile_s = time.time() - t0

        def timed(st, k):
            t0 = time.perf_counter()
            st, total = run_k(st, jnp.int32(k))
            float(total)
            return time.perf_counter() - t0, st

        t_lo, state = timed(state, 10)
        t_hi, state = timed(state, 40)
        sec = (t_hi - t_lo) / 30

    # analytic flops at B=32 scale linearly in B (bench._train_step_flops
    # is defined for the bench shapes)
    flops = bench_mod._train_step_flops() * (B / bench_mod.BATCH)
    return {
        "batch": B,
        "attn_remat": attn_remat,
        "ms_per_step": round(sec * 1e3, 2),
        "utt_per_sec": round(B / sec, 1),
        "mfu": round(flops / sec / 1e12 / PEAK_BF16_TFLOPS, 3),
        "compile_s": round(compile_s, 0),
    }


def main() -> None:
    argv = sys.argv[1:]
    attn_remat = "--attn-remat" in argv
    unknown = [a for a in argv if a.startswith("--") and a != "--attn-remat"]
    if unknown:  # a typo'd flag must not silently run the baseline sweep
        raise SystemExit(f"unknown flag(s) {unknown}; supported: --attn-remat")
    sizes = [int(a) for a in argv if not a.startswith("--")] or [32, 64, 128]
    out = []
    for B in sizes:
        r = run_one(B, attn_remat=attn_remat)
        out.append(r)
        print(json.dumps(r), flush=True)
    print(json.dumps({"sweep": out}))


if __name__ == "__main__":
    main()
