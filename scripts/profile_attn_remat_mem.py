"""Compiled-memory A/B for EncoderConfig.attn_remat at flagship shapes.

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_attn_remat_mem.py

attn_remat lost on *time* at flagship shapes (docs/PERF.md "Batch sweep"):
this script records what it buys on *memory* — the compiler's temp-buffer
allocation for the train step with and without the (B, H, T, T) attention
probabilities staged as residuals.
"""

from __future__ import annotations

import functools
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

T, F, V, S, TD, B = 768, 640, 48, 128, 768, 32


def mem_one(attn_remat: bool) -> dict:
    import jax
    import jax.numpy as jnp

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
        # batch is a jit ARGUMENT (the real step's calling convention) so
        # memory_analysis() splits it into argument bytes, not baked-in
        # constants — absolute temp/argument numbers are quotable standalone
        step = functools.partial(jax.jit, donate_argnums=(0,))(
            lambda st, b: train_step(st, b, lambdas, drop_rng)
        )
        compiled = step.lower(state, batch).compile()
        ma = compiled.memory_analysis()
        out = {"attn_remat": attn_remat}
        for k in ("temp_size_in_bytes", "argument_size_in_bytes",
                  "output_size_in_bytes", "generated_code_size_in_bytes"):
            v = getattr(ma, k, None)
            if v is not None:
                out[k] = int(v)
        return out


def main() -> None:
    for ar in (False, True):
        print(json.dumps(mem_one(ar)), flush=True)


if __name__ == "__main__":
    main()
