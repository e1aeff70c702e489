"""Decompose the full train step cost: encoder, CTC loss, distill, optimizer.

python scripts/profile_step.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ssd_tpu.models.conformer import EncoderConfig
from ssd_tpu.models.ssd_model import SSDModel
from ssd_tpu.ops.ctc_loss import ctc_loss
from ssd_tpu.models.losses import distillation_mse
from ssd_tpu.training.schedules import build_optimizer
from ssd_tpu.training.train import init_state, make_train_step

B, T, F, V, S, TD = 32, 768, 640, 48, 128, 768


def slope(run_n, n_small=5, n_large=25):
    run_n(2)
    t0 = time.perf_counter()
    run_n(n_small)
    t_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    run_n(n_large)
    t_l = time.perf_counter() - t0
    return max((t_l - t_s) / (n_large - n_small), 1e-9)


def main():
    enc_cfg = EncoderConfig(
        input_dim=F, d_model=288, num_layers=6, num_heads=6, ffn_dim=1152,
        depthwise_conv_kernel_size=15, dropout=0.12, subsample_factor=2,
        compute_dtype="bfloat16",
    )
    model = SSDModel(encoder_cfg=enc_cfg, projection_dim=TD, vocab_size=V, ctc_dropout=0.12)
    cfg = {"optim": {"lr": 3e-4, "weight_decay": 1e-2, "clip_grad_norm": 5.0,
                     "grad_accum": 1, "scheduler": {"name": "warmup_hold", "warmup_steps": 800}}}
    tx, _ = build_optimizer(cfg, total_updates=1000)
    state = init_state(model, tx, F, jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    batch = {
        "emg": jnp.asarray(rng.normal(size=(B, T, F)).astype(np.float32)),
        "emg_lengths": jnp.asarray(rng.integers(T // 2, T + 1, size=B).astype(np.int32)),
        "tokens": jnp.asarray(rng.integers(2, V, size=(B, S)).astype(np.int32)),
        "token_lengths": jnp.asarray(rng.integers(S // 2, S + 1, size=B).astype(np.int32)),
        "teacher": jnp.asarray(rng.normal(size=(B, T // 2, TD)).astype(np.float32)),
        "teacher_lengths": jnp.asarray(np.full((B,), T // 2, np.int32)),
        "weight": jnp.asarray(np.ones((B,), np.float32)),
    }
    lambdas = jnp.asarray([0.65, 0.35], jnp.float32)
    drop_rng = jax.random.key(1, impl="rbg")

    # 1) full train step
    train_step = make_train_step(model, tx, blank_id=1, normalize_distill=False)

    def run_full(n):
        nonlocal state
        losses = None
        for _ in range(n):
            state, losses = train_step(state, batch, lambdas, drop_rng)
        float(losses["total"])

    t_full = slope(run_full)
    print(f"full train step          {t_full*1e3:7.2f} ms", flush=True)

    params0 = state.params
    bs0 = state.batch_stats

    # 2) encoder-only fwd+bwd (no ctc, no distill)
    def make_loss(use_ctc, use_distill):
        def loss_fn(p):
            out, upd = model.apply(
                {"params": p, "batch_stats": bs0}, batch["emg"], batch["emg_lengths"],
                train=True, rngs={"dropout": drop_rng}, mutable=["batch_stats"],
            )
            log_probs, out_lengths, student = out
            total = jnp.float32(0)
            if use_ctc:
                per = ctc_loss(log_probs, out_lengths, batch["tokens"], batch["token_lengths"], 1)
                total += jnp.mean(per / jnp.maximum(batch["token_lengths"], 1))
            else:
                total += jnp.sum(log_probs) * 1e-9
            if use_distill:
                total += distillation_mse(student, out_lengths, batch["teacher"], batch["teacher_lengths"], normalize=False)
            else:
                total += jnp.sum(student.astype(jnp.float32)) * 1e-9
            return total

        @jax.jit
        def fb(p):
            v, g = jax.value_and_grad(loss_fn)(p)
            return v + sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(g))

        def run(n):
            v = None
            for _ in range(n):
                v = fb(params0)
            float(v)
        return run

    for name, uc, ud in [("enc only fwd+bwd", False, False),
                         ("enc+ctc fwd+bwd", True, False),
                         ("enc+distill fwd+bwd", False, True),
                         ("enc+ctc+distill f+b", True, True)]:
        t = slope(make_loss(uc, ud))
        print(f"{name:24s} {t*1e3:7.2f} ms", flush=True)

    # 3) ctc loss alone fwd and fwd+bwd at post-subsample shapes
    t_out = T // 2
    lp = jnp.asarray(rng.normal(size=(B, t_out, V)).astype(np.float32))
    lp = jax.nn.log_softmax(lp)
    lens = jnp.asarray(np.full((B,), t_out, np.int32))

    @jax.jit
    def ctc_f(lp):
        return jnp.sum(ctc_loss(lp, lens, batch["tokens"], batch["token_lengths"], 1))

    @jax.jit
    def ctc_fb(lp):
        v, g = jax.value_and_grad(lambda x: jnp.sum(ctc_loss(x, lens, batch["tokens"], batch["token_lengths"], 1)))(lp)
        return v + jnp.sum(g)

    def run_cf(n):
        v = None
        for _ in range(n):
            v = ctc_f(lp)
        float(v)

    def run_cfb(n):
        v = None
        for _ in range(n):
            v = ctc_fb(lp)
        float(v)

    print(f"ctc alone fwd            {slope(run_cf)*1e3:7.2f} ms", flush=True)
    print(f"ctc alone fwd+bwd        {slope(run_cfb)*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
