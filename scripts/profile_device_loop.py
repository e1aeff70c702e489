"""Clean step timing: K train steps chained ON DEVICE in one executable.

Host dispatch over the remote tunnel adds noisy multi-ms overhead per call;
a lax.fori_loop over the step body measures pure device time.

python scripts/profile_device_loop.py [k]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ssd_tpu.models.conformer import EncoderConfig
from ssd_tpu.models.ssd_model import SSDModel
from ssd_tpu.ops.ctc_loss import ctc_loss
from ssd_tpu.models.losses import distillation_mse
from ssd_tpu.training.schedules import build_optimizer
from ssd_tpu.training.train import TrainState, init_state

B, T, F, V, S, TD = 32, 768, 640, 48, 128, 768


def build(batch_size=B, dropout=0.12, conv_norm="batch", remat=False, attn="flax",
          dw="lax"):
    enc_cfg = EncoderConfig(
        input_dim=F, d_model=288, num_layers=6, num_heads=6, ffn_dim=1152,
        depthwise_conv_kernel_size=15, dropout=dropout, subsample_factor=2,
        compute_dtype="bfloat16", conv_norm=conv_norm, remat=remat,
        attention_impl=attn, depthwise_impl=dw,
    )
    model = SSDModel(encoder_cfg=enc_cfg, projection_dim=TD, vocab_size=V,
                     ctc_dropout=dropout)
    cfg = {"optim": {"lr": 3e-4, "weight_decay": 1e-2, "clip_grad_norm": 5.0,
                     "grad_accum": 1,
                     "scheduler": {"name": "warmup_hold", "warmup_steps": 800}}}
    tx, _ = build_optimizer(cfg, total_updates=1000)
    state = init_state(model, tx, F, jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    batch = {
        "emg": jnp.asarray(rng.normal(size=(batch_size, T, F)).astype(np.float32)),
        "emg_lengths": jnp.asarray(rng.integers(T // 2, T + 1, size=batch_size).astype(np.int32)),
        "tokens": jnp.asarray(rng.integers(2, V, size=(batch_size, S)).astype(np.int32)),
        "token_lengths": jnp.asarray(rng.integers(S // 2, S + 1, size=batch_size).astype(np.int32)),
        "teacher": jnp.asarray(rng.normal(size=(batch_size, T // 2, TD)).astype(np.float32)),
        "teacher_lengths": jnp.asarray(np.full((batch_size,), T // 2, np.int32)),
        "weight": jnp.asarray(np.ones((batch_size,), np.float32)),
    }
    return model, tx, state, batch


def step_fn(model, tx, batch, state, lambdas, rng, use_ctc=True, use_distill=True):
    def loss_fn(p):
        out, upd = model.apply(
            {"params": p, "batch_stats": state.batch_stats},
            batch["emg"], batch["emg_lengths"], train=True,
            rngs={"dropout": rng}, mutable=["batch_stats"],
        )
        log_probs, out_lengths, student = out
        total = jnp.float32(0)
        if use_ctc:
            per = ctc_loss(log_probs, out_lengths, batch["tokens"], batch["token_lengths"], 1)
            total += lambdas[0] * jnp.mean(per / jnp.maximum(batch["token_lengths"], 1))
        else:
            total += jnp.sum(log_probs) * 1e-12
        if use_distill:
            total += lambdas[1] * distillation_mse(
                student, out_lengths, batch["teacher"], batch["teacher_lengths"], normalize=False)
        else:
            total += jnp.sum(student.astype(jnp.float32)) * 1e-12
        return total, upd.get("batch_stats", {})

    (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    import optax
    from flax.core import freeze

    if isinstance(state.batch_stats, type(freeze({}))):
        new_bs = freeze(new_bs)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return state.replace(params=new_params, batch_stats=new_bs,
                         opt_state=new_opt, step=state.step + 1), loss


def time_variant(name, k=50, **kw):
    use_ctc = kw.pop("use_ctc", True)
    use_distill = kw.pop("use_distill", True)
    model, tx, state, batch = build(**kw)
    lambdas = jnp.asarray([0.65, 0.35], jnp.float32)
    base_rng = jax.random.key(1, impl="rbg")

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_k(state, k):
        # dynamic trip count: ONE compiled executable serves warmup and the
        # timed run (a static k would recompile inside the timed region)
        def body(i, st):
            rng = jax.random.fold_in(base_rng, st.step)
            st, loss = step_fn(model, tx, batch, st, lambdas, rng,
                               use_ctc=use_ctc, use_distill=use_distill)
            return st
        return jax.lax.fori_loop(0, k, body, state)

    state = run_k(state, jnp.int32(2))  # compile + warm
    float(jnp.sum(state.step))  # fence
    t0 = time.perf_counter()
    state = run_k(state, jnp.int32(k))
    float(jnp.sum(state.step))  # readback = true fence
    dt = (time.perf_counter() - t0) / k
    bsz = batch["emg"].shape[0]
    print(f"{name:28s} {dt*1e3:7.2f} ms/step   {bsz/dt:8.1f} utt/s", flush=True)
    return dt


if __name__ == "__main__":
    variants = sys.argv[1:] or ["base"]
    for v in variants:
        if v == "base":
            time_variant("full step (B=32)")
        elif v == "b24":
            time_variant("full step (B=24)", batch_size=24)
        elif v == "b48":
            time_variant("full step (B=48)", batch_size=48)
        elif v == "b64":
            time_variant("full step (B=64)", batch_size=64)
        elif v == "dwpallas":
            time_variant("pallas depthwise (B=32)", dw="pallas")
        elif v == "fusedattn":
            time_variant("fused attention (B=32)", attn="fused")
        elif v == "fusedattn_nodrop":
            time_variant("fused attn, no dropout", attn="fused", dropout=0.0)
        elif v == "remat":
            time_variant("remat blocks (B=32)", remat=True)
        elif v == "remat64":
            time_variant("remat blocks (B=64)", batch_size=64, remat=True)
        elif v == "remat128":
            time_variant("remat blocks (B=128)", batch_size=128, remat=True)
        elif v == "b128":
            time_variant("full step (B=128)", batch_size=128)
        elif v == "nodrop":
            time_variant("no dropout", dropout=0.0)
        elif v == "ln":
            time_variant("conv_norm=layer", conv_norm="layer")
        elif v == "noctc":
            time_variant("no ctc", use_ctc=False)
        elif v == "nodistill":
            time_variant("no distill", use_distill=False)
        else:
            print("unknown variant", v)
