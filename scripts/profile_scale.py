"""Scaled-up encoder measurements: where the MXU, not latency, dominates.

The flagship (13 M params) runs latency/HBM-bound at ~37% MFU, which caps
what single-chip numbers can say about the framework's compute path. This
script measures the SAME train step and inference pipeline at transformer
scales where the matmuls dominate, to demonstrate (a) the MFU the stack
reaches when given real arithmetic intensity, and (b) the int8 (W8A8)
claim in docs/PERF.md — "wins where dense FLOPs dominate" — with numbers.

Train timing: lax.fori_loop device loop with a dynamic trip count and a
scalar readback fence (the only sound methods on the remote axon platform
— docs/PERF.md "Measurement methodology"). Inference: two-point slope.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_scale.py \
      [flagship|large|xl ...] [--infer] [--remat] [--b N]
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from ssd_tpu.models.conformer import EncoderConfig
from ssd_tpu.models.ssd_model import SSDModel
from ssd_tpu.ops.ctc_loss import ctc_loss
from ssd_tpu.training.schedules import build_optimizer
from ssd_tpu.training.train import init_state

T, F, V, S = 768, 640, 48, 128
PEAK_BF16_TFLOPS = 197.0  # v5e
PEAK_INT8_TOPS = 394.0

SCALES = {
    # name: (d_model, layers, heads, ffn)
    "flagship": (288, 6, 6, 1152),
    "large": (768, 12, 12, 3072),
    "xl": (1024, 18, 16, 4096),
}


def step_flops(B, D, L, H, FFN, K=15, train=True) -> float:
    """Analytic matmul FLOPs (bench.py:_train_step_flops generalized)."""
    Tp = T // 2
    hd = D // H
    mm = lambda m, k, n: 2.0 * m * k * n  # noqa: E731
    sub = mm(B * Tp, F * 5, D)
    qkvo = 4 * mm(B * Tp, D, D)
    attn = 2 * 2.0 * B * H * Tp * Tp * hd
    ffn = 2 * (mm(B * Tp, D, FFN) + mm(B * Tp, FFN, D))
    convm = mm(B * Tp, D, 2 * D) + mm(B * Tp, D, D) + 2.0 * B * Tp * D * K
    heads = mm(B * Tp, D, 768) + mm(B * Tp, D, V)
    fwd = sub + L * (qkvo + attn + ffn + convm) + heads
    return 3.0 * fwd if train else fwd


def build(scale, B, remat=False, quantize=None, dropout=0.12, scan=False,
          remat_policy="full"):
    D, L, H, FFN = SCALES[scale]
    enc = EncoderConfig(
        input_dim=F, d_model=D, num_layers=L, num_heads=H, ffn_dim=FFN,
        depthwise_conv_kernel_size=15, dropout=dropout, subsample_factor=2,
        compute_dtype="bfloat16", remat=remat, scan_layers=scan,
        remat_policy=remat_policy,
        **({"quantize": quantize} if quantize else {}),
    )
    return SSDModel(encoder_cfg=enc, projection_dim=768, vocab_size=V,
                    ctc_dropout=dropout)


def train_variant(scale, B, remat, scan=False, compile_only=False,
                  remat_policy="full"):
    model = build(scale, B, remat=remat, scan=scan, remat_policy=remat_policy)
    cfg = {"optim": {"lr": 3e-4, "weight_decay": 1e-2, "clip_grad_norm": 5.0,
                     "grad_accum": 1,
                     "scheduler": {"name": "warmup_hold", "warmup_steps": 800}}}
    tx, _ = build_optimizer(cfg, total_updates=1000)
    state = init_state(model, tx, F, jax.random.PRNGKey(0))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))

    rng_np = np.random.default_rng(0)
    batch = {
        "emg": jnp.asarray(rng_np.normal(size=(B, T, F)).astype(np.float32)),
        "emg_lengths": jnp.asarray(np.full((B,), T, np.int32)),
        "tokens": jnp.asarray(rng_np.integers(2, V, size=(B, S)).astype(np.int32)),
        "token_lengths": jnp.asarray(np.full((B,), S, np.int32)),
        "weight": jnp.asarray(np.ones((B,), np.float32)),
    }
    base_rng = jax.random.key(1, impl="rbg")

    def one_step(st):
        import optax

        def loss_fn(p):
            out, upd = model.apply(
                {"params": p, "batch_stats": st.batch_stats},
                batch["emg"], batch["emg_lengths"], train=True,
                rngs={"dropout": jax.random.fold_in(base_rng, st.step)},
                mutable=["batch_stats"],
            )
            log_probs, out_lengths, _ = out
            per = ctc_loss(log_probs, out_lengths, batch["tokens"],
                           batch["token_lengths"], 1)
            return (
                jnp.mean(per / jnp.maximum(batch["token_lengths"], 1)),
                upd.get("batch_stats", {}),
            )

        (_, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(st.params)
        updates, new_opt = tx.update(grads, st.opt_state, st.params)
        return st.replace(
            params=optax.apply_updates(st.params, updates),
            batch_stats=new_bs, opt_state=new_opt, step=st.step + 1,
        )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_k(st, k):
        return jax.lax.fori_loop(0, k, lambda i, s: one_step(s), st)

    if compile_only:
        # AOT trace+lower+compile, no execution: the honest scan-vs-unrolled
        # compile-time comparison runs on a local-XLA backend (CPU), where
        # compile latency is deterministic (the remote TPU compiler's is not)
        t0 = time.perf_counter()
        run_k.lower(state, jnp.int32(2)).compile()
        print(
            f"compile {scale:9s} B={B:<3d} {n_params/1e6:7.1f}M params "
            f"{time.perf_counter()-t0:8.1f} s"
            f"{'  (remat)' if remat else ''}{'  (scan)' if scan else ''}",
            flush=True,
        )
        return
    t0 = time.perf_counter()
    state = run_k(state, jnp.int32(2))
    float(jnp.sum(state.step))  # fence
    compile_s = time.perf_counter() - t0  # NOTE: remote-compiler latency is
    # minutes-variable for the SAME graph on this rig; compare scan vs
    # unrolled on a local-XLA host (CPU) for a clean compile-time number
    k = 30
    t0 = time.perf_counter()
    state = run_k(state, jnp.int32(k))
    float(jnp.sum(state.step))
    dt = (time.perf_counter() - t0) / k
    fl = step_flops(B, *SCALES[scale])
    tf = fl / dt / 1e12
    print(
        f"train {scale:9s} B={B:<3d} {n_params/1e6:7.1f}M params "
        f"{dt*1e3:8.2f} ms/step {B/dt:8.1f} utt/s "
        f"{tf:6.1f} TF/s  MFU {tf/PEAK_BF16_TFLOPS:5.1%}"
        f"  compile {compile_s:.0f}s"
        f"{'  (remat:' + remat_policy + ')' if remat else ''}"
        f"{'  (scan)' if scan else ''}",
        flush=True,
    )


def infer_variant(scale, B):
    from bench import _timed_slope

    rng_np = np.random.default_rng(0)
    emg = jnp.asarray(rng_np.normal(size=(B, T, F)).astype(np.float32))
    lengths = jnp.asarray(np.full((B,), T, np.int32))
    variables = build(scale, B).init(jax.random.PRNGKey(0), emg, lengths,
                                     train=False)
    variables = jax.device_put(variables)  # params as jit ARGUMENTS, not
    # closed-over constants — inlined 166M-param constants blow past the
    # remote compiler's HLO upload size limit (HTTP 413)
    from ssd_tpu.ops.quant import maybe_prequantize

    prequant_vars = {
        "params": maybe_prequantize(
            variables["params"],
            {"quantize": "int8_prequant", "compute_dtype": "bfloat16"},
        ),
        "batch_stats": variables["batch_stats"],
    }
    for name, q in [
        ("bf16", None),
        ("bf16+int8", "int8"),
        ("bf16+int8pre", "int8_prequant"),
    ]:
        model = build(scale, B, quantize=q)
        run_vars = prequant_vars if q == "int8_prequant" else variables

        @jax.jit
        def fwd(variables, emg, lengths):
            log_probs, out_lengths, _ = model.apply(
                variables, emg, lengths, train=False
            )
            return log_probs

        def run_n(n):
            x = emg
            for _ in range(n):
                lp = fwd(run_vars, x, lengths)
                # chain: feed a slice of the output back so calls serialize
                x = x.at[:, 0, 0].add(lp[:, 0, 0] * 1e-9)
            return float(jnp.sum(x[0, 0, 0]))

        run_n(2)  # compile + warm
        dt = _timed_slope(run_n, 4, 16)
        fl = step_flops(B, *SCALES[scale], train=False)
        tf = fl / dt / 1e12
        print(
            f"infer {scale:9s} B={B:<3d} {name:10s} {dt*1e3:8.2f} ms/batch "
            f"{B/dt:8.1f} utt/s  {tf:6.1f} T(FL)OP/s",
            flush=True,
        )


if __name__ == "__main__":
    args = [a for a in sys.argv[1:]]
    remat = "--remat" in args
    infer = "--infer" in args
    scan = "--scan" in args
    remat_policy = "full"
    if "--remat-policy" in args:
        remat_policy = args[args.index("--remat-policy") + 1]
        remat = True
    bsz = 32
    if "--b" in args:
        bsz = int(args[args.index("--b") + 1])
    scales = [a for a in args if a in SCALES] or ["large"]
    for s in scales:
        if infer:
            infer_variant(s, min(bsz, 8) if bsz == 32 else bsz)
        else:
            train_variant(s, bsz, remat, scan, "--compile-only" in args,
                          remat_policy=remat_policy)
