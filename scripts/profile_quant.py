"""Inference forward latency: fp32 vs bf16 vs int8 (W8A8) vs int8-prequant.

Flagship ``tpu_fast_plus`` model at serving shapes (B=8, T=768 feature
frames → 384 post-subsample). Timing: K forwards chained ON DEVICE in one
``lax.fori_loop`` executable with a dynamic trip count and a data-dependent
carry — the only per-batch-latency method that survives the remote (axon)
tunnel's multi-ms dispatch jitter (two-point slope at sub-ms batch times
measured a literal 0.000 ms once; see docs/PERF.md "Measurement
methodology").

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_quant.py
"""

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

B, T, F, V = 8, 768, 640, 48
K = 64  # timed loop length


def flagship(**enc_kwargs):
    cfg = EncoderConfig(
        input_dim=F, d_model=288, num_layers=6, num_heads=6, ffn_dim=1152,
        depthwise_conv_kernel_size=15, dropout=0.12, subsample_factor=2,
        **enc_kwargs,
    )
    return SSDModel(encoder_cfg=cfg, projection_dim=768, vocab_size=V,
                    ctc_dropout=0.12)


def time_device_loop(fwd, run_vars, emg, lengths, k_lo=16, k_hi=K):
    """ms/batch for one forward: slope between a k_lo- and a k_hi-length
    on-device chain, so the constant remote dispatch+readback cancels
    exactly (dividing one interval by k only amortizes it, biasing sub-ms
    batch times upward).

    The carry feeds a data-dependent (but numerically negligible) scalar
    from each output back into the next input, so XLA cannot overlap or
    elide iterations; each loop body pays the full per-batch latency, which
    is exactly what sequential serving pays.
    """

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_k(x, k):
        def body(i, x):
            out = fwd(run_vars, x, lengths)
            return x + (out[0][0, 0, 0] * jnp.float32(1e-30)).astype(x.dtype)

        return jax.lax.fori_loop(0, k, body, x)

    t0 = time.time()
    # fresh copy: donate_argnums consumes the carry, and the caller reuses
    # the same host input across variants
    x = run_k(jnp.array(emg), jnp.int32(2))  # compile + warm (same executable)
    float(x[0, 0, 0])  # scalar readback = true fence
    compile_s = time.time() - t0

    def timed(x, k):
        t0 = time.perf_counter()
        x = run_k(x, jnp.int32(k))
        float(x[0, 0, 0])
        return time.perf_counter() - t0, x

    t_lo, x = timed(x, k_lo)
    t_hi, x = timed(x, k_hi)
    dt = (t_hi - t_lo) / (k_hi - k_lo)
    return dt, compile_s


def main():
    rng = np.random.default_rng(0)
    emg = jnp.asarray(rng.normal(size=(B, T, F)).astype(np.float32))
    lengths = jnp.asarray(np.full((B,), T, np.int32))

    # identical param trees: init once, reuse across variants
    variables = flagship().init(jax.random.PRNGKey(0), emg, lengths, train=False)

    from ssd_tpu.ops.quant import maybe_prequantize

    prequant_vars = {
        "params": maybe_prequantize(
            variables["params"],
            {"quantize": "int8_prequant", "compute_dtype": "bfloat16"},
        ),
        "batch_stats": variables["batch_stats"],
    }
    results = {}
    for name, kw in [
        ("fp32", {}),
        ("bf16", {"compute_dtype": "bfloat16"}),
        ("bf16+int8", {"compute_dtype": "bfloat16", "quantize": "int8"}),
        ("bf16+int8pre", {"compute_dtype": "bfloat16", "quantize": "int8_prequant"}),
    ]:
        model = flagship(**kw)
        run_vars = prequant_vars if kw.get("quantize") == "int8_prequant" else variables

        def fwd(v, x, l, model=model):
            return model.apply(v, x, l, train=False)

        sec, compile_s = time_device_loop(fwd, run_vars, emg, lengths)
        results[name] = sec
        print(
            f"{name:>12}: {sec * 1e3:7.3f} ms/batch  "
            f"{sec / B * 1e6:7.1f} us/utt  (compile {compile_s:.0f}s)",
            flush=True,
        )
    print(f"int8 speedup vs bf16: {results['bf16'] / results['bf16+int8']:.2f}x")
    print(f"prequant speedup vs bf16: {results['bf16'] / results['bf16+int8pre']:.2f}x")
    print(f"prequant speedup vs int8: {results['bf16+int8'] / results['bf16+int8pre']:.2f}x")


if __name__ == "__main__":
    main()
