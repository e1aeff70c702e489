"""Inference forward latency: fp32 vs bf16 vs bf16+int8 (W8A8) encoder.

Flagship ``tpu_fast_plus`` model at serving shapes (B=8, T=768 feature
frames → 384 post-subsample), two-point-slope timing (the only sound
wall-clock method on the remote axon platform — see docs/PERF.md).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_quant.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from bench import _timed_slope
from ssd_tpu.models.conformer import EncoderConfig
from ssd_tpu.models.ssd_model import SSDModel

B, T, F, V = 8, 768, 640, 48


def flagship(**enc_kwargs):
    cfg = EncoderConfig(
        input_dim=F, d_model=288, num_layers=6, num_heads=6, ffn_dim=1152,
        depthwise_conv_kernel_size=15, dropout=0.12, subsample_factor=2,
        **enc_kwargs,
    )
    return SSDModel(encoder_cfg=cfg, projection_dim=768, vocab_size=V,
                    ctc_dropout=0.12)


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

        @jax.jit
        def fwd(v, x, l):
            return model.apply(v, x, l, train=False)

        def run_n(n):
            out = None
            for _ in range(n):
                out = fwd(run_vars, emg, lengths)
            float(out[0][0, 0, 0])  # scalar readback = fence

        t0 = time.time()
        run_n(1)  # compile
        sec = _timed_slope(run_n, 4, 12)
        results[name] = sec
        print(
            f"{name:>10}: {sec * 1e3:7.3f} ms/batch  "
            f"{sec / B * 1e6:7.1f} us/utt  (compile {time.time() - t0:.0f}s)",
            flush=True,
        )
    if "bf16" in results and "bf16+int8" in results:
        print(f"int8 speedup vs bf16: {results['bf16'] / results['bf16+int8']:.2f}x")
    print(f"int8 speedup vs fp32: {results['fp32'] / results['bf16+int8']:.2f}x")


if __name__ == "__main__":
    main()
