"""Decode-latency completeness (VERDICT r3 #6): width scaling + e2e path.

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_decode_widths.py

Measures, on the attached chip:

* plain device beam search at widths 20/50/100, token_top_k=16 and exact
  (BASELINE.md's silent-best decoder is beam width 100 — the reference runs
  it as a per-utterance CPU loop, ``src/decoding/ctc.py:89-96``);
* LM-fused device search at the same widths;
* the END-TO-END eval-path p50 per utterance: raw EMG → fused featurizer →
  flagship encoder forward → beam-50 — one jitted program, i.e. what
  ``evaluation.evaluate`` pays per batch on real data (the bench's decode
  numbers start from pre-made logits; this one doesn't).

Timing: two-point slope over repeated calls with a scalar-readback fence
(bench.py:_timed_slope semantics — cancels constant dispatch+readback).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

B = 8
T_OUT = 256  # ~5 s utterance post-subsample (matches bench.py)
VOCAB = 48


def timed_slope(run_n, n_small=3, n_large=9):
    run_n(1)  # compile + warm
    t0 = time.perf_counter()
    run_n(n_small)
    t_small = time.perf_counter() - t0
    t0 = time.perf_counter()
    run_n(n_large)
    t_large = time.perf_counter() - t0
    return (t_large - t_small) / (n_large - n_small)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from ssd_tpu.ops.ctc_decode import beam_search

    rng = np.random.default_rng(2)
    logits = rng.normal(size=(B, T_OUT, VOCAB)).astype(np.float32) * 2
    lp = jnp.asarray(logits)
    lp = lp - jax.nn.logsumexp(lp, axis=-1, keepdims=True)
    lengths = jnp.full((B,), T_OUT, jnp.int32)

    results = {"batch": B, "frames": T_OUT, "widths_ms_per_utt": {}}

    for width in (20, 50, 100):
        for top_k, label in ((16, f"beam{width}_topk16"), (None, f"beam{width}_exact")):
            def run_n(n, top_k=top_k, width=width):
                s = None
                for _ in range(n):
                    _, _, s = beam_search(
                        lp, lengths, blank_id=1, pad_id=0,
                        beam_width=width, token_top_k=top_k,
                    )
                float(s[0, 0])

            sec = timed_slope(run_n) / B
            results["widths_ms_per_utt"][label] = round(sec * 1e3, 2)
            print(json.dumps({label: round(sec * 1e3, 2)}), flush=True)

    # ---- LM-fused width scaling
    sys.path.insert(0, str(REPO))  # bench helpers
    import bench as bench_mod

    table, vocab = bench_mod._synthetic_char_lm()
    from ssd_tpu.decoding.device_lm import beam_search_lm_device

    for width in (20, 50, 100):
        def run_n(n, width=width):
            s = None
            for _ in range(n):
                _, _, s, _ = beam_search_lm_device(
                    lp, lengths, table,
                    blank_id=vocab.blank_id, pad_id=vocab.pad_id,
                    space_id=vocab.token_to_id[" "], beam_width=width,
                    alpha=0.5, beta=0.05, token_top_k=16,
                )
            float(s[0, 0])

        sec = timed_slope(run_n) / B
        results["widths_ms_per_utt"][f"lm_beam{width}_topk16"] = round(sec * 1e3, 2)
        print(json.dumps({f"lm_beam{width}_topk16": round(sec * 1e3, 2)}), flush=True)

    # ---- end-to-end eval path: raw EMG → featurizer → encoder → beam-50
    from ssd_tpu.models.conformer import EncoderConfig
    from ssd_tpu.models.ssd_model import SSDModel
    from ssd_tpu.ops.featurizer import FeaturizerConfig, logmel_batch

    feat_cfg = FeaturizerConfig(sample_rate=1000, n_fft=320, hop_length=10, n_mels=80)
    enc = EncoderConfig(
        input_dim=640, d_model=288, num_layers=6, num_heads=6, ffn_dim=1152,
        depthwise_conv_kernel_size=15, dropout=0.12, subsample_factor=2,
        compute_dtype="bfloat16",
    )
    model = SSDModel(encoder_cfg=enc, projection_dim=768, vocab_size=VOCAB,
                     ctc_dropout=0.12)
    L = 7680  # ~7.7 s at 1 kHz → 768 feature frames → 384 post-subsample
    raw = jnp.asarray(rng.normal(size=(B, L, 8)).astype(np.float32))
    raw_lengths = jnp.full((B,), L, jnp.int32)
    feats0, n_frames0, _, _ = logmel_batch(raw, raw_lengths, feat_cfg, fused=True)
    variables = model.init(
        jax.random.PRNGKey(0),
        feats0.reshape(B, feats0.shape[1], -1), n_frames0, train=False,
    )

    import functools

    @functools.partial(jax.jit, static_argnames=())
    def e2e(raw, raw_lengths):
        feats, n_frames, _, _ = logmel_batch(raw, raw_lengths, feat_cfg, fused=True)
        feats = feats.reshape(feats.shape[0], feats.shape[1], -1)
        log_probs, out_lengths, _ = model.apply(
            variables, feats, n_frames, train=False
        )
        chars, parents, scores = beam_search(
            log_probs.astype(jnp.float32), out_lengths,
            blank_id=1, pad_id=0, beam_width=50, token_top_k=16,
        )
        return scores

    def run_n(n):
        s = None
        for _ in range(n):
            s = e2e(raw, raw_lengths)
        float(s[0, 0])

    sec = timed_slope(run_n) / B
    results["e2e_eval_path_ms_per_utt"] = round(sec * 1e3, 2)
    results["device"] = jax.devices()[0].device_kind
    print(json.dumps(results))


if __name__ == "__main__":
    main()
