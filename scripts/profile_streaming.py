"""Streaming transcriber latency at production shapes on the attached TPU.

Builds the flagship model (tpu_fast_plus geometry) with random weights — the
compute cost is weight-value-independent — wraps it in an InferenceEngine +
ChunkedStreamingTranscriber, and measures per-feed wall latency while
streaming synthetic EMG in real-time-ish chunks.

Per-feed work is ONE fixed-shape jitted window call; the np.asarray readback
inside `_run_window` is a true device fence, so wall time per feed is the
honest serving latency (includes host assembly + transfer + device compute +
readback over the remote tunnel).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_streaming.py
"""

from __future__ import annotations

import time

import jax
import numpy as np

from ssd_tpu.data.vocab import default_vocab
from ssd_tpu.models.ssd_model import build_model
from ssd_tpu.serving.engine import InferenceEngine
from ssd_tpu.serving.streaming import ChunkedStreamingTranscriber

CFG = {
    "data": {"vocab": "configs/vocab.json"},
    "features": {
        "emg": {"sample_rate": 1000, "n_fft": 320, "hop_length": 10,
                "n_mels": 80, "normalize": "per_file"},
        "teacher": {"dim": 768},
    },
    "model": {
        "encoder": {
            "input_dim": 640, "d_model": 288, "num_layers": 6, "num_heads": 6,
            "ffn_dim": 1152, "depthwise_conv_kernel_size": 15, "dropout": 0.12,
            "subsample_factor": 2, "compute_dtype": "bfloat16",
        },
        "projection_dim": 768,
    },
}


def main() -> None:
    vocab = default_vocab()
    model = build_model(CFG, input_dim=640, vocab_size=vocab.size)
    rng = np.random.default_rng(0)
    import jax.numpy as jnp

    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 128, 640), jnp.float32),
        jnp.asarray([128], jnp.int32),
        train=False,
    )
    engine = InferenceEngine(
        CFG, variables["params"], variables.get("batch_stats", {}), vocab
    )
    st = ChunkedStreamingTranscriber(engine)  # S=96, W=512, R=32 frames
    hop = engine.feat_cfg.hop_length
    print(
        f"window: left {st.W} | chunk {st.S} | lookahead {st.R} frames "
        f"({st.Lw} samples/window, emission lag {st.R * hop} ms of audio)"
    )
    # warm the compile with one chunk-sized feed cycle
    feed_samples = st.S * hop  # one chunk of audio per feed
    n_feeds = 40
    lat = []
    for i in range(n_feeds + 4):
        t0 = time.perf_counter()
        st.feed(rng.normal(size=(feed_samples, st.channels)).astype(np.float32))
        dt = time.perf_counter() - t0
        if i >= 4:  # skip compile + warmup feeds
            lat.append(dt)
    arr = np.asarray(lat) * 1e3
    audio_ms = feed_samples / engine.feat_cfg.sample_rate * 1e3
    print(
        f"per-feed latency over {len(lat)} feeds ({audio_ms:.0f} ms audio each): "
        f"p50 {np.percentile(arr, 50):.1f} ms | p90 {np.percentile(arr, 90):.1f} ms "
        f"| max {arr.max():.1f} ms | RTF {np.percentile(arr, 50) / audio_ms:.3f}"
    )
    t0 = time.perf_counter()
    hyp = st.finish()
    print(f"finish(): {1e3 * (time.perf_counter() - t0):.1f} ms, hyp len {len(hyp)}")


if __name__ == "__main__":
    main()
