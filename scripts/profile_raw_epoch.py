"""Epoch throughput of the train-from-raw path at flagship shapes.

Companion to `bench.py`'s epoch mode: same loader → collate → shard → step
pipeline, but the loader moves RAW (samples, 8ch) EMG (~0.25 MB/utt) instead
of cached log-mels (~1.9 MB/utt) and the compiled step featurizes on device
(fused Pallas on TPU). Reports the same two rates so the ~8× byte reduction
can be compared against `epoch_*` in the bench extras.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_raw_epoch.py
"""

from __future__ import annotations

import json
import tempfile
import time
from pathlib import Path

import numpy as np
import pandas as pd

N_UTTS = 96
EPOCHS = 2
BATCH = 32
CHANNELS = 8
HOP = 10
VOCAB_SIZE = 48
TEACHER_DIM = 768


def main() -> None:
    import jax
    import jax.numpy as jnp

    from ssd_tpu.data.dataset import make_dataloader, prefetch
    from ssd_tpu.data.vocab import default_vocab
    from ssd_tpu.models.conformer import EncoderConfig
    from ssd_tpu.models.ssd_model import SSDModel
    from ssd_tpu.ops.featurizer import FeaturizerConfig
    from ssd_tpu.parallel.mesh import make_mesh, shard_batch
    from ssd_tpu.training.schedules import build_optimizer
    from ssd_tpu.training.train import batch_to_arrays, init_state, make_train_step
    from ssd_tpu.utils.platform import is_tpu_backend

    feat_cfg = FeaturizerConfig(
        sample_rate=1000, n_fft=320, hop_length=HOP, n_mels=80,
        normalize="per_file",
    )
    enc_cfg = EncoderConfig(
        input_dim=CHANNELS * 80, d_model=288, num_layers=6, num_heads=6,
        ffn_dim=1152, depthwise_conv_kernel_size=15, dropout=0.12,
        subsample_factor=2, compute_dtype="bfloat16",
    )
    model = SSDModel(
        encoder_cfg=enc_cfg, projection_dim=TEACHER_DIM,
        vocab_size=VOCAB_SIZE, ctc_dropout=0.12,
    )
    tx, _ = build_optimizer(
        {"optim": {"lr": 3e-4, "weight_decay": 1e-2, "clip_grad_norm": 5.0,
                   "grad_accum": 1,
                   "scheduler": {"name": "warmup_hold", "warmup_steps": 800}}},
        1000,
    )
    state = init_state(model, tx, CHANNELS * 80, jax.random.PRNGKey(0))
    train_step = make_train_step(
        model, tx, blank_id=1, normalize_distill=False,
        featurize=(feat_cfg, is_tpu_backend()),
    )
    lambdas = jnp.asarray([0.65, 0.35], jnp.float32)
    drop_rng = jax.random.key(1, impl="rbg")
    mesh = make_mesh()

    rng = np.random.default_rng(4)
    words = ["the", "cat", "sat", "on", "mat", "dog", "ran", "quick", "brown"]

    def transcript():
        s = ""
        while len(s) < 100:
            s += (" " if s else "") + words[rng.integers(len(words))]
        return s[:127]

    with tempfile.TemporaryDirectory() as tmp:
        root = Path(tmp)
        rows = []
        raw_dir = root / "raw"
        td_root = root / "features" / "teacher" / "voiced_parallel_data" / "s1"
        raw_dir.mkdir(parents=True)
        td_root.mkdir(parents=True)
        for i in range(N_UTTS):
            # samples drawn so every batch pads to 7680 (bucket 128×hop)
            n = int(rng.integers(6420, 7681))
            raw_path = raw_dir / f"{i}_0_emg.npy"
            np.save(raw_path, rng.normal(size=(n, CHANNELS)).astype(np.float32))
            t_frames = 1 + (n - feat_cfg.n_fft) // HOP
            np.save(
                td_root / f"{i}_0.npy",
                rng.normal(size=(t_frames // 2, TEACHER_DIM)).astype(np.float32),
            )
            rows.append(dict(
                utterance_id=f"voiced_parallel_data/s1/{i}_0",
                split="voiced_parallel_data", subset="train", speaker="s1",
                stem=f"{i}_0", emg_path=str(raw_path), audio_path=None,
                transcript=transcript(), sentence_index=i, book="",
                has_audio=True, metadata_json="{}",
            ))
        idx = root / "index.parquet"
        pd.DataFrame(rows).to_parquet(idx)
        loader = make_dataloader(
            idx, root / "features", ["voiced_parallel_data"], ["train"],
            default_vocab(), batch_size=BATCH, raw=True, raw_hop_length=HOP,
        )

        def run_epoch(feed_device: bool):
            nonlocal state
            losses = None
            with mesh:
                for batch in prefetch(loader):
                    arrays = batch_to_arrays(batch, include_teacher=True)
                    arrays["weight"][batch.size:] = 0.0
                    if feed_device:
                        sharded = shard_batch(mesh, arrays)
                        state, losses = train_step(state, sharded, lambdas, drop_rng)
            if losses is not None:
                float(losses["total"])  # true fence on this platform

        run_epoch(True)  # warm (compiles)
        t0 = time.perf_counter()
        for _ in range(EPOCHS):
            loader.epoch += 1
            run_epoch(False)
        host_rate = EPOCHS * N_UTTS / (time.perf_counter() - t0)
        t0 = time.perf_counter()
        for _ in range(EPOCHS):
            loader.epoch += 1
            run_epoch(True)
        full_rate = EPOCHS * N_UTTS / (time.perf_counter() - t0)

    print(json.dumps({
        "mode": "train_from_raw",
        "epoch_utt_per_sec_per_chip": round(full_rate / len(jax.devices()), 1),
        "epoch_host_pipeline_utt_per_sec_per_core": round(host_rate, 1),
        "raw_bytes_per_utt": 7680 * CHANNELS * 4,
        "feature_bytes_per_utt": 768 * 640 * 4,
    }))


if __name__ == "__main__":
    main()
