"""Offline feature preprocessing CLI (EMG log-mel + WavLM teacher states).

Reference surface parity (``src/data/preprocessing.py``):

  python -m ssd_tpu.data.preprocessing --mode emg --index results/index.parquet \
      --root data/emg_data --out results/features/emg
  python -m ssd_tpu.data.preprocessing --mode teacher --index results/index.parquet \
      --root data/emg_data --out results/features/teacher

Cache contract is identical — ``<utterance_id>.npy`` + ``<utterance_id>.json``
metadata, idempotent skip of existing files unless ``--overwrite``
(reference ``:88-123``). The compute is TPU-native: utterances are grouped
into padded length buckets and featurized by the batched (optionally fused
Pallas) log-mel kernel; the teacher forward runs the jitted flax WavLM port.

Note the reference CLI defaults (n_fft=400, hop=160) differ from the values
its training configs record (n_fft=320, hop=10); real runs used 320/10
(SURVEY.md §2.4). Defaults here match the reference CLI for parity, configs
pass 320/10 explicitly.
"""

from __future__ import annotations

import argparse
import json
import logging
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from ssd_tpu.data.index_dataset import load_index
from ssd_tpu.ops.featurizer import FeaturizerConfig, logmel_batch

logger = logging.getLogger(__name__)

SAMPLE_BUCKET = 2560  # raw-sample padding granularity (256 frames at hop 10)


def _out_paths(out_dir: Path, utterance_id: str) -> tuple[Path, Path]:
    feature_path = out_dir / f"{utterance_id}.npy"
    meta_path = out_dir / f"{utterance_id}.json"
    feature_path.parent.mkdir(parents=True, exist_ok=True)
    return feature_path, meta_path


def _round_up(n: int, m: int) -> int:
    return max(m, ((n + m - 1) // m) * m)


# ---------------------------------------------------------------- EMG mode


def _work_list(rows, root: Path, out_dir: Path, path_attr: str,
               overwrite: bool, limit: Optional[int]) -> List[tuple]:
    """Eligible (row, source_path) pairs, LENGTH-SORTED for batching.

    ``limit`` keeps the CLI contract (first N eligible rows in manifest
    order); the kept rows are then sorted by source file size — a free
    duration proxy — so each padded batch is near-homogeneous. This cuts
    both the padding FLOPs and (decisively on a bandwidth-bound link) the
    device→host bytes of the batch-max sliced fetch in the flush loops."""
    work = []
    for row in rows:
        if limit and len(work) >= limit:
            break
        feature_path, _ = _out_paths(out_dir, row.utterance_id)
        if feature_path.exists() and not overwrite:
            continue
        rel = getattr(row, path_attr, None)
        if rel is None or not isinstance(rel, str):
            logger.debug("Skipping (no %s) %s", path_attr, row.utterance_id)
            continue
        src = root / rel
        if not src.exists():
            logger.warning("Missing %s for %s: %s", path_attr, row.utterance_id, src)
            continue
        work.append((row, src))
    work.sort(key=lambda rs: rs[1].stat().st_size)
    return work


def process_emg_rows(
    rows: List,
    root: Path,
    out_dir: Path,
    cfg: FeaturizerConfig,
    overwrite: bool,
    batch_size: int = 8,
    fused: bool = True,
    limit: Optional[int] = None,
    fetch_dtype: str = "float32",
    double_buffer: bool = True,
) -> int:
    """Featurize EMG for manifest rows; returns number written.

    ``fetch_dtype="bfloat16"`` halves the device→host bytes of the feature
    fetch (the bottleneck on a bandwidth-bound link) — log-mel dB values are
    O(±80) with ~3 useful decimal digits, well inside bf16's 8-bit mantissa;
    the ON-DISK contract stays float32 (reference cache contract,
    ``src/data/preprocessing.py:108-122``), so readers are unaffected.
    ``double_buffer`` dispatches batch k+1's device compute BEFORE fetching
    batch k's features (dispatch is async), overlapping readback with
    compute; output is bit-identical to the sequential order.
    """
    import jax.numpy as jnp

    if fetch_dtype not in ("float32", "bfloat16"):
        raise ValueError(f"fetch_dtype={fetch_dtype!r}")

    pending: List[tuple] = []  # (row, emg array)
    inflight: Optional[tuple] = None  # (rows, feats_dev, frame_lengths, means, stds)
    written = 0

    def write_out(batch_rows, feats_dev, frame_lengths, means, stds) -> int:
        # ONE device→host transfer of the batch-max slice: rows are length-
        # sorted, so batch-max ≈ each row's length and the padded tail
        # (bucket rounding) never crosses the link. Measured on the remote
        # rig: whole-padded fetch 3.0 utt/s → per-utt slices 3.9 → sorted
        # batch-max fetch 8+ (docs/PERF.md "Offline featurization").
        feats = np.asarray(feats_dev)
        if feats.dtype == np.uint16:
            # bf16 fetch arrives bitcast as uint16 (raw memcpy off the
            # device — np.asarray of an ml_dtypes bf16 array takes a slow
            # element-wise conversion path in the remote client, measured
            # ~40% SLOWER than fp32 despite half the bytes); reinterpret
            # and upcast here, vectorized on the host
            import ml_dtypes

            feats = feats.view(ml_dtypes.bfloat16)
        feats = feats.astype(np.float32, copy=False)
        count = 0
        for i, row in enumerate(batch_rows):
            out = feats[i, : int(frame_lengths[i])]
            feature_path, meta_path = _out_paths(out_dir, row.utterance_id)
            np.save(feature_path, out)
            meta = {
                "utterance_id": row.utterance_id,
                "frames": int(out.shape[0]),
                "channels": int(out.shape[1]),
                "n_mels": int(out.shape[2]),
                "sample_rate": cfg.sample_rate,
                "n_fft": cfg.n_fft,
                "hop_length": cfg.hop_length,
                "fmin": cfg.fmin,
                "fmax": cfg.fmax,
                "normalize": cfg.normalize,
            }
            if cfg.normalize == "per_file":
                meta["mean"] = float(means[i])
                meta["std"] = float(stds[i])
            meta_path.write_text(json.dumps(meta, indent=2))
            count += 1
        return count

    def flush() -> int:
        nonlocal pending, inflight
        if not pending:
            return 0
        lengths = np.asarray([e.shape[0] for _, e in pending], np.int32)
        L_pad = _round_up(int(lengths.max()), SAMPLE_BUCKET)
        C = pending[0][1].shape[1]
        batch = np.zeros((len(pending), L_pad, C), np.float32)
        for i, (_, e) in enumerate(pending):
            batch[i, : e.shape[0]] = e
        feats, _, means, stds = logmel_batch(
            jnp.asarray(batch), jnp.asarray(lengths), cfg, fused=fused
        )
        # Frame lengths are a pure function of the host-known sample lengths
        # (ops/featurizer.py:127-130; rows shorter than n_fft were filtered
        # above). Computing them HERE instead of fetching the device copy
        # keeps this dispatch fully async — fetching them blocked on THIS
        # batch's executable before write_out fetched the previous one,
        # which made double_buffer a no-op (the device sat idle through
        # every readback).
        T_pad = cfg.frame_count(L_pad)
        frame_lengths = np.clip(
            1 + (lengths - cfg.n_fft) // cfg.hop_length, 0, T_pad
        ).astype(np.int32)
        # Enqueue the batch-max slice (+ optional bf16 cast) now, BEFORE the
        # next batch's compute is dispatched, so the fetch in write_out is a
        # pure device→host copy that rides the tunnel while the next batch
        # computes.
        feats = feats[:, : int(frame_lengths.max())]
        if fetch_dtype == "bfloat16":
            # cast on DEVICE (halves fetch bytes), then bitcast to uint16 so
            # the host fetch is a raw memcpy instead of the remote client's
            # element-wise extension-dtype conversion; write_out views the
            # bits back as bf16
            import jax

            feats = jax.lax.bitcast_convert_type(
                feats.astype(jnp.bfloat16), jnp.uint16
            )
        record = ([row for row, _ in pending], feats, frame_lengths, means, stds)
        pending = []
        count = 0
        if double_buffer:
            # fetch the PREVIOUS batch now — its readback rides the tunnel
            # while the compute just dispatched above runs on the device
            if inflight is not None:
                count = write_out(*inflight)
            inflight = record
        else:
            count = write_out(*record)
        return count

    for row, src in _work_list(rows, root, out_dir, "emg_path", overwrite, limit):
        emg = np.load(src)
        if emg.ndim != 2:
            logger.warning("Unexpected EMG shape %s for %s", emg.shape, src)
            continue
        if emg.shape[0] < cfg.n_fft:
            logger.warning("EMG too short (%d < n_fft) for %s", emg.shape[0], src)
            continue
        pending.append((row, emg.astype(np.float32)))
        if len(pending) >= batch_size:
            written += flush()
    written += flush()
    if inflight is not None:  # drain the double-buffer tail
        written += write_out(*inflight)
    logger.info("EMG processed: %d", written)
    return written


# ------------------------------------------------------------ teacher mode


TEACHER_SAMPLE_BUCKET = 16000  # 1 s at 16 kHz — executables cached per bucket


def process_teacher_rows(
    rows: List,
    root: Path,
    out_dir: Path,
    model_name: str,
    layer: int,
    sample_rate: int,
    overwrite: bool,
    limit: Optional[int] = None,
    batch_size: int = 8,
    teacher=None,
) -> int:
    """Extract WavLM layer hidden states for voiced rows; returns written.

    Unlike the reference's one-utterance-at-a-time torch loop
    (``src/data/preprocessing.py:148-197``), utterances are batched and
    padded to sample buckets so the TPU runs a handful of static-shape
    executables instead of recompiling per unique length; the masked
    forward keeps valid frames identical to the unpadded path.

    ``teacher`` injects a pre-built :class:`WavLMTeacher` (keeps jit caches
    and device-resident weights across calls — profiling/tests); default
    loads ``model_name``."""
    from ssd_tpu.data.audio import load_audio
    from ssd_tpu.models.wavlm import WavLMTeacher

    if teacher is None:
        teacher = WavLMTeacher.from_pretrained(model_name, layer=layer)
    written = 0
    pending: List[tuple] = []  # (row, waveform)

    def flush() -> int:
        nonlocal pending
        if not pending:
            return 0
        feats_list = teacher.extract_batch(
            [w for _, w in pending], sample_bucket=TEACHER_SAMPLE_BUCKET
        )
        count = 0
        for (row, _), feats in zip(pending, feats_list):
            feature_path, meta_path = _out_paths(out_dir, row.utterance_id)
            np.save(feature_path, feats)
            meta = {
                "utterance_id": row.utterance_id,
                "frames": int(feats.shape[0]),
                "dim": int(feats.shape[1]),
                "layer": layer,
                "model_name": model_name,
                "sample_rate": sample_rate,
                "frame_stride_sec": 0.02,  # WavLM conv stack stride
            }
            meta_path.write_text(json.dumps(meta, indent=2))
            count += 1
        pending = []
        return count

    for row, src in _work_list(rows, root, out_dir, "audio_path", overwrite, limit):
        pending.append((row, load_audio(src, target_sr=sample_rate)))
        if len(pending) >= batch_size:
            written += flush()
    written += flush()
    logger.info("Teacher processed: %d", written)
    return written


# -------------------------------------------------------------------- CLI


def _parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", choices=["emg", "teacher"], required=True)
    p.add_argument("--index", type=Path, required=True)
    p.add_argument("--root", type=Path, default=Path("data/emg_data"))
    p.add_argument("--out", type=Path, required=True)
    p.add_argument("--overwrite", action="store_true")
    p.add_argument("--limit", type=int)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--no-fused", action="store_true", help="Disable the Pallas kernel.")

    p.add_argument("--emg-sample-rate", type=int, default=1000)
    p.add_argument("--emg-n-fft", type=int, default=400)
    p.add_argument("--emg-hop-length", type=int, default=160)
    p.add_argument("--emg-n-mels", type=int, default=80)
    p.add_argument("--emg-normalize", choices=["per_file", "none"], default="per_file")
    p.add_argument(
        "--fetch-dtype", choices=["float32", "bfloat16"], default="float32",
        help="Device→host transfer dtype for EMG features (bfloat16 halves "
        "the fetch bytes on a bandwidth-bound link; on-disk .npy stays "
        "float32 either way).",
    )
    p.add_argument(
        "--no-double-buffer", action="store_true",
        help="Disable overlapping batch k's feature readback with batch "
        "k+1's device compute (A/B lever; output is identical).",
    )

    p.add_argument("--teacher-model", default="microsoft/wavlm-base-plus")
    p.add_argument("--teacher-layer", type=int, default=9)
    p.add_argument("--teacher-sample-rate", type=int, default=16000)
    return p.parse_args()


def main() -> None:
    from ssd_tpu.utils.config import setup_cli_logging

    setup_cli_logging()
    args = _parse_args()
    df = load_index(args.index)
    root = args.root.expanduser().resolve()
    out_dir = args.out.expanduser()
    rows = list(df.itertuples(index=False))

    if args.mode == "emg":
        cfg = FeaturizerConfig(
            sample_rate=args.emg_sample_rate,
            n_fft=args.emg_n_fft,
            hop_length=args.emg_hop_length,
            n_mels=args.emg_n_mels,
            normalize=args.emg_normalize,
        )
        process_emg_rows(
            rows,
            root,
            out_dir,
            cfg,
            overwrite=args.overwrite,
            batch_size=args.batch_size,
            fused=not args.no_fused,
            limit=args.limit,
            fetch_dtype=args.fetch_dtype,
            double_buffer=not args.no_double_buffer,
        )
    else:
        process_teacher_rows(
            rows,
            root,
            out_dir,
            model_name=args.teacher_model,
            layer=args.teacher_layer,
            sample_rate=args.teacher_sample_rate,
            overwrite=args.overwrite,
            limit=args.limit,
            batch_size=args.batch_size,
        )


if __name__ == "__main__":
    main()
