"""Evaluation CLI: load a checkpoint, decode, compute WER/CER.

Surface parity with reference ``src/evaluation/evaluate.py``:

  python -m ssd_tpu.evaluation.evaluate --checkpoint results/checkpoints/run/best \
      --decoder beam --beam-width 50 [--splits …] [--subsets …]

* config comes from the ``config.json`` stored next to the checkpoint
  (reference embeds it in the ``.pt`` payload, ``evaluate.py:183-184``);
* knob precedence: CLI > checkpoint-config ``decoding`` block > defaults
  (greedy: width 0 / α 0; beam: width 50 / α 0.6 / prune −10,
  reference ``:196-211``);
* artifacts: ``metrics.json`` (wer/cer + error breakdown + decoder + data
  blocks), ``predictions.jsonl``, ``config_used.json`` (reference
  ``:324-328``), plus decode-latency percentiles (BASELINE.md p50 target).

The forward pass and the beam search both run jitted on TPU; the host only
materializes strings.
"""

from __future__ import annotations

import argparse
import json
import logging
import time
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ssd_tpu.data.dataset import make_dataloader, prefetch
from ssd_tpu.data.vocab import Vocab
from ssd_tpu.decoding.ctc import build_decoder
from ssd_tpu.evaluation.metrics import compute_error_breakdown, compute_metrics
from ssd_tpu.models.ssd_model import build_model
from ssd_tpu.training.checkpoint import load_checkpoint, load_config_for

logger = logging.getLogger(__name__)


def make_forward(model, featurize_cfg=None):
    """Jitted eval forward; ``featurize_cfg`` adds on-device log-mel so raw
    (samples, channels) batches evaluate (``data.train_from_raw``)."""

    @jax.jit
    def forward(params, batch_stats, emg, lengths):
        if featurize_cfg is not None:
            from ssd_tpu.ops.featurizer import logmel_batch
            from ssd_tpu.utils.platform import is_tpu_backend

            feats, lengths, _, _ = logmel_batch(
                emg, lengths, featurize_cfg, fused=is_tpu_backend()
            )
            B, T, C, M = feats.shape
            emg = feats.reshape(B, T, C * M)
        log_probs, out_lengths, _ = model.apply(
            {"params": params, "batch_stats": batch_stats}, emg, lengths, train=False
        )
        return log_probs, out_lengths

    return forward


def evaluate_checkpoint(
    ckpt_path: Path,
    cfg: Dict[str, Any],
    vocab: Vocab,
    splits,
    subsets,
    decoder_fn,
    batch_size: int = 4,
    index_path: Optional[Path] = None,
    features_root: Optional[Path] = None,
    data_parallel: bool = False,
) -> Dict[str, Any]:
    """Run decode over the eval set; returns metrics + records + latencies.

    Checkpoints trained with ``data.train_from_raw`` (no EMG feature cache)
    evaluate from the raw signals: the loader runs in raw mode and the
    forward featurizes on device with the config's ``features.emg`` block —
    the same path the trainer used.

    ``data_parallel`` shards each batch over every local device (the shared
    ``(data, model=1)`` mesh, params replicated); the forward AND the jitted
    decode run SPMD, so eval throughput scales with the chip count. Batches
    are zero-padded up to a mesh multiple (safe non-zero pad lengths, same
    trick as serving) and the pad hypotheses are dropped.
    """
    data_cfg = cfg["data"]
    index_path = index_path or Path(data_cfg["index"])
    features_root = features_root or Path(data_cfg["features_root"])
    train_from_raw = bool(data_cfg.get("train_from_raw", False))
    feat_cfg = None
    if train_from_raw:
        from ssd_tpu.ops.featurizer import FeaturizerConfig

        femg = cfg.get("features", {}).get("emg", {}) or {}
        feat_cfg = FeaturizerConfig(
            sample_rate=int(femg.get("sample_rate", 1000)),
            n_fft=int(femg.get("n_fft", 320)),
            hop_length=int(femg.get("hop_length", 10)),
            n_mels=int(femg.get("n_mels", 80)),
            normalize=femg.get("normalize", "per_file"),
        )

    loader = make_dataloader(
        index_path=index_path,
        features_root=features_root,
        splits=splits,
        subsets=subsets,
        vocab=vocab,
        batch_size=batch_size,
        shuffle=False,
        include_teacher=False,
        raw=train_from_raw,
        raw_hop_length=(feat_cfg.hop_length if feat_cfg else 10),
    )
    if len(loader) == 0:
        raise ValueError(
            f"No samples for splits {splits} subsets {subsets}. Voiced uses "
            "train/val/test; silent uses the same MD5 subsets."
        )

    # input_dim: config if present, else probe the first feature
    enc_cfg = cfg["model"]["encoder"]
    input_dim = enc_cfg.get("input_dim")
    if input_dim is None:
        if train_from_raw:
            input_dim = loader.dataset.get(0)["emg"].shape[1] * feat_cfg.n_mels
        else:
            input_dim = loader.dataset.get(0)["emg"].shape[1]
        enc_cfg["input_dim"] = int(input_dim)

    model = build_model(cfg, input_dim=int(input_dim), vocab_size=vocab.size)
    payload = load_checkpoint(ckpt_path)
    params, batch_stats = payload["params"], payload["batch_stats"]
    # weight-only pre-quantization (quantize: int8_prequant): float kernels
    # → int8 + per-channel scales, once at load (ops/quant.py)
    from ssd_tpu.ops.quant import maybe_prequantize

    params = maybe_prequantize(params, model.encoder_cfg)
    forward = make_forward(model, featurize_cfg=feat_cfg)

    mesh = None
    if data_parallel:
        if len(jax.devices()) > 1:
            from ssd_tpu.parallel.mesh import make_mesh, replicated

            mesh = make_mesh()
            logger.info("Data-parallel eval over %d devices", mesh.size)
            rep = replicated(mesh)
            params = jax.device_put(params, rep)
            batch_stats = jax.device_put(batch_stats, rep)
        else:
            logger.warning(
                "--data-parallel requested but only 1 device is visible — "
                "running single-device"
            )

    refs: List[str] = []
    hyps: List[str] = []
    records: List[Dict] = []
    decode_latencies: List[float] = []

    for batch in prefetch(loader):
        emg, lengths = batch.emg, batch.emg_lengths
        if mesh is not None:
            from ssd_tpu.parallel.mesh import batch_sharding, pad_batch_to_multiple

            (emg, lengths), B = pad_batch_to_multiple((emg, lengths), mesh.size)
            # pad rows need a valid non-zero length (all-masked attention
            # rows are NaN): one STFT window of zeros in raw mode, a few
            # zero frames otherwise; their hypotheses are sliced off below
            lengths[B:] = feat_cfg.n_fft if feat_cfg is not None else 8
            sh = batch_sharding(mesh)
            emg, lengths = jax.device_put(emg, sh), jax.device_put(lengths, sh)
        else:
            emg, lengths = jnp.asarray(emg), jnp.asarray(lengths)
        log_probs, out_lengths = forward(params, batch_stats, emg, lengths)
        log_probs.block_until_ready()
        t0 = time.perf_counter()
        batch_hyps = decoder_fn(log_probs, out_lengths)
        decode_latencies.append((time.perf_counter() - t0) / batch.size)
        for uid, ref, hyp in zip(batch.utterance_ids, batch.transcripts, batch_hyps):
            refs.append(ref)
            hyps.append(hyp)
            records.append({"utterance_id": uid, "ref": ref, "hyp": hyp})

    metrics = compute_metrics(refs, hyps)
    metrics["error_breakdown"] = compute_error_breakdown(refs, hyps)
    lat = np.asarray(decode_latencies)
    metrics["decode_latency_sec"] = {
        "p50": float(np.percentile(lat, 50)),
        "p90": float(np.percentile(lat, 90)),
        "mean": float(lat.mean()),
    }
    return {"metrics": metrics, "records": records}


def apply_device_choice(choice: str) -> None:
    """Map ``--device`` onto the runtime's actual platform.

    ``cpu`` pins the CPU backend. ``tpu`` means "the attached accelerator",
    which may register under a different platform name (the tunneled backend
    on this image registers as ``axon``), so instead of pinning the literal
    string — which would throw on any such runtime — we validate that a
    non-CPU accelerator is actually present and let JAX's default backend
    selection use it.
    """
    if choice == "cpu":
        jax.config.update("jax_platforms", "cpu")
        return
    platform = jax.devices()[0].platform  # initializes the default backend
    if platform == "cpu":
        raise SystemExit(
            f"--device {choice} requested but only CPU devices are available"
        )


def _parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description="Evaluate a trained checkpoint.")
    p.add_argument("--checkpoint", type=Path, required=True)
    p.add_argument("--index", type=Path)
    p.add_argument("--features-root", type=Path)
    p.add_argument("--splits", nargs="+", default=None)
    p.add_argument("--subsets", nargs="+", default=None)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument(
        "--device",
        choices=["cpu", "tpu"],
        help="Force a backend (reference parity: cpu/mps/cuda; auto if unset).",
    )
    p.add_argument("--output", type=Path)
    p.add_argument("--run-name", type=str)
    p.add_argument("--decoder", choices=["greedy", "beam"], default=None)
    p.add_argument("--lm-path", type=Path)
    p.add_argument("--beam-width", type=int)
    p.add_argument("--alpha", type=float)
    p.add_argument("--beta", type=float)
    p.add_argument("--beam-prune-logp", type=float)
    p.add_argument("--blank-bias", type=float, default=0.0)
    p.add_argument(
        "--token-top-k",
        type=int,
        help="Per-frame candidate preselection for the device beam search "
        "(exact when ≤k tokens pass token_min_logp; 0/unset = exact sort). "
        "The serving/bench production path uses 16.",
    )
    p.add_argument(
        "--compile-cache", type=Path, default=None,
        help="Persistent XLA compilation cache dir (default: env "
        "SSD_COMPILE_CACHE).",
    )
    p.add_argument(
        "--quantize",
        choices=["none", "int8", "int8_prequant"],
        help="Inference-time dense quantization (ops/quant.py): int8 serves "
        "any float checkpoint W8A8 on the FFN/pointwise matmuls — same "
        "param tree; int8_prequant converts the kernels once at load "
        "(int8 + per-channel scales) so the forward pays only the "
        "activation-side quantization. Default: the checkpoint config's "
        "encoder.quantize. Measured at flagship/large/xl shapes in "
        "docs/PERF.md.",
    )
    p.add_argument(
        "--lm-backend",
        choices=["device", "host"],
        default="device",
        help="LM-fused decoding backend: on-device hashed-table fusion "
        "(default) or the host prefix-search oracle.",
    )
    p.add_argument(
        "--data-parallel",
        action="store_true",
        help="Shard eval batches over every local device (SPMD forward + "
        "decode); eval throughput scales with the chip count.",
    )
    return p.parse_args()


def main() -> None:
    from ssd_tpu.utils.config import setup_cli_logging

    setup_cli_logging()
    args = _parse_args()
    if args.device:
        apply_device_choice(args.device)
    from ssd_tpu.utils.platform import enable_compile_cache

    enable_compile_cache(str(args.compile_cache) if args.compile_cache else None)
    ckpt_path = args.checkpoint
    cfg = load_config_for(ckpt_path)
    if args.quantize is not None:
        cfg["model"]["encoder"]["quantize"] = args.quantize
    data_cfg = cfg["data"]

    splits = args.splits or data_cfg.get("val_splits", ["voiced_parallel_data"])
    default_subsets = data_cfg.get("eval_subsets") or data_cfg.get("val_subsets") or ["val"]
    subsets = args.subsets if args.subsets is not None else default_subsets

    vocab = Vocab.from_json(Path(data_cfg["vocab"]))

    decoding_cfg = cfg.get("decoding", {}) or {}
    decoder_type = args.decoder or decoding_cfg.get("type", "greedy")
    lm_path = args.lm_path or decoding_cfg.get("lm_path")
    beam_width = args.beam_width if args.beam_width is not None else decoding_cfg.get("beam_width")
    if beam_width is None:
        beam_width = 0 if decoder_type == "greedy" else 50
    alpha = args.alpha if args.alpha is not None else decoding_cfg.get("alpha")
    beta = args.beta if args.beta is not None else decoding_cfg.get("beta")
    if alpha is None:
        alpha = 0.0 if decoder_type == "greedy" else 0.6
    if beta is None:
        beta = 0.0
    prune = (
        args.beam_prune_logp
        if args.beam_prune_logp is not None
        else decoding_cfg.get("beam_prune_logp")
    )
    if prune is None:
        prune = -10.0
    blank_bias = float(args.blank_bias)
    token_top_k = (
        args.token_top_k
        if args.token_top_k is not None
        else decoding_cfg.get("token_top_k")
    )
    token_top_k = int(token_top_k) if token_top_k else None

    decoder_fn = build_decoder(
        method=decoder_type,
        vocab=vocab,
        lm_path=Path(lm_path) if lm_path else None,
        beam_width=int(beam_width),
        alpha=float(alpha),
        beta=float(beta),
        beam_prune_logp=float(prune),
        blank_bias=blank_bias,
        token_top_k=token_top_k,
        host_lm=args.lm_backend == "host",
    )
    logger.info(
        "Decoder: %s | LM: %s | width %s | α %.2f β %.2f | prune %.1f | blank_bias %.2f | top_k %s",
        decoder_type, lm_path or "none", beam_width, alpha, beta, prune, blank_bias,
        token_top_k or "exact",
    )

    out = evaluate_checkpoint(
        ckpt_path,
        cfg,
        vocab,
        splits,
        subsets,
        decoder_fn,
        batch_size=args.batch_size,
        index_path=args.index,
        features_root=args.features_root,
        data_parallel=args.data_parallel,
    )
    metrics, records = out["metrics"], out["records"]
    metrics["decoder"] = {
        "type": decoder_type,
        "beam_width": beam_width if decoder_type == "beam" else None,
        "alpha": alpha if decoder_type == "beam" else None,
        "beta": beta if decoder_type == "beam" else None,
        "beam_prune_logp": prune if decoder_type == "beam" else None,
        "blank_bias": blank_bias,
        "token_top_k": token_top_k if decoder_type == "beam" else None,
        "lm_path": str(lm_path) if lm_path else None,
    }
    metrics["data"] = {
        "splits": list(splits),
        "subsets": list(subsets) if subsets else None,
        "num_samples": len(records),
    }
    run_name = args.run_name or cfg.get("logging", {}).get("run_name", "eval_run")
    metrics["run_name"] = run_name
    out_dir = args.output or Path("results/eval") / run_name
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / "config_used.json").write_text(json.dumps(cfg, indent=2))
    (out_dir / "metrics.json").write_text(json.dumps(metrics, indent=2))
    with (out_dir / "predictions.jsonl").open("w") as f:
        for rec in records:
            f.write(json.dumps(rec) + "\n")
    logger.info("WER %.4f | CER %.4f | outputs: %s", metrics["wer"], metrics["cer"], out_dir)


if __name__ == "__main__":
    main()
