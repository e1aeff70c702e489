"""AOT model export: checkpoint → serialized StableHLO serving artifact.

Packages the full raw-EMG→token pipeline (on-device log-mel featurization,
Conformer encoder, CTC head, greedy decode) as `jax.export` artifacts — one
per (batch, samples) bucket, mirroring the engine's padding discipline — so
a serving fleet can run the model WITHOUT the Python model code, flax, or
the checkpoint restore path:

    python -m ssd_tpu.serving.export --checkpoint results/checkpoints/run/best \
        --out results/export/run
    ...
    t = ExportedTranscriber.load("results/export/run")
    texts = t.transcribe([emg])          # raw (samples, 8) float arrays

Artifact layout:

    manifest.json          buckets, channels, platform list, version info
    vocab.json             the checkpoint's vocab (decode happens host-side)
    fn_b{B}_l{L}.bin       serialized StableHLO per bucket

Notes:
* Exports are platform-locked by `jax.export` (recorded in the manifest);
  export on the deployment platform (TPU artifacts embed the fused Pallas
  featurizer's Mosaic custom call).
* Greedy decode only: beam search needs host traceback of backpointers, so
  beam deployments serve through `ssd_tpu.serving.server` instead.

The reference has no serving/export surface (SURVEY.md §2 — offline eval
only); this is a capability the TPU rebuild adds.
"""

from __future__ import annotations

import argparse
import json
import logging
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ssd_tpu.data.vocab import Vocab
from ssd_tpu.ops.ctc_decode import greedy_decode
from ssd_tpu.serving.engine import SAMPLE_BUCKET, InferenceEngine, _round_up

logger = logging.getLogger(__name__)

_MANIFEST = "manifest.json"


def _bucket_fn(engine: InferenceEngine, blank_bias: float):
    def fn(emg: jnp.ndarray, sample_lengths: jnp.ndarray):
        log_probs, out_lengths = engine._pipeline_impl(emg, sample_lengths)
        tokens, counts = greedy_decode(
            log_probs,
            out_lengths,
            blank_id=engine.vocab.blank_id,
            pad_id=engine.vocab.pad_id,
            blank_bias=blank_bias,
        )
        return tokens, counts

    return fn


def export_checkpoint(
    ckpt_path: Path,
    out_dir: Path,
    batch_sizes: Sequence[int] = (1, 8),
    sample_lengths: Sequence[int] = (SAMPLE_BUCKET, 4 * SAMPLE_BUCKET),
    vocab_path: Optional[Path] = None,
    blank_bias: float = 0.0,
    quantize: Optional[str] = None,
) -> Path:
    """Export one serialized function per (batch, samples) bucket.

    ``quantize="int8_prequant"`` embeds the weight-prequantized tree (int8
    kernels + scales) — the artifact's dense weights shrink ~4× vs fp32 and
    the exported forward pays only activation-side quantization.
    """
    from jax import export as jexport

    engine = InferenceEngine.from_checkpoint(
        Path(ckpt_path), vocab_path=vocab_path, decoder="greedy",
        quantize=quantize,
    )
    channels = int(engine.cfg["model"]["encoder"]["input_dim"]) // engine.feat_cfg.n_mels
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    fn = _bucket_fn(engine, blank_bias)
    buckets: List[Dict] = []
    platforms = None
    for b in batch_sizes:
        for L in sample_lengths:
            args = (
                jax.ShapeDtypeStruct((b, int(L), channels), jnp.float32),
                jax.ShapeDtypeStruct((b,), jnp.int32),
            )
            exported = jexport.export(jax.jit(fn))(*args)
            platforms = list(exported.platforms)
            name = f"fn_b{b}_l{int(L)}.bin"
            (out_dir / name).write_bytes(exported.serialize())
            buckets.append({"batch": int(b), "samples": int(L), "file": name})
            logger.info("exported %s (platforms=%s)", name, platforms)

    engine.vocab.to_json(out_dir / "vocab.json")
    manifest = {
        "format": "ssd_tpu.jax_export.v1",
        "channels": channels,
        "sample_bucket": SAMPLE_BUCKET,
        "blank_bias": blank_bias,
        "buckets": buckets,
        "platforms": platforms,
        "jax_version": jax.__version__,
        "checkpoint": str(ckpt_path),
        "decoder": "greedy",
        "quantize": quantize or "none",
    }
    (out_dir / _MANIFEST).write_text(json.dumps(manifest, indent=2))
    logger.info("wrote %s (%d buckets)", out_dir / _MANIFEST, len(buckets))
    return out_dir


class ExportedTranscriber:
    """Serve from an exported artifact directory — no model code needed."""

    def __init__(self, manifest: Dict, fns: Dict[Tuple[int, int], object], vocab: Vocab):
        self.manifest = manifest
        self._fns = fns
        self.vocab = vocab
        self._batches = sorted({b for b, _ in fns})
        self._lengths = sorted({l for _, l in fns})

    @classmethod
    def load(cls, path: Path) -> "ExportedTranscriber":
        from jax import export as jexport

        path = Path(path)
        manifest = json.loads((path / _MANIFEST).read_text())
        backend = jax.default_backend()
        platforms = manifest.get("platforms") or []
        if platforms and backend not in platforms:
            # deserialization failure downstream would be a cryptic XLA
            # error; say what actually happened
            raise RuntimeError(
                f"artifact at {path} was exported for platforms {platforms} "
                f"but this process runs on {backend!r}; re-export on the "
                "deployment platform (jax.export artifacts are platform-locked)"
            )
        fns = {}
        for bucket in manifest["buckets"]:
            data = (path / bucket["file"]).read_bytes()
            fns[(bucket["batch"], bucket["samples"])] = jexport.deserialize(
                bytearray(data)
            )
        vocab = Vocab.from_json(path / "vocab.json")
        return cls(manifest, fns, vocab)

    def _pick_bucket(self, n: int, max_len: int) -> Tuple[int, int]:
        bs = [b for b in self._batches if b >= n]
        ls = [l for l in self._lengths if l >= max_len]
        if not bs or not ls:
            raise ValueError(
                f"no exported bucket fits batch={n}, samples={max_len}; "
                f"have batches {self._batches}, lengths {self._lengths}"
            )
        return bs[0], ls[0]

    def transcribe(self, emg_arrays: Sequence[np.ndarray]) -> List[str]:
        channels = self.manifest["channels"]
        n = len(emg_arrays)
        max_len = max(a.shape[0] for a in emg_arrays)
        b, L = self._pick_bucket(n, max_len)
        batch = np.zeros((b, L, channels), np.float32)
        lengths = np.zeros((b,), np.int32)
        for i, a in enumerate(emg_arrays):
            if a.shape[1] != channels:
                raise ValueError(f"expected {channels} channels, got {a.shape[1]}")
            batch[i, : a.shape[0]] = a
            lengths[i] = a.shape[0]
        fn = self._fns[(b, L)]
        tokens, counts = fn.call(jnp.asarray(batch), jnp.asarray(lengths))
        tokens = np.asarray(tokens)
        counts = np.asarray(counts)
        return [self.vocab.decode(tokens[i, : counts[i]]) for i in range(n)]


def main(argv: Optional[Sequence[str]] = None) -> None:
    logging.basicConfig(level=logging.INFO, format="%(levelname)s: %(message)s", force=True)
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--checkpoint", required=True, type=Path)
    p.add_argument("--out", required=True, type=Path)
    p.add_argument("--vocab", type=Path, default=None)
    p.add_argument("--batch-sizes", type=int, nargs="+", default=[1, 8])
    p.add_argument(
        "--sample-lengths", type=int, nargs="+",
        default=[SAMPLE_BUCKET, 4 * SAMPLE_BUCKET],
        help=f"raw-sample buckets (engine convention: multiples of {SAMPLE_BUCKET})",
    )
    p.add_argument("--blank-bias", type=float, default=0.0)
    p.add_argument(
        "--quantize", choices=["none", "int8", "int8_prequant"], default=None,
        help="Quantize the exported forward (int8_prequant embeds int8 "
        "kernels + scales — ~4× smaller dense weights than fp32).",
    )
    args = p.parse_args(argv)
    export_checkpoint(
        args.checkpoint, args.out,
        batch_sizes=args.batch_sizes, sample_lengths=args.sample_lengths,
        vocab_path=args.vocab, blank_bias=args.blank_bias,
        quantize=None if args.quantize in (None, "none") else args.quantize,
    )


if __name__ == "__main__":
    main()
