"""Inference engine: raw EMG → text, end-to-end on device.

The reference stops at offline evaluation; this engine packages the full
chain for serving — fused log-mel featurization (Pallas), Conformer encoder,
and greedy or batched beam CTC decoding — behind one call:

    engine = InferenceEngine.from_checkpoint("results/checkpoints/run/best")
    hyps = engine.transcribe([emg1, emg2])   # raw (samples, channels) arrays

Design points:

* one jitted graph per (batch, time) bucket: raw samples pad to
  ``SAMPLE_BUCKET`` multiples, batches to fixed sizes {1, 4, 8, …} — a small
  warm-up enumerates them so production requests never hit a compile;
* featurization happens on device from raw EMG (no feature cache needed);
* per-request latency statistics kept for observability.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from ssd_tpu.utils.platform import is_tpu_backend
import numpy as np

from ssd_tpu.data.vocab import Vocab
from ssd_tpu.models.ssd_model import build_model
from ssd_tpu.ops.ctc_decode import beam_search, greedy_decode, traceback
from ssd_tpu.ops.featurizer import FeaturizerConfig, logmel_batch
from ssd_tpu.training.checkpoint import load_checkpoint, load_config_for

logger = logging.getLogger(__name__)

SAMPLE_BUCKET = 2560  # raw-sample padding granularity (256 frames @ hop 10)
BATCH_BUCKETS = (1, 4, 8)


def _round_up(n: int, m: int) -> int:
    return max(m, ((n + m - 1) // m) * m)


@dataclass
class LatencyStats:
    samples: List[float] = field(default_factory=list)

    def record(self, seconds: float) -> None:
        self.samples.append(seconds)
        if len(self.samples) > 10000:
            del self.samples[: len(self.samples) // 2]

    def summary(self) -> Dict[str, float]:
        if not self.samples:
            return {}
        arr = np.asarray(self.samples)
        return {
            "count": int(arr.size),
            "p50_ms": float(np.percentile(arr, 50) * 1e3),
            "p90_ms": float(np.percentile(arr, 90) * 1e3),
            "p99_ms": float(np.percentile(arr, 99) * 1e3),
            "mean_ms": float(arr.mean() * 1e3),
        }


class InferenceEngine:
    """Raw 8-channel EMG → text."""

    def __init__(
        self,
        cfg: Dict[str, Any],
        params,
        batch_stats,
        vocab: Vocab,
        decoder: str = "greedy",
        beam_width: int = 50,
        blank_bias: float = 0.0,
        token_top_k: Optional[int] = None,
        lm_path: Optional[Path] = None,
        alpha: Optional[float] = None,
        beta: Optional[float] = None,
        featurizer_cfg: Optional[FeaturizerConfig] = None,
        data_parallel: bool = False,
        quantize: Optional[str] = None,
    ) -> None:
        # inference-time quantization override (serving CLI --quantize):
        # any float checkpoint can be served int8 — same param tree
        if quantize is not None:
            import copy

            cfg = copy.deepcopy(cfg)
            cfg["model"]["encoder"]["quantize"] = quantize
        self.cfg = cfg
        self.vocab = vocab
        self.decoder = decoder
        self.beam_width = beam_width
        self.blank_bias = blank_bias
        # data-parallel serving: shard request batches over every local
        # device (the shared (data, model=1) mesh); XLA runs the pipeline
        # SPMD and the decode jits inherit the sharding from their inputs
        self.mesh = None
        if data_parallel:
            if len(jax.devices()) > 1:
                from ssd_tpu.parallel.mesh import make_mesh

                self.mesh = make_mesh()
                logger.info("Data-parallel serving over %d devices", self.mesh.size)
            else:
                logger.warning(
                    "data_parallel requested but only 1 device is visible — "
                    "serving single-device"
                )
        # fast-path preselection: constructor arg > config decoding block >
        # default 16 (exact when ≤k tokens pass admission; eval CLI exposes
        # the same knob via --token-top-k / decoding.token_top_k)
        if token_top_k is None:
            token_top_k = (cfg.get("decoding", {}) or {}).get("token_top_k", 16)
        self.token_top_k = min(int(token_top_k), vocab.size) if token_top_k else None
        # on-device LM fusion: constructor arg > config decoding block
        decoding_cfg = cfg.get("decoding", {}) or {}
        lm_path = lm_path or decoding_cfg.get("lm_path")
        # constructor arg > checkpoint-config decoding block > default —
        # args default to None so tuned config weights are actually honored
        self.alpha = float(alpha if alpha is not None else decoding_cfg.get("alpha", 0.5))
        self.beta = float(beta if beta is not None else decoding_cfg.get("beta", 0.0))
        self.lm_table = None
        if lm_path and decoder == "beam":
            if Path(lm_path).exists():
                from ssd_tpu.decoding.device_lm import load_packed_lm

                self.lm_table = load_packed_lm(Path(lm_path), vocab)
                logger.info("Serving with on-device LM fusion: %s", lm_path)
            else:
                # loud: a typo'd path silently serving LM-free would ship a
                # WER regression that looks like "no LM configured"
                logger.warning(
                    "LM path %s does not exist — serving WITHOUT LM fusion",
                    lm_path,
                )
        feat_cfg = cfg.get("features", {}).get("emg", {})
        self.feat_cfg = featurizer_cfg or FeaturizerConfig(
            sample_rate=feat_cfg.get("sample_rate", 1000),
            n_fft=feat_cfg.get("n_fft", 320),
            hop_length=feat_cfg.get("hop_length", 10),
            n_mels=feat_cfg.get("n_mels", 80),
            normalize=feat_cfg.get("normalize", "per_file"),
        )
        enc_cfg = cfg["model"]["encoder"]
        input_dim = enc_cfg.get("input_dim")
        if input_dim is None:
            raise ValueError("encoder.input_dim required for serving")
        self.model = build_model(cfg, input_dim=int(input_dim), vocab_size=vocab.size)
        # weight-only pre-quantization when quantize == int8_prequant:
        # convert the float checkpoint's eligible kernels ONCE (int8 +
        # per-channel scales) so the forward pays only activation-side
        # quantization (ops/quant.py)
        from ssd_tpu.ops.quant import maybe_prequantize

        params = maybe_prequantize(params, self.model.encoder_cfg)
        self.params = params
        self.batch_stats = batch_stats
        self.stats = LatencyStats()
        self._pipeline = jax.jit(self._pipeline_impl, static_argnames=())

    # ------------------------------------------------------------ factory
    @classmethod
    def from_checkpoint(
        cls, ckpt_path: Path, vocab_path: Optional[Path] = None, **kwargs
    ) -> "InferenceEngine":
        cfg = load_config_for(Path(ckpt_path))
        payload = load_checkpoint(Path(ckpt_path))
        vocab = Vocab.from_json(vocab_path or Path(cfg["data"]["vocab"]))
        return cls(cfg, payload["params"], payload["batch_stats"], vocab, **kwargs)

    # ----------------------------------------------------------- pipeline
    def _pipeline_impl(self, emg: jnp.ndarray, sample_lengths: jnp.ndarray):
        """(B, L, C) raw EMG → (log_probs, out_lengths)."""
        # fused Pallas featurizer on a single chip; under data-parallel
        # serving the batch arrives SHARDED and pallas_call has no GSPMD
        # partitioning rule, so DP uses the XLA featurizer (which GSPMD
        # partitions cleanly) — the featurizer is a small share of the
        # pipeline next to the encoder
        feats, frame_lengths, _, _ = logmel_batch(
            emg, sample_lengths, self.feat_cfg,
            fused=is_tpu_backend() and self.mesh is None,
        )
        B, T, C, M = feats.shape
        flat = feats.reshape(B, T, C * M)
        log_probs, out_lengths, _ = self.model.apply(
            {"params": self.params, "batch_stats": self.batch_stats},
            flat,
            frame_lengths,
            train=False,
        )
        return log_probs, out_lengths

    def _decode(self, log_probs, out_lengths, decoder: Optional[str] = None) -> List[str]:
        """Decode log-probs with ``decoder`` (default: the engine's setting).

        The override exists so callers (e.g. streaming ``finish(beam=True)``)
        can request a one-off beam pass WITHOUT mutating shared engine state —
        ``self.decoder`` is read concurrently by the micro-batcher thread.
        """
        decoder = decoder or self.decoder
        if decoder == "beam" and self.lm_table is not None:
            from ssd_tpu.decoding.device_lm import beam_decode_lm_device

            return beam_decode_lm_device(
                log_probs,
                out_lengths,
                self.vocab,
                self.lm_table,
                beam_width=self.beam_width,
                alpha=self.alpha,
                beta=self.beta,
                blank_bias=self.blank_bias,
                token_top_k=self.token_top_k,
            )
        if decoder == "beam":
            chars, parents, _ = beam_search(
                log_probs,
                out_lengths,
                blank_id=self.vocab.blank_id,
                pad_id=self.vocab.pad_id,
                beam_width=self.beam_width,
                blank_bias=self.blank_bias,
                token_top_k=self.token_top_k,
            )
            prefixes = traceback(np.asarray(chars), np.asarray(parents), 0)
            return [self.vocab.decode(p) for p in prefixes]
        toks, counts = greedy_decode(
            log_probs,
            out_lengths,
            blank_id=self.vocab.blank_id,
            pad_id=self.vocab.pad_id,
            blank_bias=self.blank_bias,
        )
        toks, counts = np.asarray(toks), np.asarray(counts)
        return [self.vocab.decode(toks[i, : counts[i]]) for i in range(len(counts))]

    # ------------------------------------------------------------- public
    def transcribe(self, emg_arrays: Sequence[np.ndarray]) -> List[str]:
        """Transcribe a list of raw (samples, channels) float arrays."""
        t0 = time.perf_counter()
        n = len(emg_arrays)
        if n == 0:
            return []
        lengths = np.asarray([len(a) for a in emg_arrays], np.int32)
        L_pad = _round_up(int(lengths.max()), SAMPLE_BUCKET)
        B_pad = next((b for b in BATCH_BUCKETS if b >= n), _round_up(n, BATCH_BUCKETS[-1]))
        if self.mesh is not None:
            B_pad = _round_up(B_pad, self.mesh.size)  # batch axis must shard
        C = emg_arrays[0].shape[1]
        batch = np.zeros((B_pad, L_pad, C), np.float32)
        for i, a in enumerate(emg_arrays):
            batch[i, : len(a)] = a
        pad_lengths = np.concatenate(
            [lengths, np.full((B_pad - n,), self.feat_cfg.n_fft, np.int32)]
        )
        if self.mesh is not None:
            from ssd_tpu.parallel.mesh import batch_sharding

            sharding = batch_sharding(self.mesh)  # leading-axis P("data")
            dev_batch = jax.device_put(batch, sharding)
            dev_lengths = jax.device_put(pad_lengths, sharding)
        else:
            dev_batch, dev_lengths = jnp.asarray(batch), jnp.asarray(pad_lengths)
        log_probs, out_lengths = self._pipeline(dev_batch, dev_lengths)
        hyps = self._decode(log_probs, out_lengths)[:n]
        per_utt = (time.perf_counter() - t0) / n
        for _ in range(n):
            self.stats.record(per_utt)
        return hyps

    def warmup(self, max_seconds: float = 12.0, grid: bool = False) -> None:
        """Pre-compile serving executables so requests never hit a compile.

        Default: every batch bucket at the longest sample bucket (fast
        startup; requests at SHORTER length buckets still compile on first
        hit — measured as the p99 outliers in docs/PERF.md "Serving under
        concurrent load"). ``grid=True`` compiles every (batch × length)
        bucket up to ``max_seconds`` — slower startup, flat p99; with a
        persistent compile cache the cost is paid once per deployment.
        """
        C = int(self.cfg["model"]["encoder"]["input_dim"]) // self.feat_cfg.n_mels
        max_samples = int(max_seconds * self.feat_cfg.sample_rate)
        if grid:
            top = _round_up(max_samples, SAMPLE_BUCKET)  # cover max_seconds
            lengths = list(range(SAMPLE_BUCKET, top + 1, SAMPLE_BUCKET))
        else:
            lengths = [max_samples]
        for n_samples in lengths:
            for b in BATCH_BUCKETS:
                arrays = [np.zeros((n_samples, C), np.float32)] * b
                self.transcribe(arrays)
        self.stats.samples.clear()


class StreamingTranscriber:
    """Incremental transcription over a growing EMG stream.

    Append raw samples with :meth:`feed`; every ``update_every_sec`` of new
    audio the engine re-runs the full pipeline over the buffered signal
    (bucket-padded, so the jit cache is bounded) and returns the refreshed
    hypothesis. Full recompute is the honest strategy for a bidirectional
    Conformer — at ≤30 s utterances a pipeline pass is a few ms on TPU, well
    under the update interval.
    """

    def __init__(self, engine: InferenceEngine, update_every_sec: float = 0.5):
        self.engine = engine
        self.update_samples = int(update_every_sec * engine.feat_cfg.sample_rate)
        self._chunks: List[np.ndarray] = []
        self._since_update = 0
        self.hypothesis = ""

    def feed(self, samples: np.ndarray) -> Optional[str]:
        """Append (n, C) samples; returns a new hypothesis when refreshed."""
        self._chunks.append(np.asarray(samples, np.float32))
        self._since_update += len(samples)
        total = sum(len(c) for c in self._chunks)
        if self._since_update < self.update_samples or total < self.engine.feat_cfg.n_fft:
            return None
        self._since_update = 0
        emg = np.concatenate(self._chunks, axis=0)
        self.hypothesis = self.engine.transcribe([emg])[0]
        return self.hypothesis

    def finish(self) -> str:
        """Final hypothesis over the complete stream."""
        if self._chunks:
            emg = np.concatenate(self._chunks, axis=0)
            if len(emg) >= self.engine.feat_cfg.n_fft:
                self.hypothesis = self.engine.transcribe([emg])[0]
        return self.hypothesis

    def reset(self) -> None:
        self._chunks.clear()
        self._since_update = 0
        self.hypothesis = ""
