"""Chunked streaming transcription with bounded recompute.

The plain :class:`~ssd_tpu.serving.engine.StreamingTranscriber` re-runs the
full pipeline over the whole buffered stream at every update — fine for
utterance-length streams (≤ ~30 s), O(T²) for unbounded ones. This module
bounds per-update compute to a CONSTANT: each update encodes one fixed-shape
window

    [ left context W | new chunk S | lookahead R ]   (frames, all even)

and emits CTC outputs only for the chunk region, whose frames have W frames
of history and R frames of future context. Everything is static-shaped, so
the whole update is ONE jitted device call compiled exactly once:

    raw window samples ─ featurize (Pallas/XLA) ─ running z-norm ─ encoder
    ─ CTC head ─ log-probs  +  updated normalization statistics

Streaming is inherently approximate for a bidirectional Conformer + per-file
feature normalization; the departures from the offline pipeline are explicit:

* **attention context** is truncated to [W left, R right] for emitted frames
  (offline attends over the whole utterance);
* **per-file z-normalization** (``preprocessing.py:59-64`` in the reference)
  becomes a *running* z-norm: mean/std over all frames seen so far, updated
  on device each chunk. At end-of-stream the statistics equal the per-file
  ones, so a stream short enough to fit one window decodes EXACTLY like the
  offline path (tested);
* **the 80 dB dynamic-range clip** (librosa ``power_to_db``) is applied per
  window rather than per file.

Alignment: window starts are kept congruent to 0 mod ``subsample_factor`` so
the strided-conv subsampler sees the same phase it would offline — emitted
frame j of a window starting at frame ``a`` is exactly offline output frame
``a/subsample + j`` when the inputs match.

The reference has no streaming surface at all (SURVEY.md §2 — offline eval
only); this is a serving capability the TPU rebuild adds on top.
"""

from __future__ import annotations

import logging
from typing import List, Optional

import jax
import jax.numpy as jnp

from ssd_tpu.utils.platform import is_tpu_backend
import numpy as np

from ssd_tpu.ops.featurizer import FeaturizerConfig, logmel_batch

logger = logging.getLogger(__name__)


def collapse_ids(ids, carry: int, blank_id: int, pad_id: int) -> tuple[List[int], int]:
    """CTC-collapse a run of per-frame argmax ids against a carried token.

    ``carry`` is the previous run's final raw id (or ``blank_id`` at start):
    a chunk that begins with the same token its predecessor ended with is one
    repeated emission, not two. Returns (emitted token ids, new carry).
    """
    out: List[int] = []
    for t in ids:
        t = int(t)
        if t != carry and t != blank_id and t != pad_id:
            out.append(t)
        carry = t
    return out, carry


def _make_window_fn(engine, feat_cfg: FeaturizerConfig, Tw: int, S: int):
    """Jitted streaming update for one window geometry, closed over ENGINE.

    raw: (1, Lw, C) float32 window samples (zero-padded right).
    n_samples: (1,) valid sample count.
    chunk_start: () int32 — first NEW frame within the window.
    prior_mean / prior_meansq / prior_cnt: () float32 running normalization
      statistics from before this chunk, in MOMENT form. The host keeps the
      authoritative (sum, sumsq, count) in float64/int (unbounded streams
      overflow or lose precision in on-device fp32/int32 accumulators); the
      device only ever sees O(1)-magnitude moments plus a float32 count,
      whose 2⁻²⁴ relative error is harmless in a mean.

    Returns (log_probs, out_length, chunk_sum, chunk_sumsq, chunk_cnt) — the
    NEW chunk's partial statistics (bounded by the window size, exact in
    fp32), which the host folds into its float64 totals.
    """

    def window_impl(raw, n_samples, chunk_start, prior_mean, prior_meansq, prior_cnt):
        feats, frame_lengths, _, _ = logmel_batch(
            raw, n_samples, feat_cfg, fused=is_tpu_backend()
        )  # (1, Tw, C, M) clipped, unnormalized; zeros beyond frame_lengths

        # statistics over the NEW frames only (each stream frame counts
        # once), then normalize the whole window with the merged moments —
        # the device-side analog of the reference's per-file z-norm
        C, M = feats.shape[2], feats.shape[3]
        n_new = jnp.minimum(jnp.int32(S), frame_lengths[0] - chunk_start)
        n_new = jnp.maximum(n_new, 0)
        chunk = jax.lax.dynamic_slice(feats, (0, chunk_start, 0, 0), (1, S, C, M))
        new_mask = (jnp.arange(S) < n_new)[None, :, None, None]
        chunk = jnp.where(new_mask, chunk, 0.0)
        chunk_sum = jnp.sum(chunk)
        chunk_sumsq = jnp.sum(jnp.square(chunk))
        chunk_cnt = n_new * (C * M)

        total = prior_cnt + chunk_cnt.astype(jnp.float32)
        denom = jnp.maximum(total, 1.0)
        mean = (prior_mean * prior_cnt + chunk_sum) / denom
        meansq = (prior_meansq * prior_cnt + chunk_sumsq) / denom
        var = jnp.maximum(meansq - jnp.square(mean), 0.0)
        std = jnp.sqrt(var) + 1e-8  # reference: std + 1e-8 (preprocessing.py:63)
        valid = (jnp.arange(Tw) < frame_lengths[0])[None, :, None, None]
        feats = jnp.where(valid, (feats - mean) / std, 0.0)

        flat = feats.reshape(1, Tw, C * M)
        log_probs, out_lengths, _ = engine.model.apply(
            {"params": engine.params, "batch_stats": engine.batch_stats},
            flat,
            frame_lengths,
            train=False,
        )
        return log_probs[0], out_lengths[0], chunk_sum, chunk_sumsq, chunk_cnt

    return jax.jit(window_impl)


class ChunkedStreamingTranscriber:
    """Incremental EMG transcription with O(window) compute per update.

    Args:
      engine: a warm :class:`~ssd_tpu.serving.engine.InferenceEngine` (model,
        params, featurizer config and vocab are taken from it).
      chunk_frames: S — new feature frames per emission step.
      left_context_frames: W — history frames re-encoded with every chunk.
      right_context_frames: R — lookahead; emission lags the stream head by
        R frames (R·hop ms of algorithmic latency) so emitted frames always
        have R frames of future context.
      blank_bias: additive blank bias for the incremental greedy decode
        (reference ``ctc.py:18-20`` semantics).
    """

    def __init__(
        self,
        engine,
        chunk_frames: int = 96,
        left_context_frames: int = 512,
        right_context_frames: int = 32,
        blank_bias: float = 0.0,
    ) -> None:
        self.engine = engine
        self.vocab = engine.vocab
        self.blank_bias = float(blank_bias)
        cfg = engine.feat_cfg
        # force running normalization semantics: the window core featurizes
        # WITHOUT normalization; z-norm happens against carried statistics
        self.feat_cfg = FeaturizerConfig(
            sample_rate=cfg.sample_rate,
            n_fft=cfg.n_fft,
            hop_length=cfg.hop_length,
            n_mels=cfg.n_mels,
            fmin=cfg.fmin,
            fmax=cfg.fmax,
            normalize="none",
        )
        factor = int(engine.cfg["model"]["encoder"].get("subsample_factor", 2))
        self.factor = factor

        def up(n: int) -> int:
            return max(factor, ((int(n) + factor - 1) // factor) * factor)

        self.S = up(chunk_frames)
        self.W = up(left_context_frames)
        self.R = up(right_context_frames)
        self.Tw = self.W + self.S + self.R  # window frames (static)
        hop, n_fft = cfg.hop_length, cfg.n_fft
        self.Lw = (self.Tw - 1) * hop + n_fft  # window samples (static)
        self.channels = int(engine.cfg["model"]["encoder"]["input_dim"]) // cfg.n_mels

        # stream state
        self._chunks: List[np.ndarray] = []  # pending raw sample pieces
        self._chunk_offset = 0  # absolute sample index of _chunks[0][0]
        self._total_samples = 0
        self._emitted = 0  # frames whose outputs are final
        self._stats = (0.0, 0.0, 0)  # running (sum, sumsq, count) of features
        self._ids: List[int] = []  # collapsed token ids so far
        self._carry = self.vocab.blank_id
        self._log_probs: List[np.ndarray] = []  # emitted per-frame log-probs
        self.hypothesis = ""

        # compiled window functions are cached ON THE ENGINE keyed by the
        # window geometry: concurrent stream sessions with the same settings
        # (the serving case) share one compile instead of one per session.
        # The cached closure captures the ENGINE only — never this session —
        # so finished sessions (and their buffered log-probs) are collectable.
        cache = getattr(engine, "_stream_window_fns", None)
        if cache is None:
            cache = engine._stream_window_fns = {}
        key = (self.feat_cfg, self.Tw, self.S)
        if key not in cache:
            cache[key] = _make_window_fn(engine, self.feat_cfg, self.Tw, self.S)
        self._window_fn = cache[key]

    # ------------------------------------------------------------ internals

    def _complete_frames(self) -> int:
        n = self._total_samples
        cfg = self.feat_cfg
        return max(0, 1 + (n - cfg.n_fft) // cfg.hop_length) if n >= cfg.n_fft else 0

    def _window_samples(self, a: int) -> np.ndarray:
        """Assemble samples [a·hop, a·hop + Lw) from the pending pieces."""
        start = a * self.feat_cfg.hop_length
        out = np.zeros((self.Lw, self.channels), np.float32)
        pos = self._chunk_offset
        for piece in self._chunks:
            end = pos + len(piece)
            lo, hi = max(start, pos), min(start + self.Lw, end)
            if hi > lo:
                out[lo - start : hi - start] = piece[lo - pos : hi - pos]
            pos = end
        return out

    def _drop_consumed(self) -> None:
        """Discard sample pieces older than any future window can need."""
        needed_from = max(0, (self._emitted - self.W)) * self.feat_cfg.hop_length
        while self._chunks and self._chunk_offset + len(self._chunks[0]) <= needed_from:
            self._chunk_offset += len(self._chunks[0])
            self._chunks.pop(0)

    def _run_window(self, emit_until: int) -> None:
        """Encode one window and emit frames [self._emitted, emit_until)."""
        e = self._emitted
        a = max(0, e - self.W)
        a -= a % self.factor  # keep subsampler phase (already multiple; guard)
        raw = self._window_samples(a)
        n_samp = min(self._total_samples - a * self.feat_cfg.hop_length, self.Lw)
        s, q, c = self._stats  # float64 sums + exact int count (host-side)
        log_probs, out_len, dsum, dsumsq, dcnt = self._window_fn(
            jnp.asarray(raw[None]),
            jnp.asarray([n_samp], np.int32),
            jnp.int32(e - a),
            jnp.float32(s / c if c else 0.0),
            jnp.float32(q / c if c else 0.0),
            jnp.float32(c),
        )
        self._stats = (s + float(dsum), q + float(dsumsq), c + int(dcnt))
        lp = np.asarray(log_probs, np.float32)
        j0 = (e - a) // self.factor
        if emit_until >= self._complete_frames():
            # final flush: take every remaining subsampled output
            # (out_len = ceil((F − a)/factor), which floor division misses)
            j1 = int(out_len)
        else:
            j1 = min((emit_until - a) // self.factor, int(out_len))
        emitted_lp = lp[j0:j1]
        self._log_probs.append(emitted_lp)
        ids = np.argmax(self._biased(emitted_lp), axis=-1)
        toks, self._carry = collapse_ids(
            ids, self._carry, self.vocab.blank_id, self.vocab.pad_id
        )
        self._ids.extend(toks)
        self._emitted = emit_until
        self._drop_consumed()
        self.hypothesis = self.vocab.decode(self._ids)

    def _biased(self, lp: np.ndarray) -> np.ndarray:
        if not self.blank_bias:
            return lp
        out = lp.copy()
        out[:, self.vocab.blank_id] += self.blank_bias
        return out

    # -------------------------------------------------------------- public
    def feed(self, samples: np.ndarray) -> Optional[str]:
        """Append (n, C) raw samples; returns the hypothesis when it grew."""
        samples = np.asarray(samples, np.float32)
        if samples.ndim != 2 or samples.shape[1] != self.channels:
            raise ValueError(
                f"expected (n, {self.channels}) samples, got {samples.shape}"
            )
        self._chunks.append(samples)
        self._total_samples += len(samples)
        updated = False
        while self._complete_frames() >= self._emitted + self.S + self.R:
            self._run_window(self._emitted + self.S)
            updated = True
        return self.hypothesis if updated else None

    def finish(self, beam: bool = False) -> str:
        """Flush the tail (no lookahead left to wait for) and finalize.

        With ``beam=True`` the accumulated per-frame log-probs get ONE beam
        pass (the engine's beam/LM configuration) — still bounded: a single
        decode over the emitted sequence, no encoder recompute.
        """
        F = self._complete_frames()
        while self._emitted < F:
            emit_until = min(self._emitted + self.S, F)
            self._run_window(emit_until)
        if beam and self._log_probs:
            all_lp = np.concatenate(self._log_probs, axis=0)
            T = len(all_lp)
            # pad T to a bucket so repeated finish() calls across streams of
            # different lengths reuse one compiled decode
            T_pad = max(128, ((T + 127) // 128) * 128)
            padded = np.zeros((1, T_pad, all_lp.shape[-1]), np.float32)
            padded[0, :T] = all_lp
            # explicit decoder override — never mutate the shared engine's
            # decoder setting (read concurrently by the micro-batcher thread)
            self.hypothesis = self.engine._decode(
                jnp.asarray(padded), jnp.asarray([T], np.int32), decoder="beam"
            )[0]
        return self.hypothesis

    def reset(self) -> None:
        self._chunks.clear()
        self._chunk_offset = 0
        self._total_samples = 0
        self._emitted = 0
        self._stats = (0.0, 0.0, 0)
        self._ids = []
        self._carry = self.vocab.blank_id
        self._log_probs = []
        self.hypothesis = ""
