"""EMG log-mel featurizer (on-device).

TPU-native rebuild of the reference's offline EMG featurizer
(``src/data/preprocessing.py:67-122``): per channel STFT (``center=False``,
periodic Hann) → power spectrum → Slaney mel filterbank → ``power_to_db``
(``10·log10(max(x, 1e-10))`` with per-call 80 dB dynamic-range clipping) →
stack to ``(frames, channels, n_mels)`` → per-file z-normalization.

Two implementations with identical numerics:

* :func:`logmel` — pure-XLA path (slice-based framing, ``jnp.fft.rfft``);
  the golden reference, also used on CPU.
* :func:`logmel_fused` — fused Pallas kernel: framing happens in VMEM (the
  framed matrix is a 32× blow-up of the raw signal at hop=10/n_fft=320, so
  materializing it in HBM would waste bandwidth), the rFFT is computed as two
  dense matmuls against cos/sin DFT matrices (small FFTs are MXU work, not
  FFT work), and the mel projection + log fuse in the same kernel.

Both operate on padded batches with per-sample lengths so one compiled
executable serves a whole bucket of utterances.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ssd_tpu.utils.platform import pallas_interpret
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssd_tpu.ops import mel as melmod

_DB_FLOOR = 1e-10
_TOP_DB = 80.0


@dataclass(frozen=True)
class FeaturizerConfig:
    """Mirrors the reference ``EMGConfig`` (``preprocessing.py:32-40``)."""

    sample_rate: int = 1000
    n_fft: int = 320
    hop_length: int = 10
    n_mels: int = 80
    fmin: float = 0.0
    fmax: Optional[float] = None
    normalize: str = "per_file"  # per_file | none

    @property
    def n_bins(self) -> int:
        return 1 + self.n_fft // 2

    def frame_count(self, n_samples: int) -> int:
        return melmod.num_frames(n_samples, self.n_fft, self.hop_length)


# --------------------------------------------------------------------------
# Framing
# --------------------------------------------------------------------------


def _frame_signal(sig: jnp.ndarray, n_fft: int, hop: int, n_frames: int) -> jnp.ndarray:
    """Frame a 1-D signal into ``(n_frames, n_fft)`` overlapping windows.

    When ``hop`` divides ``n_fft`` this is pure slicing (no gather): the
    signal reshaped to ``(L/hop, hop)`` yields frame *i* as rows
    ``i .. i + n_fft/hop``; we build the frame matrix as a concat of
    ``n_fft/hop`` shifted row-blocks. Otherwise falls back to a gather.
    """
    if n_fft % hop == 0:
        k = n_fft // hop
        rows = (len(sig) // hop)
        sigr = sig[: rows * hop].reshape(rows, hop)
        blocks = [jax.lax.dynamic_slice_in_dim(sigr, j, n_frames, axis=0) for j in range(k)]
        return jnp.concatenate(blocks, axis=1)
    starts = jnp.arange(n_frames) * hop
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    return sig[idx]


# --------------------------------------------------------------------------
# Pure-XLA log-mel (golden path)
# --------------------------------------------------------------------------


def _power_to_db(x: jnp.ndarray) -> jnp.ndarray:
    """``librosa.power_to_db(x, ref=1.0)`` on pre-floored input."""
    return 10.0 * jnp.log10(jnp.maximum(x, _DB_FLOOR))


@functools.partial(jax.jit, static_argnames=("cfg", "fused"))
def logmel_batch(
    emg: jnp.ndarray,
    sample_lengths: jnp.ndarray,
    cfg: FeaturizerConfig,
    fused: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched featurization of padded raw EMG.

    Args:
      emg: ``(B, L_pad, C)`` float32 raw EMG, zero-padded.
      sample_lengths: ``(B,)`` valid sample counts.
      cfg: featurizer config (static).
      fused: use the Pallas kernel for the frame→mel core.

    Returns:
      ``(features, frame_lengths, means, stds)`` where features is
      ``(B, T_pad, C, n_mels)`` float32 — normalized per file when
      ``cfg.normalize == 'per_file'`` — frame_lengths is ``(B,)`` int32, and
      means/stds are the per-file statistics recorded in the cache metadata
      (zeros/ones when normalization is off).
    """
    B, L_pad, C = emg.shape
    T_pad = cfg.frame_count(L_pad)
    if T_pad <= 0:
        raise ValueError(f"padded length {L_pad} shorter than n_fft={cfg.n_fft}")

    core = _logmel_core_fused if fused else _logmel_core_xla
    logmels = core(emg, cfg)  # (B, C, T_pad, M) — un-clipped log10 power-mel

    frame_lengths = jnp.minimum(
        1 + (sample_lengths - cfg.n_fft) // cfg.hop_length, T_pad
    )
    frame_lengths = jnp.maximum(frame_lengths, 0).astype(jnp.int32)

    # librosa.power_to_db clips each per-channel call to (max − 80 dB).
    frame_mask = (
        jnp.arange(T_pad)[None, :] < frame_lengths[:, None]
    )  # (B, T_pad)
    neg_inf = jnp.float32(-1e30)
    masked = jnp.where(frame_mask[:, None, :, None], logmels, neg_inf)
    ch_max = jnp.max(masked, axis=(2, 3), keepdims=True)  # (B, C, 1, 1)
    logmels = jnp.maximum(logmels, ch_max - _TOP_DB)

    features = jnp.transpose(logmels, (0, 2, 1, 3))  # (B, T_pad, C, M)

    if cfg.normalize == "per_file":
        valid = frame_mask[:, :, None, None]
        denom = jnp.maximum(frame_lengths, 1).astype(jnp.float32) * (C * cfg.n_mels)
        x = jnp.where(valid, features, 0.0)
        mean = jnp.sum(x, axis=(1, 2, 3)) / denom
        var = jnp.sum(jnp.where(valid, (features - mean[:, None, None, None]) ** 2, 0.0), axis=(1, 2, 3)) / denom
        std = jnp.sqrt(var) + 1e-8  # reference: std + 1e-8 (preprocessing.py:63)
        features = (features - mean[:, None, None, None]) / std[:, None, None, None]
        features = jnp.where(valid, features, 0.0)
    else:
        mean = jnp.zeros((B,), jnp.float32)
        std = jnp.ones((B,), jnp.float32)
        features = jnp.where(frame_mask[:, :, None, None], features, 0.0)

    return features.astype(jnp.float32), frame_lengths, mean, std


def _logmel_core_xla(emg: jnp.ndarray, cfg: FeaturizerConfig) -> jnp.ndarray:
    """(B, L, C) → (B, C, T, M) un-clipped log-mel via jnp.fft.rfft."""
    B, L_pad, C = emg.shape
    T_pad = cfg.frame_count(L_pad)
    window = jnp.asarray(melmod.hann_window(cfg.n_fft))
    mel_fb = jnp.asarray(
        melmod.mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax)
    )  # (M, n_bins)

    sig = jnp.transpose(emg, (0, 2, 1)).reshape(B * C, L_pad)
    frames = jax.vmap(lambda s: _frame_signal(s, cfg.n_fft, cfg.hop_length, T_pad))(sig)
    spec = jnp.fft.rfft(frames * window[None, None, :], axis=-1)
    power = jnp.abs(spec).astype(jnp.float32) ** 2  # (B*C, T, n_bins)
    # HIGHEST precision: feature parity with the float32 reference cache is a
    # north-star requirement; default TPU matmul precision (bf16 passes) is
    # not accurate enough for a 1e-4 tolerance.
    mels = jnp.einsum("btf,mf->btm", power, mel_fb, precision=jax.lax.Precision.HIGHEST)
    return _power_to_db(mels).reshape(B, C, T_pad, cfg.n_mels)


# --------------------------------------------------------------------------
# Fused Pallas kernel
# --------------------------------------------------------------------------

_FRAME_BLOCK = 128  # frames per kernel invocation (MXU sublane-friendly)


def _fused_kernel(sig_ref, win_ref, cos_ref, sin_ref, mel_ref, out_ref, *, hop: int, n_fft: int):
    """One (signal-row, frame-block) tile of the fused log-mel pipeline.

    sig_ref: (1, L_pad) raw signal for one (batch, channel) pair, VMEM.
    out_ref: (1, FRAME_BLOCK, n_mels) log-mel output block.
    """
    tb = out_ref.shape[1]
    j = pl.program_id(1)
    f0 = pl.multiple_of(j * tb, tb)  # first frame of this block

    k = n_fft // hop
    # sig_ref holds the hop-reshaped signal (1, rows, hop): row r is samples
    # [r*hop, (r+1)*hop). Frame i is rows i..i+k, so the frame-block matrix is
    # a concat of k shifted row-blocks — pure 2-D slicing, no gathers and no
    # shape casts (Mosaic-friendly).
    blocks = [sig_ref[0, pl.ds(f0 + c, tb), :] for c in range(k)]
    frames = jnp.concatenate(blocks, axis=1)  # (tb, n_fft)

    fw = frames * win_ref[:, :]
    hi = jax.lax.Precision.HIGHEST
    xr = jnp.dot(fw, cos_ref[:, :], preferred_element_type=jnp.float32, precision=hi)
    xi = jnp.dot(fw, sin_ref[:, :], preferred_element_type=jnp.float32, precision=hi)
    power = xr * xr + xi * xi  # (tb, n_bins)
    mels = jnp.dot(power, mel_ref[:, :], preferred_element_type=jnp.float32, precision=hi)
    out_ref[0, :, :] = 10.0 * jnp.log10(jnp.maximum(mels, _DB_FLOOR))


def _logmel_core_fused(emg: jnp.ndarray, cfg: FeaturizerConfig) -> jnp.ndarray:
    """(B, L, C) → (B, C, T, M) un-clipped log-mel via the fused Pallas kernel."""
    if cfg.n_fft % cfg.hop_length != 0:
        return _logmel_core_xla(emg, cfg)

    B, L_pad, C = emg.shape
    T_pad = cfg.frame_count(L_pad)
    tb = _FRAME_BLOCK
    T_up = ((T_pad + tb - 1) // tb) * tb
    # Signal must cover the last padded frame block.
    L_need = (T_up - 1) * cfg.hop_length + cfg.n_fft
    sig = jnp.transpose(emg, (0, 2, 1)).reshape(B * C, L_pad)
    if L_need > L_pad:
        sig = jnp.pad(sig, ((0, 0), (0, L_need - L_pad)))
    rows = L_need // cfg.hop_length  # = T_up - 1 + n_fft // hop
    sig = sig[:, : rows * cfg.hop_length].reshape(B * C, rows, cfg.hop_length)

    window = melmod.hann_window(cfg.n_fft)[None, :]  # (1, n_fft)
    cos_m, sin_m = melmod.dft_matrices(cfg.n_fft)  # (n_fft, n_bins)
    mel_fb = melmod.mel_filterbank(
        cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax
    ).T  # (n_bins, M)

    grid = (B * C, T_up // tb)
    interpret = pallas_interpret()
    out = pl.pallas_call(
        functools.partial(_fused_kernel, hop=cfg.hop_length, n_fft=cfg.n_fft),
        out_shape=jax.ShapeDtypeStruct((B * C, T_up, cfg.n_mels), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, rows, cfg.hop_length),
                lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, cfg.n_fft), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(cos_m.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(sin_m.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(mel_fb.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tb, cfg.n_mels), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * C * T_up * cfg.n_fft * (2 * cfg.n_bins)
            + 2 * B * C * T_up * cfg.n_bins * cfg.n_mels,
            bytes_accessed=4 * B * C * (L_need + T_up * cfg.n_mels),
            transcendentals=B * C * T_up * cfg.n_mels,
        ),
    )(
        sig,
        jnp.asarray(window),
        jnp.asarray(cos_m),
        jnp.asarray(sin_m),
        jnp.asarray(mel_fb),
    )
    return out[:, :T_pad, :].reshape(B, C, T_pad, cfg.n_mels)


# --------------------------------------------------------------------------
# Single-utterance convenience (numpy in/out, used by the preprocessing CLI)
# --------------------------------------------------------------------------


def logmel(
    emg: np.ndarray, cfg: FeaturizerConfig, fused: bool = False
) -> Tuple[np.ndarray, dict]:
    """Featurize one raw EMG array ``(samples, channels)``.

    Returns ``(features (T, C, M) float32, stats)`` where stats carries the
    per-file mean/std (empty when normalization is off) — the same metadata
    contract as the reference cache (``preprocessing.py:109-122``).
    """
    if emg.ndim != 2:
        raise ValueError(f"expected (samples, channels), got {emg.shape}")
    n = emg.shape[0]
    T = cfg.frame_count(n)
    if T <= 0:
        raise ValueError(f"signal too short for n_fft={cfg.n_fft}: {n} samples")
    x = jnp.asarray(emg[None].astype(np.float32))
    feats, lengths, mean, std = logmel_batch(x, jnp.asarray([n]), cfg, fused=fused)
    feats = np.asarray(feats[0, : int(lengths[0])])
    stats = {}
    if cfg.normalize == "per_file":
        stats = {"mean": float(mean[0]), "std": float(std[0])}
    return feats, stats
