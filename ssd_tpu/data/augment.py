"""Training-time augmentations: SpecAugment and EMG channel dropout.

Semantics parity with the reference (``src/data/dataset.py:21-66,113-126``):

* SpecAugment operates on the **flattened** ``(T, C·M)`` features at collate
  time — with probability ``p`` per sample, zero ``time_masks`` random spans
  of width ``int(time_mask_width · T)`` and ``freq_masks`` random column spans
  of width ``min(freq_mask_width, F)``.
* Channel dropout operates on the pre-flatten ``(T, C, M)`` tensor — with
  probability ``p``, zero 1..max_channels random channels (never all).

Two backends: numpy (host-side loader, default — keeps the jitted train step
pure) and jax (on-device, PRNG-keyed, vectorized) for pipelines that fuse
augmentation into the step.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class SpecAugmentConfig:
    time_masks: int = 2
    time_mask_width: float = 0.05  # fraction of sequence length
    freq_masks: int = 2
    freq_mask_width: int = 8
    p: float = 0.0


@dataclass(frozen=True)
class ChannelDropoutConfig:
    p: float = 0.0
    max_channels: int = 1


# ----------------------------------------------------------------- numpy


def spec_augment_np(
    feat: np.ndarray, cfg: SpecAugmentConfig, rng: np.random.Generator
) -> np.ndarray:
    """Apply SpecAugment to one (T, F) array in place-safe fashion."""
    if cfg.p <= 0 or rng.random() > cfg.p:
        return feat
    t, f = feat.shape
    out = feat.copy()
    for _ in range(cfg.time_masks):
        width = int(cfg.time_mask_width * t)
        if width <= 0:
            continue
        start = rng.integers(0, max(t - width, 0) + 1)
        out[start : start + width] = 0.0
    for _ in range(cfg.freq_masks):
        width = min(cfg.freq_mask_width, f)
        if width <= 0:
            continue
        start = rng.integers(0, max(f - width, 0) + 1)
        out[:, start : start + width] = 0.0
    return out


def channel_dropout_np(
    feat: np.ndarray, cfg: ChannelDropoutConfig, rng: np.random.Generator
) -> np.ndarray:
    """Apply channel dropout to one (T, C, M) array."""
    if cfg.p <= 0 or feat.ndim != 3 or rng.random() > cfg.p:
        return feat
    channels = feat.shape[1]
    if channels <= 1:
        return feat
    max_drop = min(max(1, cfg.max_channels), channels - 1)
    drop_n = int(rng.integers(1, max_drop + 1))
    idx = rng.choice(channels, size=drop_n, replace=False)
    out = feat.copy()
    out[:, idx, :] = 0.0
    return out


# ------------------------------------------------------------------- jax


def spec_augment_jax(
    feats: jnp.ndarray,
    lengths: jnp.ndarray,
    cfg: SpecAugmentConfig,
    key: jax.Array,
) -> jnp.ndarray:
    """Vectorized on-device SpecAugment for a padded (B, T, F) batch.

    Mask spans are sampled per sample; time-mask width scales with the valid
    length (reference scales with the unpadded sequence length).
    """
    if cfg.p <= 0:
        return feats
    B, T, F = feats.shape
    k_apply, k_t, k_f = jax.random.split(key, 3)
    apply = jax.random.uniform(k_apply, (B,)) < cfg.p

    t_idx = jnp.arange(T)[None, None, :]  # (1, 1, T)
    widths = (cfg.time_mask_width * lengths).astype(jnp.int32)  # (B,)
    # +1 inside the scale so the last valid offset L−w is reachable — matches
    # the host path's inclusive randint(0, L−w) distribution
    t_starts = jnp.minimum(
        (
            jax.random.uniform(k_t, (B, cfg.time_masks))
            * (jnp.maximum(lengths[:, None] - widths[:, None], 0) + 1)
        ).astype(jnp.int32),
        jnp.maximum(lengths[:, None] - widths[:, None], 0),
    )
    t_mask = jnp.any(
        (t_idx >= t_starts[:, :, None]) & (t_idx < (t_starts + widths[:, None])[:, :, None]),
        axis=1,
    )  # (B, T)

    f_idx = jnp.arange(F)[None, None, :]
    f_width = min(cfg.freq_mask_width, F)
    f_starts = jnp.minimum(
        (
            jax.random.uniform(k_f, (B, cfg.freq_masks)) * (max(F - f_width, 0) + 1)
        ).astype(jnp.int32),
        max(F - f_width, 0),
    )
    f_mask = jnp.any(
        (f_idx >= f_starts[:, :, None]) & (f_idx < f_starts[:, :, None] + f_width),
        axis=1,
    )  # (B, F)

    zero = t_mask[:, :, None] | f_mask[:, None, :]
    zero = zero & apply[:, None, None]
    return jnp.where(zero, 0.0, feats)


def channel_dropout_jax(
    feats: jnp.ndarray, cfg: ChannelDropoutConfig, key: jax.Array
) -> jnp.ndarray:
    """Vectorized channel dropout for a (B, T, C, M) batch."""
    if cfg.p <= 0:
        return feats
    B, _, C, _ = feats.shape
    if C <= 1:
        return feats
    k_apply, k_n, k_perm = jax.random.split(key, 3)
    apply = jax.random.uniform(k_apply, (B,)) < cfg.p
    max_drop = min(max(1, cfg.max_channels), C - 1)
    drop_n = jax.random.randint(k_n, (B,), 1, max_drop + 1)
    # rank channels by random score; drop the first drop_n
    scores = jax.random.uniform(k_perm, (B, C))
    ranks = jnp.argsort(jnp.argsort(scores, axis=1), axis=1)
    dropped = ranks < drop_n[:, None]  # (B, C)
    dropped = dropped & apply[:, None]
    return jnp.where(dropped[:, None, :, None], 0.0, feats)
