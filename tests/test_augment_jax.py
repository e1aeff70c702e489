"""On-device augmentation variants (PRNG-keyed jax versions)."""

import numpy as np

import jax
import jax.numpy as jnp

from ssd_tpu.data.augment import (
    ChannelDropoutConfig,
    SpecAugmentConfig,
    channel_dropout_jax,
    spec_augment_jax,
)


def test_spec_augment_jax_masks_and_noop():
    x = jnp.ones((4, 50, 32))
    lengths = jnp.array([50, 40, 30, 20])
    cfg = SpecAugmentConfig(p=1.0, time_masks=2, time_mask_width=0.2, freq_masks=1, freq_mask_width=8)
    out = spec_augment_jax(x, lengths, cfg, jax.random.PRNGKey(0))
    arr = np.asarray(out)
    assert arr.shape == x.shape
    assert (arr == 0).any()
    # p=0 → identity object
    assert spec_augment_jax(x, lengths, SpecAugmentConfig(p=0.0), jax.random.PRNGKey(0)) is x


def test_spec_augment_jax_prob_gate():
    x = jnp.ones((64, 30, 16))
    lengths = jnp.full((64,), 30)
    cfg = SpecAugmentConfig(p=0.5, time_masks=1, time_mask_width=0.3, freq_masks=0)
    out = np.asarray(spec_augment_jax(x, lengths, cfg, jax.random.PRNGKey(1)))
    touched = [(out[i] == 0).any() for i in range(64)]
    # roughly half the samples masked
    assert 10 < sum(touched) < 55


def test_channel_dropout_jax():
    x = jnp.ones((16, 20, 8, 10))
    cfg = ChannelDropoutConfig(p=1.0, max_channels=3)
    out = np.asarray(channel_dropout_jax(x, cfg, jax.random.PRNGKey(2)))
    for i in range(16):
        dropped = [(out[i, :, c] == 0).all() for c in range(8)]
        assert 1 <= sum(dropped) <= 3  # never zero, never all
    # p=0 noop
    assert channel_dropout_jax(x, ChannelDropoutConfig(p=0.0), jax.random.PRNGKey(0)) is x
