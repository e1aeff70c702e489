"""Pallas depthwise conv (ops/depthwise_conv.py) vs lax grouped conv.

Interpret mode on CPU; the oracle is the exact ``lax.conv_general_dilated``
path the production ``nn.Conv`` uses.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ssd_tpu.ops.depthwise_conv import DepthwiseConv1d, depthwise_conv1d

B, T, C, K = 3, 40, 16, 15


def _oracle(x, w, b):
    pad = (K - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, w[:, None, :], (1,), [(pad, pad)],
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=C,
    )
    return y + b[None, None, :]


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(K, C)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
    return x, w, b


def test_forward_matches_lax():
    x, w, b = _inputs()
    np.testing.assert_allclose(
        np.asarray(depthwise_conv1d(x, w, b)), np.asarray(_oracle(x, w, b)),
        atol=1e-5, rtol=1e-5,
    )


def test_forward_even_kernel_boundary():
    # K=15 pad=7 covered above; also sanity-check a small odd kernel
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 9, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 8)).astype(np.float32))
    b = jnp.zeros((8,), jnp.float32)
    pad = 1
    want = jax.lax.conv_general_dilated(
        x, w[:, None, :], (1,), [(pad, pad)],
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=8,
    )
    np.testing.assert_allclose(
        np.asarray(depthwise_conv1d(x, w, b)), np.asarray(want), atol=1e-5, rtol=1e-5
    )


def test_gradients_match_lax():
    x, w, b = _inputs(seed=2)

    def loss(fn, x, w, b):
        return jnp.sum(jnp.tanh(fn(x, w, b)))

    want = jax.grad(lambda *a: loss(_oracle, *a), argnums=(0, 1, 2))(x, w, b)
    got = jax.grad(lambda *a: loss(depthwise_conv1d, *a), argnums=(0, 1, 2))(x, w, b)
    for g, wref, name in zip(got, want, ("dx", "dw", "db")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(wref), atol=1e-4, rtol=1e-4, err_msg=name
        )


def test_module_param_tree_matches_nn_conv():
    """Checkpoint compatibility: identical param names and shapes."""
    x = jnp.zeros((2, 12, C), jnp.float32)
    pad = (K - 1) // 2
    ours = DepthwiseConv1d(features=C, kernel_size=K).init(jax.random.PRNGKey(0), x)
    theirs = nn.Conv(
        features=C, kernel_size=(K,), padding=[(pad, pad)], feature_group_count=C
    ).init(jax.random.PRNGKey(0), x)
    ours_shapes = jax.tree.map(lambda a: a.shape, ours["params"])
    theirs_shapes = jax.tree.map(lambda a: a.shape, theirs["params"])
    assert ours_shapes == theirs_shapes, (ours_shapes, theirs_shapes)
    # and the nn.Conv weights produce identical outputs through our module
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 12, C)).astype(np.float32))
    want = nn.Conv(
        features=C, kernel_size=(K,), padding=[(pad, pad)], feature_group_count=C
    ).apply(theirs, x)
    got = DepthwiseConv1d(features=C, kernel_size=K).apply(theirs, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_full_encoder_pallas_vs_lax_bf16():
    from ssd_tpu.models.conformer import EMGConformerEncoder, EncoderConfig

    kw = dict(
        input_dim=40, d_model=64, num_layers=2, num_heads=4, ffn_dim=128,
        depthwise_conv_kernel_size=7, dropout=0.0, subsample_factor=2,
        compute_dtype="bfloat16",
    )
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 96, 40)).astype(np.float32))
    lengths = jnp.asarray([96, 70], np.int32)
    enc_lax = EMGConformerEncoder(EncoderConfig(**kw, depthwise_impl="lax"))
    enc_pls = EMGConformerEncoder(EncoderConfig(**kw, depthwise_impl="pallas"))
    variables = enc_lax.init(jax.random.PRNGKey(0), x, lengths, False)
    want, wl = enc_lax.apply(variables, x, lengths, False)
    got, gl = enc_pls.apply(variables, x, lengths, False)
    np.testing.assert_array_equal(np.asarray(wl), np.asarray(gl))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0.08, rtol=0.05)


def test_even_kernel_rejected():
    import pytest

    from ssd_tpu.ops.depthwise_conv import depthwise_conv1d

    x = jnp.zeros((1, 8, 4), jnp.float32)
    w = jnp.zeros((4, 4), jnp.float32)
    b = jnp.zeros((4,), jnp.float32)
    with pytest.raises(ValueError, match="odd kernel size"):
        depthwise_conv1d(x, w, b)
