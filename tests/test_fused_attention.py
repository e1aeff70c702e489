"""Fused whole-head-in-VMEM attention (ops/attention.py) vs flax reference.

Runs in Pallas interpret mode on the CPU mesh; the oracle is flax's own
``nn.dot_product_attention`` in fp32 (the fused kernel softmaxes in fp32, so
fp32 flax is the tight reference; the production bf16 path is compared at
bf16 tolerance through the full module test).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssd_tpu.ops.attention import fits_in_vmem, fused_attention_fn

B, T, H, HD = 3, 64, 2, 16


def _inputs(dtype, seed=0, t=T):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, t, H, HD)).astype(np.float32), dtype)
    k = jnp.asarray(rng.normal(size=(B, t, H, HD)).astype(np.float32), dtype)
    v = jnp.asarray(rng.normal(size=(B, t, H, HD)).astype(np.float32), dtype)
    lengths = jnp.asarray(rng.integers(t // 2, t + 1, size=B).astype(np.int32))
    mask = (jnp.arange(t)[None, :] < lengths[:, None])[:, None, None, :]
    return q, k, v, mask, lengths


def test_forward_matches_flax_fp32():
    q, k, v, mask, _ = _inputs(jnp.float32)
    want = nn.dot_product_attention(q, k, v, mask=mask, deterministic=True)
    got = fused_attention_fn(q, k, v, mask=mask, deterministic=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_forward_no_mask():
    q, k, v, _, _ = _inputs(jnp.float32, seed=1)
    want = nn.dot_product_attention(q, k, v, deterministic=True)
    got = fused_attention_fn(q, k, v, deterministic=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_gradients_match_flax_fp32():
    q, k, v, mask, _ = _inputs(jnp.float32, seed=2)

    def loss(fn, q, k, v):
        out = fn(q, k, v, mask=mask, deterministic=True)
        return jnp.sum(jnp.tanh(out.astype(jnp.float32)))

    want = jax.grad(lambda *a: loss(nn.dot_product_attention, *a), argnums=(0, 1, 2))(q, k, v)
    got = jax.grad(lambda *a: loss(fused_attention_fn, *a), argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=2e-5, rtol=1e-4, err_msg=f"d{name}"
        )


def test_padded_keys_get_zero_gradient():
    q, k, v, mask, lengths = _inputs(jnp.float32, seed=3)

    def loss(q, k, v):
        out = fused_attention_fn(q, k, v, mask=mask, deterministic=True)
        return jnp.sum(out**2)

    _, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for b in range(B):
        pad = np.asarray(dk)[b, int(lengths[b]) :]
        np.testing.assert_array_equal(pad, 0.0)
        np.testing.assert_array_equal(np.asarray(dv)[b, int(lengths[b]) :], 0.0)


def test_dropout_matches_flax_distribution():
    """Broadcast dropout: mean over many keys ≈ deterministic output; each
    draw keeps exact 1/keep scaling on surviving weights (row sums match a
    manual recomputation)."""
    q, k, v, mask, _ = _inputs(jnp.float32, seed=4)
    det = fused_attention_fn(q, k, v, mask=mask, deterministic=True)
    outs = [
        fused_attention_fn(
            q, k, v, mask=mask, deterministic=False,
            dropout_rng=jax.random.PRNGKey(i), dropout_rate=0.3,
        )
        for i in range(64)
    ]
    mean = np.mean(np.stack([np.asarray(o) for o in outs]), axis=0)
    # E[mask/keep] = 1 ⇒ expectation equals the deterministic output.
    # 64-draw Monte Carlo: check the AVERAGE deviation (elementwise max over
    # 6k elements would need ~4σ slack), normalized by output scale.
    err = np.mean(np.abs(mean - np.asarray(det))) / np.mean(np.abs(np.asarray(det)))
    assert err < 0.2, err
    # and dropout must actually do something
    assert not np.allclose(np.asarray(outs[0]), np.asarray(det))


def test_dropout_grads_finite_and_nonzero():
    q, k, v, mask, _ = _inputs(jnp.float32, seed=5)

    def loss(q):
        out = fused_attention_fn(
            q, k, v, mask=mask, deterministic=False,
            dropout_rng=jax.random.PRNGKey(0), dropout_rate=0.3,
        )
        return jnp.sum(out**2)

    dq = jax.grad(loss)(q)
    assert np.isfinite(np.asarray(dq)).all()
    assert float(jnp.sum(jnp.abs(dq))) > 0


def test_full_encoder_fused_vs_flax_bf16():
    """Production integration: same params, attention_impl fused vs flax."""
    from ssd_tpu.models.conformer import EMGConformerEncoder, EncoderConfig

    kw = dict(
        input_dim=40, d_model=64, num_layers=2, num_heads=4, ffn_dim=128,
        depthwise_conv_kernel_size=7, dropout=0.0, subsample_factor=2,
        compute_dtype="bfloat16",
    )
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(2, 96, 40)).astype(np.float32))
    lengths = jnp.asarray([96, 70], np.int32)

    enc_flax = EMGConformerEncoder(EncoderConfig(**kw, attention_impl="flax"))
    enc_fused = EMGConformerEncoder(EncoderConfig(**kw, attention_impl="fused"))
    variables = enc_flax.init(jax.random.PRNGKey(0), x, lengths, False)
    want, wl = enc_flax.apply(variables, x, lengths, False)
    got, gl = enc_fused.apply(variables, x, lengths, False)  # same param tree
    np.testing.assert_array_equal(np.asarray(wl), np.asarray(gl))
    # bf16 compute + fp32-vs-bf16 softmax: loose elementwise tolerance
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0.08, rtol=0.05)
    # distributions must be essentially identical
    assert abs(float(jnp.mean(got - want))) < 1e-3


def test_vmem_guard():
    assert fits_in_vmem(384, 48)
    assert not fits_in_vmem(4096, 128)


def test_long_sequence_falls_back_to_flax():
    """Sequences whose per-cell buffers exceed VMEM silently route to the
    XLA path instead of failing at Mosaic compile time."""
    t = 4096
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(1, t, 2, 128)).astype(np.float32))
    out = fused_attention_fn(q, q, q, deterministic=True)
    want = nn.dot_product_attention(q, q, q, deterministic=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5, rtol=1e-5)
