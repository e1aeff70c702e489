"""bfloat16 compute path: runs, stays finite, and tracks the fp32 outputs."""

import numpy as np

import jax
import jax.numpy as jnp

from ssd_tpu.models.conformer import EncoderConfig
from ssd_tpu.models.ssd_model import SSDModel


def _outputs(compute_dtype):
    cfg = EncoderConfig(
        input_dim=16,
        d_model=32,
        num_layers=2,
        num_heads=4,
        ffn_dim=64,
        depthwise_conv_kernel_size=7,
        dropout=0.0,
        subsample_factor=2,
        compute_dtype=compute_dtype,
    )
    model = SSDModel(encoder_cfg=cfg, projection_dim=12, vocab_size=48)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 20, 16)).astype(np.float32))
    lengths = jnp.array([20, 15])
    variables = model.init(jax.random.PRNGKey(0), x, lengths, train=False)
    return model.apply(variables, x, lengths, train=False)


def test_bf16_matches_fp32_loosely():
    lp32, len32, st32 = _outputs("float32")
    lp16, len16, st16 = _outputs("bfloat16")
    assert lp16.dtype == jnp.float32  # CTC log-probs always fp32
    assert st16.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(len32), np.asarray(len16))
    assert np.all(np.isfinite(np.asarray(lp16)))
    # bf16 has ~3 decimal digits; outputs should agree to ~1e-1 after log_softmax
    np.testing.assert_allclose(np.asarray(lp16), np.asarray(lp32), atol=0.15)
    np.testing.assert_allclose(np.asarray(st16), np.asarray(st32), atol=0.15)
