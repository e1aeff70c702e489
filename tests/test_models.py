"""Model shape/length tests (reference tests/test_models.py strategy) plus
interpolation parity vs torch.nn.functional.interpolate."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from ssd_tpu.models.conformer import EMGConformerEncoder, EncoderConfig, subsampled_lengths
from ssd_tpu.models.heads import CTCHead, ProjectionHead
from ssd_tpu.models.losses import LossWeights, interpolate_linear, joint_loss

CFG = EncoderConfig(
    input_dim=16,
    d_model=32,
    num_layers=2,
    num_heads=4,
    ffn_dim=64,
    depthwise_conv_kernel_size=7,
    dropout=0.1,
    subsample_factor=2,
)


def _init_encoder(cfg=CFG, B=2, T=10):
    enc = EMGConformerEncoder(cfg)
    x = jnp.zeros((B, T, cfg.input_dim))
    lengths = jnp.array([T, T - 2])
    variables = enc.init(jax.random.PRNGKey(0), x, lengths, train=False)
    return enc, variables, x, lengths


def test_encoder_shapes_and_lengths():
    enc, variables, x, lengths = _init_encoder()
    out, out_lengths = enc.apply(variables, x, lengths, train=False)
    # conv arithmetic: L=10,k=5,s=2,p=2 -> floor((10+4-5)/2)+1 = 5 ; L=8 -> 4
    assert out.shape == (2, 5, CFG.d_model)
    assert out_lengths.tolist() == [5, 4]
    # reference parity: test_models.py asserts [10, 8] -> [5, 4] at factor 2
    np.testing.assert_array_equal(
        np.asarray(subsampled_lengths(jnp.array([10, 8]), CFG)), [5, 4]
    )


def test_subsample_factor4_lengths():
    cfg = EncoderConfig(input_dim=16, d_model=32, num_layers=1, num_heads=4,
                        ffn_dim=64, subsample_factor=4)
    # two k=5,s=2,p=2 convs: 20 -> 10 -> 5
    np.testing.assert_array_equal(
        np.asarray(subsampled_lengths(jnp.array([20]), cfg)), [5]
    )


def test_encoder_padding_is_zeroed():
    enc, variables, x, lengths = _init_encoder()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    out, out_lengths = enc.apply(variables, x, lengths, train=False)
    assert np.all(np.asarray(out[1, int(out_lengths[1]) :]) == 0)


def test_padding_invariance_eval():
    """Extra time padding must not change valid-frame outputs (eval mode)."""
    cfg = CFG
    enc, variables, _, _ = _init_encoder(cfg, B=1, T=12)
    rng = np.random.default_rng(1)
    a = rng.normal(size=(1, 12, cfg.input_dim)).astype(np.float32)
    # loader pads with zeros; invariance holds for zero padding
    a_pad = np.concatenate([a, np.zeros((1, 6, cfg.input_dim), np.float32)], axis=1)
    out1, l1 = enc.apply(variables, jnp.asarray(a), jnp.array([12]), train=False)
    out2, l2 = enc.apply(variables, jnp.asarray(a_pad), jnp.array([12]), train=False)
    assert int(l1[0]) == int(l2[0])
    # batch-norm in the conv module sees padded frames (torchaudio semantics),
    # but in eval mode it uses running stats, so outputs must match exactly.
    np.testing.assert_allclose(
        np.asarray(out1[0, : int(l1[0])]), np.asarray(out2[0, : int(l1[0])]),
        atol=1e-5, rtol=1e-5,
    )


def test_heads():
    x = jnp.zeros((2, 5, 32))
    proj = ProjectionHead(output_dim=24)
    pv = proj.init(jax.random.PRNGKey(0), x)
    assert proj.apply(pv, x).shape == (2, 5, 24)
    ctc = CTCHead(vocab_size=48)
    cv = ctc.init(jax.random.PRNGKey(0), x)
    lp = ctc.apply(cv, x)
    assert lp.shape == (2, 5, 48)
    np.testing.assert_allclose(np.asarray(jnp.exp(lp).sum(-1)), 1.0, rtol=1e-5)


def test_interpolate_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(3, 17, 8)).astype(np.float32)
    for out_len in (5, 17, 23, 50):
        want = (
            torch.nn.functional.interpolate(
                torch.from_numpy(x).transpose(1, 2),
                size=out_len,
                mode="linear",
                align_corners=False,
            )
            .transpose(1, 2)
            .numpy()
        )
        got = np.asarray(interpolate_linear(jnp.asarray(x), out_len))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_joint_loss_keys_and_nonneg():
    rng = np.random.default_rng(3)
    B, T, V, D = 2, 12, 48, 16
    logits = rng.normal(size=(B, T, V)).astype(np.float32)
    lp = jnp.asarray(logits) - jax.nn.logsumexp(jnp.asarray(logits), axis=-1, keepdims=True)
    student = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    teacher = jnp.asarray(rng.normal(size=(B, 20, D)).astype(np.float32))
    out = joint_loss(
        log_probs=lp,
        logit_lengths=jnp.array([12, 9]),
        targets=jnp.asarray(rng.integers(2, V, size=(B, 5)).astype(np.int32)),
        target_lengths=jnp.array([5, 3]),
        student_repr=student,
        teacher_repr=teacher,
        teacher_lengths=jnp.array([20, 15]),
        weights=LossWeights(lambda_distill=0.4, lambda_ctc=0.6),
        blank_id=1,
    )
    assert set(out) == {"total", "ctc", "distill"}
    assert float(out["ctc"]) >= 0 and float(out["distill"]) >= 0
    np.testing.assert_allclose(
        float(out["total"]), 0.6 * float(out["ctc"]) + 0.4 * float(out["distill"]), rtol=1e-6
    )


def test_distill_masked_mse_matches_torch_reference_formula():
    """Transcribe the reference's distill computation in torch and compare."""
    import torch.nn.functional as F

    rng = np.random.default_rng(4)
    B, Ts, Tt, D = 2, 10, 16, 8
    student = rng.normal(size=(B, Ts, D)).astype(np.float32)
    teacher = rng.normal(size=(B, Tt, D)).astype(np.float32)
    s_len = np.array([10, 7], np.int64)
    t_len = np.array([16, 12], np.int64)

    st, tt = torch.from_numpy(student), torch.from_numpy(teacher)
    aligned = F.interpolate(tt.transpose(1, 2), size=Ts, mode="linear", align_corners=False).transpose(1, 2)
    scale = Ts / Tt
    at_len = torch.clamp(torch.round(torch.from_numpy(t_len).float() * scale).long(), max=Ts)
    valid = torch.minimum(torch.from_numpy(s_len), at_len).clamp(max=Ts)
    mask = torch.arange(Ts)[None, :].expand(B, -1) < valid[:, None]
    mse = (st - aligned) ** 2 * mask.unsqueeze(-1)
    want = (mse.sum() / (mask.sum() * D).clamp_min(1)).item()

    from ssd_tpu.models.losses import distillation_mse

    got = float(
        distillation_mse(
            jnp.asarray(student), jnp.asarray(s_len), jnp.asarray(teacher), jnp.asarray(t_len)
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_invalid_remat_policy_raises_value_error():
    """ADVICE r3: a typo'd remat_policy on a directly-constructed
    EncoderConfig (bypassing build_model validation) must raise a clear
    ValueError, not a bare KeyError."""
    import pytest

    from ssd_tpu.models.conformer import _block_cls

    cfg = EncoderConfig(input_dim=16, remat=True, remat_policy="dotz")
    with pytest.raises(ValueError, match="remat_policy"):
        _block_cls(cfg)
