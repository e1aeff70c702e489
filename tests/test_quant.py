"""Int8 (W8A8) inference quantization: op parity, checkpoint compatibility,
inference-only gating, and end-to-end quality on the learnable synthetic
corpus. The reference has no quantized path; this guards the TPU-native
extension (``ops/quant.py``, ``model.encoder.quantize: int8``)."""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssd_tpu.data.vocab import Vocab
from ssd_tpu.evaluation.metrics import cer
from ssd_tpu.models.conformer import EncoderConfig
from ssd_tpu.models.ssd_model import SSDModel, build_model
from ssd_tpu.ops.ctc_decode import greedy_decode
from ssd_tpu.ops.quant import int8_dot_general


DENSE_DIMS = (((1,), (0,)), ((), ()))


def test_int8_dot_general_matches_fp32():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(96, 288)).astype(np.float32)
    w = (rng.normal(size=(288, 512)) / np.sqrt(288)).astype(np.float32)
    ref = x @ w
    got = np.asarray(int8_dot_general(jnp.asarray(x), jnp.asarray(w), DENSE_DIMS))
    # symmetric per-token/per-channel int8: ~1e-2 relative error
    rel = np.abs(got - ref) / (np.abs(ref).max() + 1e-9)
    assert rel.max() < 0.02, rel.max()
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.9999, corr


def test_int8_dot_general_ndim3_and_bf16():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 32, 64)).astype(np.float32)
    w = (rng.normal(size=(64, 48)) / 8.0).astype(np.float32)
    dims = (((2,), (0,)), ((), ()))
    ref = np.einsum("btk,kn->btn", x, w)
    got = np.asarray(
        int8_dot_general(
            jnp.asarray(x, jnp.bfloat16), jnp.asarray(w, jnp.bfloat16), dims
        ),
        np.float32,
    )
    assert got.dtype == np.float32  # bf16 output upcast for comparison
    rel = np.abs(got - ref) / (np.abs(ref).max() + 1e-9)
    assert rel.max() < 0.03, rel.max()


def test_int8_dot_general_rejects_non_dense_contractions():
    x = jnp.zeros((4, 8))
    with pytest.raises(NotImplementedError):
        int8_dot_general(x, x, (((0,), (0,)), ((), ())))


def _tiny_models(F=16, vocab_size=7):
    common = dict(
        input_dim=F, d_model=32, num_layers=2, num_heads=4, ffn_dim=64,
        depthwise_conv_kernel_size=7, dropout=0.0, subsample_factor=2,
    )
    m_fp = SSDModel(
        encoder_cfg=EncoderConfig(**common), projection_dim=8, vocab_size=vocab_size
    )
    m_q = SSDModel(
        encoder_cfg=EncoderConfig(**common, quantize="int8"),
        projection_dim=8,
        vocab_size=vocab_size,
    )
    return m_fp, m_q


def test_param_tree_unchanged_by_quantize():
    """A float checkpoint loads into the quantized model verbatim."""
    m_fp, m_q = _tiny_models()
    x = jnp.zeros((2, 24, 16))
    lens = jnp.asarray([24, 20])
    v_fp = m_fp.init(jax.random.PRNGKey(0), x, lens, train=False)
    v_q = m_q.init(jax.random.PRNGKey(0), x, lens, train=False)
    tree_fp = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), v_fp)
    tree_q = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), v_q)
    assert tree_fp == tree_q


def test_quantize_is_inference_only():
    """train=True with quantize: int8 runs the float path bit-exactly."""
    m_fp, m_q = _tiny_models()
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 24, 16)).astype(np.float32))
    lens = jnp.asarray([24, 18])
    variables = m_fp.init(jax.random.PRNGKey(0), x, lens, train=False)
    out_fp, _ = m_fp.apply(
        variables, x, lens, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    out_q, _ = m_q.apply(
        variables, x, lens, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    np.testing.assert_array_equal(np.asarray(out_fp[0]), np.asarray(out_q[0]))


def test_quantized_inference_close_to_float():
    m_fp, m_q = _tiny_models()
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 24, 16)).astype(np.float32))
    lens = jnp.asarray([24, 18])
    variables = m_fp.init(jax.random.PRNGKey(0), x, lens, train=False)
    lp_fp, len_fp, _ = m_fp.apply(variables, x, lens, train=False)
    lp_q, len_q, _ = m_q.apply(variables, x, lens, train=False)
    np.testing.assert_array_equal(np.asarray(len_fp), np.asarray(len_q))
    a, b = np.asarray(lp_fp).ravel(), np.asarray(lp_q).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.999, corr


# -------------------------------------------------- weight pre-quantization
def test_prequant_dot_matches_dynamic():
    """int8_prequant_dot on a prequantized kernel computes the same math as
    the dynamic path (identical quantization formulas, ordered identically)."""
    from ssd_tpu.ops.quant import int8_prequant_dot, prequantize_kernel

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(6, 32, 64)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(64, 48)) / 8.0).astype(np.float32))
    dyn = int8_dot_general(x, w, (((2,), (0,)), ((), ())))
    q, s = prequantize_kernel(w)
    pre = int8_prequant_dot(x, q, s)
    np.testing.assert_allclose(np.asarray(dyn), np.asarray(pre), rtol=1e-6, atol=1e-6)


def test_prequant_model_matches_dynamic_int8():
    """Full model: quantize=int8_prequant over the converted tree must equal
    quantize=int8 over the float tree (bit-compatible by construction)."""
    from ssd_tpu.ops.quant import prequantize_tree

    m_fp, m_q = _tiny_models()
    m_pre = SSDModel(
        encoder_cfg=EncoderConfig(
            input_dim=16, d_model=32, num_layers=2, num_heads=4, ffn_dim=64,
            depthwise_conv_kernel_size=7, dropout=0.0, subsample_factor=2,
            quantize="int8_prequant",
        ),
        projection_dim=8, vocab_size=7,
    )
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 24, 16)).astype(np.float32))
    lens = jnp.asarray([24, 18])
    variables = m_fp.init(jax.random.PRNGKey(0), x, lens, train=False)
    lp_dyn, len_dyn, _ = m_q.apply(variables, x, lens, train=False)

    pre_vars = {
        "params": prequantize_tree(variables["params"]),
        "batch_stats": variables["batch_stats"],
    }
    # converted tree shape-matches the prequant model's own init
    init_pre = m_pre.init(jax.random.PRNGKey(0), x, lens, train=False)
    t_conv = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), pre_vars["params"])
    t_init = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), init_pre["params"])
    assert t_conv == t_init

    lp_pre, len_pre, _ = m_pre.apply(pre_vars, x, lens, train=False)
    np.testing.assert_array_equal(np.asarray(len_dyn), np.asarray(len_pre))
    np.testing.assert_allclose(
        np.asarray(lp_dyn), np.asarray(lp_pre), rtol=1e-5, atol=1e-6
    )


def test_prequant_stacked_tree():
    """prequantize_tree handles the scan_layers stacked (L, in, out) kernels
    (per-layer per-channel scales)."""
    from ssd_tpu.ops.quant import prequantize_kernel, prequantize_tree

    rng = np.random.default_rng(6)
    w = jnp.asarray(rng.normal(size=(3, 16, 8)).astype(np.float32))
    tree = {"blocks": {"block": {"ffn1": {"w1": {"kernel": w, "bias": jnp.zeros((3, 8))}}}}}
    out = prequantize_tree(tree)
    leaf = out["blocks"]["block"]["ffn1"]["w1"]
    assert leaf["kernel"].dtype == jnp.int8 and leaf["kernel"].shape == (3, 16, 8)
    assert leaf["scale"].shape == (3, 8)
    q0, s0 = prequantize_kernel(w[0])
    np.testing.assert_array_equal(np.asarray(leaf["kernel"][0]), np.asarray(q0))
    np.testing.assert_allclose(np.asarray(leaf["scale"][0]), np.asarray(s0))


def test_prequant_rejects_training():
    m_pre = SSDModel(
        encoder_cfg=EncoderConfig(
            input_dim=16, d_model=32, num_layers=1, num_heads=4, ffn_dim=64,
            depthwise_conv_kernel_size=7, dropout=0.0, subsample_factor=2,
            quantize="int8_prequant",
        ),
        projection_dim=8, vocab_size=7,
    )
    x = jnp.zeros((2, 24, 16))
    lens = jnp.asarray([24, 20])
    variables = m_pre.init(jax.random.PRNGKey(0), x, lens, train=False)
    with pytest.raises(ValueError, match="inference-only"):
        m_pre.apply(
            variables, x, lens, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)},
        )


def test_train_cli_rejects_prequant_early():
    from ssd_tpu.training.train import train_from_config

    cfg = {
        "model": {"encoder": {"quantize": "int8_prequant"}},
        "logging": {}, "data": {},
    }
    with pytest.raises(ValueError, match="inference-only"):
        train_from_config(cfg, Path("/tmp/should_not_be_created"))


def test_build_model_rejects_unknown_quantize():
    cfg = {
        "model": {
            "encoder": {
                "d_model": 32, "num_layers": 1, "num_heads": 4, "ffn_dim": 64,
                "depthwise_conv_kernel_size": 7, "quantize": "int4",
            },
            "projection_dim": 8,
        }
    }
    with pytest.raises(ValueError, match="quantize"):
        build_model(cfg, input_dim=16, vocab_size=7)


def test_quantized_decode_quality_end_to_end():
    """Train float on the separable synthetic corpus; serve int8: CER holds.

    Same corpus/recipe as ``test_learning.py`` — templates deterministically
    encode the transcript — so a real quantization-quality regression (not
    just numeric drift) fails the pinned CER ceiling.
    """
    from ssd_tpu.training.schedules import build_optimizer
    from ssd_tpu.training.train import init_state, make_train_step
    from ssd_tpu.parallel.mesh import make_mesh, shard_batch

    rng = np.random.default_rng(0)
    tokens = ["<pad>", "<blank>", "<unk>", "a", "b", "c", "d"]
    vocab = Vocab(tokens=tokens)
    F = 16
    templates = rng.normal(size=(len(tokens), F)).astype(np.float32) * 2

    def render(text):
        frames = []
        for i in vocab.encode(text):
            frames.extend([templates[i]] * 4)
        x = np.asarray(frames)
        return x + rng.normal(size=x.shape).astype(np.float32) * 0.1

    texts = ["abcd", "dcba", "aabb", "cdcd", "badc", "abab", "ddca", "cabd"]
    B, T, S = len(texts), 16, 4
    emg = np.zeros((B, T, F), np.float32)
    emg_lengths = np.zeros((B,), np.int32)
    tok = np.zeros((B, S), np.int32)
    tok_lengths = np.zeros((B,), np.int32)
    for i, t in enumerate(texts):
        x = render(t)
        emg[i, : len(x)] = x
        emg_lengths[i] = len(x)
        ids = vocab.encode(t)
        tok[i, : len(ids)] = ids
        tok_lengths[i] = len(ids)

    m_fp, m_q = _tiny_models(F=F, vocab_size=vocab.size)
    opt_cfg = {"optim": {"lr": 3e-3, "weight_decay": 0.0, "clip_grad_norm": 5.0,
                         "grad_accum": 1}}
    tx, _ = build_optimizer(opt_cfg, 300)
    state = init_state(m_fp, tx, F, jax.random.PRNGKey(0))
    train_step = make_train_step(
        m_fp, tx, blank_id=vocab.blank_id, normalize_distill=False
    )
    batch = {
        "emg": emg, "emg_lengths": emg_lengths,
        "tokens": tok, "token_lengths": tok_lengths,
        "weight": np.ones((B,), np.float32),
    }
    lam = jnp.asarray([1.0, 0.0], jnp.float32)
    key = jax.random.PRNGKey(1)
    mesh = make_mesh()
    with mesh:
        dev_batch = shard_batch(mesh, batch)
        for i in range(250):
            state, losses = train_step(state, dev_batch, lam, key)
            if (i + 1) % 16 == 0:  # keep the dispatch queue shallow (CPU mesh)
                jax.block_until_ready(losses)

        variables = {"params": state.params, "batch_stats": state.batch_stats}
        hyps = {}
        for name, model in (("fp32", m_fp), ("int8", m_q)):
            lp, out_len, _ = model.apply(
                variables, jnp.asarray(emg), jnp.asarray(emg_lengths), train=False
            )
            toks, counts = greedy_decode(lp, out_len, vocab.blank_id, vocab.pad_id)
            hyps[name] = [
                vocab.decode(np.asarray(toks[i, : int(counts[i])])) for i in range(B)
            ]
    assert cer(texts, hyps["fp32"]) < 0.15, hyps["fp32"]
    assert cer(texts, hyps["int8"]) < 0.15, hyps["int8"]
