"""scan_layers: nn.scan'd block stack ≡ unrolled stack, converter roundtrip,
tp/fsdp partition rules on the stacked (L, …) param layout."""

import numpy as np

import jax
import jax.numpy as jnp

from ssd_tpu.models.conformer import (
    EMGConformerEncoder,
    EncoderConfig,
    stack_block_tree,
    unstack_block_tree,
)

CFG = dict(
    input_dim=16, d_model=32, num_layers=3, num_heads=4, ffn_dim=64,
    depthwise_conv_kernel_size=7, dropout=0.1, subsample_factor=2,
)


def _data(B=2, T=32):
    rng = np.random.default_rng(0)
    emg = jnp.asarray(rng.normal(size=(B, T, 16)).astype(np.float32))
    lengths = jnp.asarray([T, T - 9])
    return emg, lengths


def _models():
    unrolled = EMGConformerEncoder(EncoderConfig(**CFG))
    scanned = EMGConformerEncoder(EncoderConfig(**CFG, scan_layers=True))
    return unrolled, scanned


def _to_scan_vars(variables, num_layers):
    return {
        coll: stack_block_tree(dict(tree), num_layers)
        if coll in ("params", "batch_stats")
        else tree
        for coll, tree in variables.items()
    }


def test_scan_matches_unrolled_eval():
    """Same weights (converted) → identical outputs: scan is a program-shape
    change, not a math change."""
    unrolled, scanned = _models()
    emg, lengths = _data()
    variables = unrolled.init(jax.random.PRNGKey(0), emg, lengths, train=False)
    scan_vars = _to_scan_vars(variables, CFG["num_layers"])

    out_u, len_u = unrolled.apply(variables, emg, lengths, train=False)
    out_s, len_s = scanned.apply(scan_vars, emg, lengths, train=False)
    np.testing.assert_array_equal(np.asarray(len_u), np.asarray(len_s))
    np.testing.assert_allclose(
        np.asarray(out_u), np.asarray(out_s), rtol=1e-6, atol=1e-6
    )


def test_scan_train_step_stats_match():
    """Train mode (dropout off for determinism): batch_stats updates must
    match layer-for-layer through the scan's stacked stats."""
    cfg = dict(CFG, dropout=0.0)
    unrolled = EMGConformerEncoder(EncoderConfig(**cfg))
    scanned = EMGConformerEncoder(EncoderConfig(**cfg, scan_layers=True))
    emg, lengths = _data()
    variables = unrolled.init(jax.random.PRNGKey(0), emg, lengths, train=False)
    scan_vars = _to_scan_vars(variables, CFG["num_layers"])

    (out_u, _), upd_u = unrolled.apply(
        variables, emg, lengths, train=True, mutable=["batch_stats"]
    )
    (out_s, _), upd_s = scanned.apply(
        scan_vars, emg, lengths, train=True, mutable=["batch_stats"]
    )
    # train-mode BatchNorm changes fusion groupings between the scanned and
    # unrolled programs; tiny reassociation differences are expected
    np.testing.assert_allclose(
        np.asarray(out_u), np.asarray(out_s), rtol=1e-5, atol=1e-5
    )
    stacked = stack_block_tree(
        {k: v for k, v in upd_u["batch_stats"].items()}, CFG["num_layers"]
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        ),
        stacked["blocks"],
        dict(upd_s["batch_stats"])["blocks"],
    )


def test_scan_gradients_match():
    unrolled, scanned = _models()
    emg, lengths = _data()
    variables = unrolled.init(jax.random.PRNGKey(0), emg, lengths, train=False)
    scan_vars = _to_scan_vars(variables, CFG["num_layers"])

    def loss_u(p):
        out, _ = unrolled.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            emg, lengths, train=False,
        )
        return jnp.sum(out ** 2)

    def loss_s(p):
        out, _ = scanned.apply(
            {"params": p, "batch_stats": scan_vars["batch_stats"]},
            emg, lengths, train=False,
        )
        return jnp.sum(out ** 2)

    g_u = jax.grad(loss_u)(variables["params"])
    g_s = jax.grad(loss_s)(scan_vars["params"])
    g_u_stacked = stack_block_tree(dict(g_u), CFG["num_layers"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=5e-5
        ),
        g_u_stacked,
        dict(g_s),
    )


def test_scan_matches_unrolled_bf16():
    """compute_dtype=bfloat16 flips dtypes across the block boundary (bf16
    subsampler out, fp32 final_ln out). The scan uses a uniform fp32 carry:
    block_0's residual adds run in fp32 instead of the unrolled stack's bf16
    (strictly more precise), so outputs agree to bf16-rounding — one rounding
    step on the block_0 residual stream, propagated through the LayerNorms —
    not bitwise. (fp32 compute IS bitwise: test_scan_matches_unrolled_eval.)"""
    cfg = dict(CFG, compute_dtype="bfloat16")
    unrolled = EMGConformerEncoder(EncoderConfig(**cfg))
    scanned = EMGConformerEncoder(EncoderConfig(**cfg, scan_layers=True))
    emg, lengths = _data()
    variables = unrolled.init(jax.random.PRNGKey(0), emg, lengths, train=False)
    scan_vars = _to_scan_vars(variables, CFG["num_layers"])
    out_u, _ = unrolled.apply(variables, emg, lengths, train=False)
    out_s, _ = scanned.apply(scan_vars, emg, lengths, train=False)
    u, s = np.asarray(out_u, np.float32), np.asarray(out_s, np.float32)
    # bf16 has ~2⁻⁸ relative precision; normalized activations are O(1)
    assert np.max(np.abs(u - s)) < 0.06, np.max(np.abs(u - s))
    assert np.sqrt(np.mean((u - s) ** 2)) < 0.01, "drift beyond bf16 rounding"


def test_scan_composes_with_sequence_parallel():
    """sp sharding constraints inside the nn.scan body: tp×sp mesh output
    equals the no-mesh scanned output."""
    from ssd_tpu.parallel.mesh import make_mesh

    cfg = EncoderConfig(**CFG, scan_layers=True, sequence_parallel=True)
    model = EMGConformerEncoder(cfg)
    rng = np.random.default_rng(0)
    emg = jnp.asarray(rng.normal(size=(4, 32, 16)).astype(np.float32))
    lengths = jnp.asarray([32, 23, 30, 17])
    variables = model.init(jax.random.PRNGKey(0), emg, lengths, train=False)
    out_ref, _ = model.apply(variables, emg, lengths, train=False)  # no mesh
    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    with mesh:
        out_sp, _ = jax.jit(lambda v, e, l: model.apply(v, e, l, train=False))(
            variables, emg, lengths
        )
    np.testing.assert_allclose(
        np.asarray(out_ref), np.asarray(out_sp), rtol=1e-5, atol=1e-5
    )


def test_converter_roundtrip():
    unrolled, _ = _models()
    emg, lengths = _data()
    variables = unrolled.init(jax.random.PRNGKey(0), emg, lengths, train=False)
    tree = {k: v for k, v in variables["params"].items() if k != "subsample"}
    back = unstack_block_tree(stack_block_tree(tree, 3), 3)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        tree,
        back,
    )


def test_partition_rules_on_stacked_tree():
    """tp rules shift one dim right under `blocks`; fsdp never shards the
    stack axis."""
    from ssd_tpu.parallel.partition import param_pspec

    class Leaf:
        def __init__(self, shape):
            self.shape = shape

    class K:
        def __init__(self, key):
            self.key = key

    path = tuple(K(k) for k in ("blocks", "block", "ffn1", "w1", "kernel"))
    spec = param_pspec(path, Leaf((3, 32, 64)))
    assert tuple(spec) == (None, None, "model"), spec
    spec = param_pspec(path, Leaf((3, 32, 64)), fsdp_data=2)
    assert tuple(spec) == (None, "data", "model"), spec  # 32 over data, not L=3

    path2 = tuple(K(k) for k in ("blocks", "block", "attn", "mha", "query", "kernel"))
    spec2 = param_pspec(path2, Leaf((3, 32, 4, 8)))
    assert tuple(spec2) == (None, None, "model", None), spec2

    # unstacked rules unchanged
    path3 = tuple(K(k) for k in ("block_0", "ffn1", "w1", "kernel"))
    assert tuple(param_pspec(path3, Leaf((32, 64)))) == (None, "model")


def test_remat_policies_match_no_remat():
    """remat_policy changes WHAT the backward recomputes, never the math:
    every policy's loss and gradients match the no-remat baseline."""
    emg, lengths = _data()
    base_model = EMGConformerEncoder(EncoderConfig(**CFG))
    variables = base_model.init(jax.random.PRNGKey(0), emg, lengths, train=False)

    def val_and_grad(model):
        def loss(p):
            out, _ = model.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                emg, lengths, train=False,
            )
            return jnp.sum(out ** 2)

        return jax.jit(jax.value_and_grad(loss))(variables["params"])

    v0, g0 = val_and_grad(base_model)
    for policy in ("full", "dots", "dots_no_batch"):
        model = EMGConformerEncoder(
            EncoderConfig(**CFG, remat=True, remat_policy=policy)
        )
        v, g = val_and_grad(model)
        np.testing.assert_allclose(np.asarray(v), np.asarray(v0), rtol=1e-6)
        # recompute reorders fp32 reductions, so analytically-zero grads
        # (e.g. attention key bias, softmax shift-invariant) carry ~1e-12
        # noise with huge RELATIVE error; compare at the global grad scale.
        scale = max(
            float(np.max(np.abs(np.asarray(x))))
            for x in jax.tree_util.tree_leaves(g0)
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(g0)
        ):
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(b) / scale, atol=1e-5
            )


def test_remat_policy_validated():
    import pytest

    from ssd_tpu.models.ssd_model import build_model

    cfg = {
        "model": {
            "encoder": {
                "d_model": 32, "num_layers": 2, "num_heads": 4, "ffn_dim": 64,
                "depthwise_conv_kernel_size": 7, "remat": True,
                "remat_policy": "typo",
            },
            "projection_dim": 16,
        }
    }
    with pytest.raises(ValueError, match="remat_policy"):
        build_model(cfg, input_dim=16, vocab_size=8)


def test_scan_remat_composes():
    cfg = EncoderConfig(**CFG, scan_layers=True, remat=True)
    model = EMGConformerEncoder(cfg)
    emg, lengths = _data()
    variables = model.init(jax.random.PRNGKey(0), emg, lengths, train=False)

    def loss(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            emg, lengths, train=False,
        )
        return jnp.sum(out ** 2)

    g = jax.jit(jax.grad(loss))(variables["params"])
    assert all(
        bool(jnp.all(jnp.isfinite(x))) for x in jax.tree_util.tree_leaves(g)
    )


def test_attn_remat_matches_no_remat():
    """attn_remat recomputes ONLY the attention submodule in backward (so the
    (B, H, T, T) probs are never staged as residuals); loss and gradients
    must match the baseline exactly up to fp reassociation."""
    emg, lengths = _data()
    base_model = EMGConformerEncoder(EncoderConfig(**CFG))
    variables = base_model.init(jax.random.PRNGKey(0), emg, lengths, train=False)

    def val_and_grad(model):
        def loss(p):
            out, _ = model.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                emg, lengths, train=False,
            )
            return jnp.sum(out ** 2)

        return jax.jit(jax.value_and_grad(loss))(variables["params"])

    v0, g0 = val_and_grad(base_model)
    model = EMGConformerEncoder(EncoderConfig(**CFG, attn_remat=True))
    v, g = val_and_grad(model)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v0), rtol=1e-6)
    scale = max(
        float(np.max(np.abs(np.asarray(x))))
        for x in jax.tree_util.tree_leaves(g0)
    )
    for a, b in zip(jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(g0)):
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=1e-5
        )


def test_attn_remat_matches_no_remat_with_dropout():
    """Production uses attn_remat with dropout ON (tpu_fast_plus trains at
    0.12): correctness relies on nn.remat replaying the SAME dropout rngs in
    the backward recompute (FastDropout's residual is the key, so the mask is
    regenerated, not saved). Pin train=True equivalence: same params + same
    'dropout' rng → identical loss and gradients vs the non-remat baseline
    (ADVICE r4: the equivalence was only pinned at train=False)."""
    emg, lengths = _data()
    base_model = EMGConformerEncoder(EncoderConfig(**CFG))
    variables = base_model.init(jax.random.PRNGKey(0), emg, lengths, train=False)
    drop_rng = jax.random.PRNGKey(7)

    def val_and_grad(model):
        def loss(p):
            out, _ = model.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                emg, lengths, train=True,
                rngs={"dropout": drop_rng}, mutable=["batch_stats"],
            )[0]
            return jnp.sum(out ** 2)

        return jax.jit(jax.value_and_grad(loss))(variables["params"])

    v0, g0 = val_and_grad(base_model)
    v, g = val_and_grad(EMGConformerEncoder(EncoderConfig(**CFG, attn_remat=True)))
    assert bool(jnp.isfinite(v0))
    np.testing.assert_allclose(np.asarray(v), np.asarray(v0), rtol=1e-6)
    scale = max(
        float(np.max(np.abs(np.asarray(x))))
        for x in jax.tree_util.tree_leaves(g0)
    )
    for a, b in zip(jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(g0)):
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=1e-5
        )


def test_attn_remat_scan_composes():
    """attn_remat composes with the nn.scan'd block stack: traces, runs,
    and yields finite grads (math equivalence is pinned unrolled-side by
    test_attn_remat_matches_no_remat + test_scan_matches_unrolled_eval)."""
    cfg = EncoderConfig(**CFG, scan_layers=True, attn_remat=True)
    model = EMGConformerEncoder(cfg)
    emg, lengths = _data()
    variables = model.init(jax.random.PRNGKey(0), emg, lengths, train=False)

    def loss(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            emg, lengths, train=False,
        )
        return jnp.sum(out ** 2)

    g = jax.jit(jax.grad(loss))(variables["params"])
    assert all(
        bool(jnp.all(jnp.isfinite(x))) for x in jax.tree_util.tree_leaves(g)
    )
