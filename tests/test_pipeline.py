"""GPipe pipeline parallelism (ssd_tpu/parallel/pipeline.py): forward/grad
equivalence vs the no-mesh scan fallback and the unrolled stack, dp×pp train
step, partition specs, and config validation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssd_tpu.models.conformer import (
    EMGConformerEncoder,
    EncoderConfig,
    unstack_block_tree,
)
from ssd_tpu.parallel.mesh import make_mesh, shard_batch
from ssd_tpu.parallel.partition import param_pspec, shard_state

CFG = dict(
    input_dim=16, d_model=32, num_layers=4, num_heads=4, ffn_dim=64,
    depthwise_conv_kernel_size=7, dropout=0.0, subsample_factor=2,
    conv_norm="layer",
)


def _data(B=8, T=32):
    rng = np.random.default_rng(0)
    emg = jnp.asarray(rng.normal(size=(B, T, 16)).astype(np.float32))
    lengths = jnp.asarray(
        rng.integers(T // 2, T + 1, size=(B,)).astype(np.int32)
    )
    return emg, lengths


def _pp_model(microbatches=2, **over):
    cfg = EncoderConfig(**dict(CFG, **over), pipeline_microbatches=microbatches)
    return EMGConformerEncoder(cfg)


@pytest.mark.parametrize("stages,microbatches", [(2, 2), (2, 4), (4, 2)])
def test_pipeline_matches_fallback(stages, microbatches):
    """Pipelined forward over a (data, stages) mesh must equal the same
    params run through the no-mesh scan fallback — for several geometries,
    including bubbles (S=4, M=2)."""
    model = _pp_model(microbatches)
    emg, lengths = _data()
    variables = model.init(jax.random.PRNGKey(0), emg, lengths, train=False)
    out_ref, len_ref = model.apply(variables, emg, lengths, train=False)

    mesh = make_mesh(model=stages, devices=jax.devices()[: 2 * stages])
    with mesh:
        out_pp, len_pp = jax.jit(
            lambda v, e, l: model.apply(v, e, l, train=False)
        )(variables, emg, lengths)
    np.testing.assert_array_equal(np.asarray(len_ref), np.asarray(len_pp))
    np.testing.assert_allclose(
        np.asarray(out_ref), np.asarray(out_pp), rtol=1e-5, atol=1e-5
    )


def test_pipeline_matches_unrolled_model():
    """The pipelined layout is the scan layout: unstacking its params and
    running the plain unrolled encoder must reproduce the output."""
    model = _pp_model()
    emg, lengths = _data()
    variables = model.init(jax.random.PRNGKey(0), emg, lengths, train=False)
    enc = dict(variables["params"])
    unrolled_params = unstack_block_tree(enc, CFG["num_layers"])
    unrolled = EMGConformerEncoder(EncoderConfig(**CFG))
    out_u, _ = unrolled.apply(
        {"params": unrolled_params}, emg, lengths, train=False
    )
    out_p, _ = model.apply(variables, emg, lengths, train=False)
    np.testing.assert_allclose(
        np.asarray(out_u), np.asarray(out_p), rtol=1e-6, atol=1e-6
    )


def test_pipeline_gradients_match_fallback():
    model = _pp_model()
    emg, lengths = _data()
    variables = model.init(jax.random.PRNGKey(0), emg, lengths, train=False)

    def loss(v):
        out, _ = model.apply(v, emg, lengths, train=False)
        return jnp.sum(out ** 2)

    g_ref = jax.grad(loss)(variables)
    mesh = make_mesh(model=2, devices=jax.devices()[:4])
    with mesh:
        g_pp = jax.jit(jax.grad(loss))(variables)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            # atol covers fp32 reduction reordering (psum over stages) on
            # near-zero grads; real divergence would be orders larger
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-5
        ),
        g_ref,
        g_pp,
    )


def test_pipeline_train_step_dp_pp():
    """Full production train step on a (data=2, stages=2) mesh with the
    pipeline partition rules; loss must match the single-device step."""
    from ssd_tpu.models.ssd_model import SSDModel
    from ssd_tpu.training.schedules import build_optimizer
    from ssd_tpu.training.train import init_state, make_train_step

    def build(mb):
        enc = EncoderConfig(**CFG, pipeline_microbatches=mb)
        return SSDModel(encoder_cfg=enc, projection_dim=12, vocab_size=48)

    cfg = {"optim": {"lr": 1e-3, "weight_decay": 0.0, "clip_grad_norm": 0.0,
                     "grad_accum": 1}}
    tx, _ = build_optimizer(cfg, 10)
    model = build(2)
    state = init_state(model, tx, 16, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    B, T, S = 8, 32, 6
    batch = {
        "emg": rng.normal(size=(B, T, 16)).astype(np.float32),
        "emg_lengths": np.full((B,), T, np.int32),
        "tokens": rng.integers(2, 48, size=(B, S)).astype(np.int32),
        "token_lengths": np.full((B,), S, np.int32),
        "weight": np.ones((B,), np.float32),
    }
    lam = jnp.asarray([1.0, 0.0], jnp.float32)
    step = make_train_step(model, tx, blank_id=1, normalize_distill=False)

    mesh1 = make_mesh(devices=jax.devices()[:1])
    state1 = init_state(model, tx, 16, jax.random.PRNGKey(0))
    with mesh1:
        _, losses_ref = step(
            state1, shard_batch(mesh1, batch), lam, jax.random.PRNGKey(3)
        )

    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    with mesh:
        sharded = shard_state(mesh, state, fsdp=False, pipeline=True)
        w1 = sharded.params["encoder"]["blocks"]["block"]["ffn1"]["w1"]["kernel"]
        assert "model" in str(w1.sharding.spec), w1.sharding.spec
        new_state, losses = step(
            sharded, shard_batch(mesh, batch), lam, jax.random.PRNGKey(3)
        )
    np.testing.assert_allclose(
        float(losses["total"]), float(losses_ref["total"]), rtol=1e-5
    )
    assert np.isfinite(float(losses["total"]))


def test_pipeline_composes_with_grad_accum():
    """optax.MultiSteps' accumulated grads embed the param paths, so the
    pipeline partition rules stage-shard them too; two micro-steps must
    apply exactly one optimizer update."""
    from ssd_tpu.models.ssd_model import SSDModel
    from ssd_tpu.training.schedules import build_optimizer
    from ssd_tpu.training.train import init_state, make_train_step

    enc = EncoderConfig(**CFG, pipeline_microbatches=2)
    model = SSDModel(encoder_cfg=enc, projection_dim=12, vocab_size=48)
    cfg = {"optim": {"lr": 1e-3, "weight_decay": 0.0, "clip_grad_norm": 0.0,
                     "grad_accum": 2}}
    tx, _ = build_optimizer(cfg, 10)
    state = init_state(model, tx, 16, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    B, T, S = 8, 32, 6
    batch = {
        "emg": rng.normal(size=(B, T, 16)).astype(np.float32),
        "emg_lengths": np.full((B,), T, np.int32),
        "tokens": rng.integers(2, 48, size=(B, S)).astype(np.int32),
        "token_lengths": np.full((B,), S, np.int32),
        "weight": np.ones((B,), np.float32),
    }
    lam = jnp.asarray([1.0, 0.0], jnp.float32)
    step = make_train_step(model, tx, blank_id=1, normalize_distill=False)
    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    with mesh:
        st = shard_state(mesh, state, pipeline=True)
        w0 = np.asarray(st.params["encoder"]["blocks"]["block"]["ffn1"]["w1"]["kernel"])
        st, l1 = step(st, shard_batch(mesh, batch), lam, jax.random.PRNGKey(3))
        w_mid = np.asarray(
            st.params["encoder"]["blocks"]["block"]["ffn1"]["w1"]["kernel"]
        )
        np.testing.assert_array_equal(w0, w_mid)  # first micro-step: no update
        st, l2 = step(st, shard_batch(mesh, batch), lam, jax.random.PRNGKey(4))
        w_end = np.asarray(
            st.params["encoder"]["blocks"]["block"]["ffn1"]["w1"]["kernel"]
        )
    assert not np.array_equal(w_mid, w_end)  # second micro-step applies
    assert np.isfinite(float(l2["total"]))


def test_pipeline_dropout_smoke():
    """Train mode with dropout: streams differ from the fallback by design;
    the pipelined step must still run and stay finite."""
    model = _pp_model(2, dropout=0.2)
    emg, lengths = _data()
    variables = model.init(jax.random.PRNGKey(0), emg, lengths, train=False)
    mesh = make_mesh(model=2, devices=jax.devices()[:4])
    key = jax.random.key(7, impl="rbg")
    with mesh:
        out, _ = jax.jit(
            lambda v, e, l: model.apply(
                v, e, l, train=True, rngs={"dropout": key}
            )
        )(variables, emg, lengths)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_pipeline_validation():
    from ssd_tpu.parallel.pipeline import validate_pipeline_config

    with pytest.raises(ValueError, match="conv_norm"):
        validate_pipeline_config(
            EncoderConfig(**dict(CFG, conv_norm="batch"), pipeline_microbatches=2)
        )
    with pytest.raises(ValueError, match="scan_layers"):
        validate_pipeline_config(
            EncoderConfig(**CFG, pipeline_microbatches=2, scan_layers=True)
        )
    with pytest.raises(ValueError, match="sequence"):
        validate_pipeline_config(
            EncoderConfig(**CFG, pipeline_microbatches=2, sequence_parallel=True)
        )
    # fine: pipeline off
    validate_pipeline_config(EncoderConfig(**CFG))


def test_pipeline_divisibility_errors():
    model = _pp_model(3)  # B_loc=4 per data shard, M=3 does not divide
    emg, lengths = _data(B=8)
    variables = model.init(jax.random.PRNGKey(0), emg, lengths, train=False)
    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    with mesh:
        with pytest.raises(ValueError, match="not divisible"):
            jax.jit(lambda v, e, l: model.apply(v, e, l, train=False))(
                variables, emg, lengths
            )

    model5 = EMGConformerEncoder(
        EncoderConfig(**dict(CFG, num_layers=5), pipeline_microbatches=2)
    )
    v5 = model5.init(jax.random.PRNGKey(0), emg, lengths, train=False)
    with mesh:
        with pytest.raises(ValueError, match="num_layers"):
            jax.jit(lambda v, e, l: model5.apply(v, e, l, train=False))(
                v5, emg, lengths
            )


def test_pipeline_partition_specs():
    class Leaf:
        def __init__(self, shape):
            self.shape = shape

    class K:
        def __init__(self, key):
            self.key = key

    path = tuple(K(k) for k in ("blocks", "block", "ffn1", "w1", "kernel"))
    spec = param_pspec(path, Leaf((4, 32, 64)), pipeline=True)
    assert tuple(spec) == ("model", None, None), spec
    # fsdp composes on a non-stage dim (largest eligible: 64)
    spec = param_pspec(path, Leaf((4, 32, 64)), fsdp_data=2, pipeline=True)
    assert tuple(spec) == ("model", None, "data"), spec
    # non-block leaves replicate in pipeline mode (no tp)
    path2 = tuple(K(k) for k in ("subsample", "conv_0", "kernel"))
    assert tuple(param_pspec(path2, Leaf((5, 16, 32)), pipeline=True)) == ()
