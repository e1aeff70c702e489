"""Distribution tests on the 8-device virtual CPU mesh: mesh construction,
dp loss equivalence vs single-device, tp sharding compile, uneven batches."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssd_tpu.models.conformer import EncoderConfig
from ssd_tpu.models.ssd_model import SSDModel
from ssd_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    pad_batch_to_multiple,
    shard_batch,
)
from ssd_tpu.training.schedules import build_optimizer
from ssd_tpu.training.train import init_state, make_eval_step, make_train_step


def _setup(n_devices=None, model=1, sequence_parallel=False):
    devices = jax.devices()[:n_devices] if n_devices else None
    mesh = make_mesh(model=model, devices=devices)
    enc = EncoderConfig(
        input_dim=16, d_model=32, num_layers=1, num_heads=4, ffn_dim=64,
        depthwise_conv_kernel_size=7, dropout=0.0, subsample_factor=2,
        sequence_parallel=sequence_parallel,
    )
    m = SSDModel(encoder_cfg=enc, projection_dim=12, vocab_size=48)
    cfg = {"optim": {"lr": 1e-3, "weight_decay": 0.0, "clip_grad_norm": 0.0,
                     "grad_accum": 1}}
    tx, _ = build_optimizer(cfg, 10)
    state = init_state(m, tx, 16, jax.random.PRNGKey(0))
    return mesh, m, tx, state


def _batch(B=8, T=32, S=6):
    rng = np.random.default_rng(0)
    return {
        "emg": rng.normal(size=(B, T, 16)).astype(np.float32),
        "emg_lengths": np.full((B,), T, np.int32),
        "tokens": rng.integers(2, 48, size=(B, S)).astype(np.int32),
        "token_lengths": np.full((B,), S, np.int32),
        "weight": np.ones((B,), np.float32),
    }


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    mesh2 = make_mesh(model=2)
    assert mesh2.shape["data"] == 4 and mesh2.shape["model"] == 2
    with pytest.raises(ValueError):
        make_mesh(data=3, model=2)


def test_dp_loss_matches_single_device():
    """The same batch must produce the same loss on 1 device and on the
    8-way data-parallel mesh (XLA psum correctness)."""
    mesh8, model, tx, state = _setup()
    mesh1 = make_mesh(devices=jax.devices()[:1])
    eval_step = make_eval_step(model, blank_id=1, normalize_distill=False)
    lam = jnp.asarray([1.0, 0.0], jnp.float32)
    batch = _batch()
    with mesh8:
        l8 = eval_step(state, shard_batch(mesh8, batch), lam)
        v8 = float(l8["total"])
    with mesh1:
        l1 = eval_step(state, shard_batch(mesh1, batch), lam)
        v1 = float(l1["total"])
    np.testing.assert_allclose(v8, v1, rtol=1e-5)


def test_train_step_on_mesh_with_uneven_batch():
    mesh, model, tx, state = _setup()
    batch = _batch(B=5)  # 5 does not divide 8 → pad with weight-0 rows
    arrays, real = pad_batch_to_multiple(batch, mesh.shape["data"])
    assert real == 5 and arrays["emg"].shape[0] == 8
    arrays["weight"][5:] = 0.0
    lam = jnp.asarray([1.0, 0.0], jnp.float32)

    # weight-0 padding must not change the loss vs the unpadded batch
    eval_step = make_eval_step(model, blank_id=1, normalize_distill=False)
    with mesh:
        padded = float(eval_step(state, shard_batch(mesh, arrays), lam)["total"])
    mesh1 = make_mesh(devices=jax.devices()[:1])
    with mesh1:
        plain = float(eval_step(state, shard_batch(mesh1, _batch(B=5)), lam)["total"])
    np.testing.assert_allclose(padded, plain, rtol=1e-5)

    # train step last: it donates (and thus invalidates) the input state
    train_step = make_train_step(model, tx, blank_id=1, normalize_distill=False)
    with mesh:
        new_state, losses = train_step(
            state, shard_batch(mesh, arrays), lam, jax.random.PRNGKey(0)
        )
    assert np.isfinite(float(losses["total"]))


def test_batch_sharding_places_shards():
    mesh = make_mesh()
    x = np.zeros((16, 4), np.float32)
    arr = jax.device_put(x, batch_sharding(mesh))
    assert len(arr.sharding.device_set) == 8


# ---------------------------------------------------------------- sequence parallel
def test_sp_eval_matches_single_device():
    """Sequence parallelism is annotations only: the tp×sp mesh must produce
    the single-device loss bit-for-tolerance (GSPMD gather/scatter correctness
    through LayerNorm/BatchNorm/attention/depthwise-conv regions)."""
    mesh, model_sp, tx, state = _setup(n_devices=4, model=2, sequence_parallel=True)
    _, model_ref, _, _ = _setup(n_devices=1)  # same init rng → identical params
    eval_step = make_eval_step(model_sp, blank_id=1, normalize_distill=False)
    eval_ref = make_eval_step(model_ref, blank_id=1, normalize_distill=False)
    lam = jnp.asarray([1.0, 0.0], jnp.float32)
    batch = _batch(B=4, T=36)  # T'=18 does not divide model=2·data=2 evenly
    with mesh:
        from ssd_tpu.parallel.partition import shard_state

        sharded = shard_state(mesh, state, fsdp=True)
        v_sp = float(eval_step(sharded, shard_batch(mesh, batch), lam)["total"])
    mesh1 = make_mesh(devices=jax.devices()[:1])
    with mesh1:
        v1 = float(eval_ref(state, shard_batch(mesh1, batch), lam)["total"])
    np.testing.assert_allclose(v_sp, v1, rtol=1e-5)


def test_sp_train_step_matches_single_device():
    mesh, model_sp, tx, state = _setup(n_devices=4, model=2, sequence_parallel=True)
    _, model_ref, tx_ref, state_ref = _setup(n_devices=1)
    lam = jnp.asarray([1.0, 0.0], jnp.float32)
    batch = _batch(B=4, T=32)
    step_sp = make_train_step(model_sp, tx, blank_id=1, normalize_distill=False)
    step_ref = make_train_step(model_ref, tx_ref, blank_id=1, normalize_distill=False)
    with mesh:
        from ssd_tpu.parallel.partition import shard_state

        sharded = shard_state(mesh, state, fsdp=True)
        _, losses_sp = step_sp(sharded, shard_batch(mesh, batch), lam, jax.random.PRNGKey(3))
    mesh1 = make_mesh(devices=jax.devices()[:1])
    with mesh1:
        _, losses_ref = step_ref(
            state_ref, shard_batch(mesh1, batch), lam, jax.random.PRNGKey(3)
        )
    np.testing.assert_allclose(
        float(losses_sp["total"]), float(losses_ref["total"]), rtol=1e-5
    )


def test_sp_flag_is_noop_without_model_axis():
    """A checkpoint trained with parallel.sequence serves on a single device
    (or a dp-only mesh): the constraints must vanish, output identical."""
    _, model_sp, _, state = _setup(n_devices=1, sequence_parallel=True)
    _, model_ref, _, _ = _setup(n_devices=1)
    b = _batch(B=2, T=32)
    args = (jnp.asarray(b["emg"]), jnp.asarray(b["emg_lengths"]))
    vars_ = {"params": state.params, "batch_stats": state.batch_stats}
    out_sp = model_sp.apply(vars_, *args, train=False)  # no mesh context at all
    out_ref = model_ref.apply(vars_, *args, train=False)
    np.testing.assert_array_equal(np.asarray(out_sp[0]), np.asarray(out_ref[0]))


# ---------------------------------------------------------------- launch auto-detect
def test_multihost_launch_detected():
    from ssd_tpu.parallel.mesh import multihost_launch_detected as det

    assert not det({})
    assert not det({"TPU_WORKER_HOSTNAMES": "host0"})  # single host
    assert not det({"SLURM_NTASKS": "1", "OMPI_COMM_WORLD_SIZE": "bogus"})
    assert det({"COORDINATOR_ADDRESS": "10.0.0.1:1234"})
    assert det({"JAX_COORDINATOR_ADDRESS": "10.0.0.1:1234"})
    assert det({"MEGASCALE_COORDINATOR_ADDRESS": "10.0.0.1:1234"})
    assert det({"TPU_WORKER_HOSTNAMES": "host0,host1"})
    assert det({"SLURM_NTASKS": "4"})
    assert det({"OMPI_COMM_WORLD_SIZE": "2"})


def test_maybe_initialize_distributed(monkeypatch):
    from ssd_tpu.parallel import mesh as meshmod

    calls = []
    monkeypatch.setattr(
        meshmod.jax.distributed, "initialize", lambda **kw: calls.append(kw)
    )
    # an active client (launcher already initialized) short-circuits
    monkeypatch.setattr(meshmod, "_distributed_client_active", lambda: True)
    meshmod.maybe_initialize_distributed(env={"COORDINATOR_ADDRESS": "x:1"})
    assert calls == []
    monkeypatch.setattr(meshmod, "_distributed_client_active", lambda: False)
    # no launcher markers → no init attempt
    meshmod.maybe_initialize_distributed(env={})
    assert calls == []
    # auto-detected launcher → bare initialize() (jax reads its own env)
    meshmod.maybe_initialize_distributed(env={"TPU_WORKER_HOSTNAMES": "a,b"})
    assert calls == [{}]
    # explicit contract forwards coordinator/num/id
    calls.clear()
    meshmod.maybe_initialize_distributed(
        env={
            "COORDINATOR_ADDRESS": "10.0.0.1:9999",
            "NUM_PROCESSES": "2",
            "PROCESS_ID": "1",
        }
    )
    assert calls == [
        {"coordinator_address": "10.0.0.1:9999", "num_processes": 2, "process_id": 1}
    ]


def test_maybe_initialize_distributed_survives_backend_already_up(monkeypatch):
    """jax.distributed.initialize raises when the XLA backend is already
    initialized; the guard must warn and continue, never crash (and must not
    itself initialize the backend before calling initialize — review
    finding: jax.process_count() did exactly that)."""
    from ssd_tpu.parallel import mesh as meshmod

    def boom(**kw):
        raise RuntimeError("must be called before any JAX computations")

    monkeypatch.setattr(meshmod, "_distributed_client_active", lambda: False)
    monkeypatch.setattr(meshmod.jax.distributed, "initialize", boom)
    meshmod.maybe_initialize_distributed(env={"SLURM_NTASKS": "4"})  # no raise
