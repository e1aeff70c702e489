"""Checkpoint averaging: exact uniform mean through real orbax checkpoints,
counter/config handling, topology and dtype guards."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssd_tpu.models.ssd_model import build_model
from ssd_tpu.training.average_checkpoints import average_payloads, main as avg_main
from ssd_tpu.training.checkpoint import load_checkpoint, save_checkpoint

CFG = {
    "model": {
        "encoder": {
            "d_model": 32, "num_layers": 1, "num_heads": 4, "ffn_dim": 64,
            "depthwise_conv_kernel_size": 7, "dropout": 0.0,
            "subsample_factor": 2, "input_dim": 16,
        },
        "projection_dim": 12,
    },
}


def _payload(seed, epoch):
    model = build_model(CFG, input_dim=16, vocab_size=48)
    emg = jnp.zeros((2, 32, 16))
    variables = model.init(jax.random.PRNGKey(seed), emg, jnp.asarray([32, 24]),
                           train=False)
    return {
        "params": jax.tree_util.tree_map(np.asarray, variables["params"]),
        "batch_stats": jax.tree_util.tree_map(
            np.asarray, variables.get("batch_stats", {})
        ),
        "epoch": np.asarray(epoch),
        "step": np.asarray(epoch * 10),
        "opt_state": {"dummy": np.zeros((2,))},
    }


def test_cli_average_is_exact_mean(tmp_path):
    pays = [_payload(s, epoch=s + 1) for s in range(3)]
    for i, p in enumerate(pays):
        save_checkpoint(tmp_path / f"run{i}", p, CFG)
    avg_main([
        "--checkpoints", *[str(tmp_path / f"run{i}" / "last") for i in range(3)],
        "--output", str(tmp_path / "avg"),
    ])
    got = load_checkpoint(tmp_path / "avg" / "last")
    assert int(got["epoch"]) == 3 and int(got["step"]) == 30
    assert "opt_state" not in got
    assert json.loads((tmp_path / "avg" / "config.json").read_text()) == CFG

    want = jax.tree_util.tree_map(
        lambda *xs: np.mean(np.stack(xs), axis=0), *[p["params"] for p in pays]
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        ),
        want,
        dict(got["params"]),
    )


def test_topology_mismatch_rejected():
    a = {"params": {"w": np.zeros((2, 2), np.float32)},
         "batch_stats": {}, "epoch": np.asarray(1), "step": np.asarray(1)}
    b = {"params": {"w": np.zeros((3, 2), np.float32)},
         "batch_stats": {}, "epoch": np.asarray(1), "step": np.asarray(1)}
    with pytest.raises(ValueError, match="mismatch|dtypes|shape"):
        average_payloads([a, b])


def test_int8_tree_rejected():
    a = {"params": {"w": np.zeros((2, 2), np.int8)}, "batch_stats": {},
         "epoch": np.asarray(1), "step": np.asarray(1)}
    with pytest.raises(ValueError, match="float"):
        average_payloads([a, a])
