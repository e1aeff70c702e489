"""Driver entry points: compile-check entry() and dryrun_multichip at several
device counts; remat variant trains."""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import __graft_entry__ as graft  # noqa: E402


def test_entry_jits():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    log_probs, out_lengths, student = out
    assert log_probs.shape[0] == args[0].shape[0]
    assert np.all(np.isfinite(np.asarray(log_probs)))


@pytest.mark.parametrize("n", [2, 4, 8])
def test_dryrun_multichip(n):
    graft.dryrun_multichip(n)


def test_remat_variant_trains():
    import jax.numpy as jnp

    from ssd_tpu.models.conformer import EncoderConfig
    from ssd_tpu.models.ssd_model import SSDModel

    cfg = EncoderConfig(
        input_dim=16, d_model=32, num_layers=2, num_heads=4, ffn_dim=64,
        depthwise_conv_kernel_size=7, dropout=0.1, subsample_factor=2, remat=True,
    )
    model = SSDModel(encoder_cfg=cfg, projection_dim=12, vocab_size=48)
    x = jnp.zeros((2, 20, 16))
    lengths = jnp.array([20, 18])
    variables = model.init(jax.random.PRNGKey(0), x, lengths, train=False)

    def loss(p):
        out = model.apply(
            {"params": p, "batch_stats": variables.get("batch_stats", {})},
            x, lengths, train=True,
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"],
        )
        (lp, ol, st) = out[0]
        return jnp.sum(lp**2)

    g = jax.grad(loss)(variables["params"])
    assert np.all(np.isfinite(np.asarray(jax.tree_util.tree_leaves(g)[0])))
