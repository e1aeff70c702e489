"""Checkpoint layout converter: unrolled ↔ scan round-trips through real
orbax checkpoints, and the converted model reproduces the source outputs."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssd_tpu.models.ssd_model import build_model
from ssd_tpu.training.checkpoint import load_checkpoint, save_checkpoint
from ssd_tpu.training.convert_layout import convert_payload, main as convert_main

CFG = {
    "model": {
        "encoder": {
            "d_model": 32, "num_layers": 2, "num_heads": 4, "ffn_dim": 64,
            "depthwise_conv_kernel_size": 7, "dropout": 0.0,
            "subsample_factor": 2, "input_dim": 16,
        },
        "projection_dim": 12,
    },
}


@pytest.fixture()
def ckpt(tmp_path):
    model = build_model(CFG, input_dim=16, vocab_size=48)
    emg = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 16)),
                      jnp.float32)
    lengths = jnp.asarray([32, 23])
    variables = model.init(jax.random.PRNGKey(0), emg, lengths, train=False)
    payload = {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
        "epoch": np.asarray(3),
        "step": np.asarray(17),
        "opt_state": {"dummy": np.zeros((2,))},
    }
    save_checkpoint(tmp_path / "run", payload, CFG)
    return tmp_path / "run", model, variables, (emg, lengths)


def test_cli_roundtrip_and_equivalence(ckpt, tmp_path):
    run_dir, model, variables, (emg, lengths) = ckpt
    convert_main([
        "--checkpoint", str(run_dir / "last"),
        "--to", "scan",
        "--output", str(tmp_path / "scan"),
    ])
    scan_cfg = json.loads((tmp_path / "scan" / "config.json").read_text())
    assert scan_cfg["model"]["encoder"]["scan_layers"] is True
    restored = load_checkpoint(tmp_path / "scan" / "last")
    assert int(restored["epoch"]) == 3 and int(restored["step"]) == 17
    assert "opt_state" not in restored

    scan_model = build_model(scan_cfg, input_dim=16, vocab_size=48)
    out_ref = model.apply(variables, emg, lengths, train=False)
    out_scan = scan_model.apply(
        {"params": restored["params"], "batch_stats": restored["batch_stats"]},
        emg, lengths, train=False,
    )
    np.testing.assert_allclose(
        np.asarray(out_ref[0]), np.asarray(out_scan[0]), rtol=1e-6, atol=1e-6
    )

    # … and back
    convert_main([
        "--checkpoint", str(tmp_path / "scan" / "last"),
        "--to", "unrolled",
        "--output", str(tmp_path / "back"),
    ])
    back = load_checkpoint(tmp_path / "back" / "last")
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        {"params": variables["params"]},
        {"params": back["params"]},
    )


def test_pipelined_checkpoint_converts(tmp_path):
    """Pipelined checkpoints use the stacked layout with scan_layers=False;
    layout detection must come from the params tree, and the converted
    config must not carry pipeline_microbatches alongside scan_layers."""
    import numpy as np

    cfg = json.loads(json.dumps(CFG))
    cfg["model"]["encoder"].update(
        {"conv_norm": "layer", "pipeline_microbatches": 2}
    )
    model = build_model(cfg, input_dim=16, vocab_size=48)
    emg = jnp.zeros((2, 32, 16))
    lengths = jnp.asarray([32, 24])
    variables = model.init(jax.random.PRNGKey(0), emg, lengths, train=False)
    payload = {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
        "epoch": np.asarray(1), "step": np.asarray(5),
    }
    save_checkpoint(tmp_path / "pp", payload, cfg)

    convert_main([
        "--checkpoint", str(tmp_path / "pp" / "last"),
        "--to", "unrolled",
        "--output", str(tmp_path / "unrolled"),
    ])
    out_cfg = json.loads((tmp_path / "unrolled" / "config.json").read_text())
    assert out_cfg["model"]["encoder"]["scan_layers"] is False
    assert "pipeline_microbatches" not in out_cfg["model"]["encoder"]
    restored = load_checkpoint(tmp_path / "unrolled" / "last")
    assert "block_0" in restored["params"]["encoder"]
    # … and to scan (stacked leaves unchanged, flag flipped)
    convert_main([
        "--checkpoint", str(tmp_path / "pp" / "last"),
        "--to", "scan",
        "--output", str(tmp_path / "scan"),
    ])
    scan_cfg = json.loads((tmp_path / "scan" / "config.json").read_text())
    assert scan_cfg["model"]["encoder"]["scan_layers"] is True
    assert "pipeline_microbatches" not in scan_cfg["model"]["encoder"]


def test_wrong_direction_rejected(ckpt):
    run_dir, *_ = ckpt
    payload = load_checkpoint(run_dir / "last")
    with pytest.raises(ValueError, match="already"):
        convert_payload(payload, CFG, "unrolled")
