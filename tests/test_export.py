"""jax.export serving artifact: export → reload → parity with the engine."""

import json

import numpy as np
import pytest

from ssd_tpu.training.train import train_from_config

from .helpers import make_tiny_setup

BUCKET = 256  # tiny raw-sample bucket for the tiny featurizer config
CHANNELS = 2


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("export_ckpt")
    cfg, vocab, root = make_tiny_setup(tmp)
    cfg["model"]["encoder"]["input_dim"] = 16  # C*M = 2*8
    cfg["features"]["emg"] = {
        "sample_rate": 1000, "n_fft": 64, "hop_length": 16, "n_mels": 8,
        "normalize": "per_file",
    }
    run_dir = root / "export_run"
    train_from_config(cfg, run_dir, dry_run=True)
    return run_dir / "best"


@pytest.fixture(scope="module")
def exported(tmp_path_factory, ckpt):
    from ssd_tpu.serving.export import export_checkpoint

    out = tmp_path_factory.mktemp("export_artifact")
    export_checkpoint(ckpt, out, batch_sizes=(1, 2), sample_lengths=(BUCKET,))
    return out


def _emg(rng, n_samples):
    return rng.normal(size=(n_samples, CHANNELS)).astype(np.float32)


def test_artifact_layout(exported):
    assert (exported / "manifest.json").exists()
    assert (exported / "vocab.json").exists()
    manifest = json.loads((exported / "manifest.json").read_text())
    assert manifest["format"] == "ssd_tpu.jax_export.v1"
    assert manifest["channels"] == CHANNELS
    assert len(manifest["buckets"]) == 2
    for b in manifest["buckets"]:
        assert (exported / b["file"]).exists()


def test_reload_matches_engine(exported, ckpt, monkeypatch):
    from ssd_tpu.serving import engine as engmod
    from ssd_tpu.serving.export import ExportedTranscriber

    t = ExportedTranscriber.load(exported)
    monkeypatch.setattr(engmod, "SAMPLE_BUCKET", BUCKET)
    monkeypatch.setattr(engmod, "BATCH_BUCKETS", (1, 2))
    engine = engmod.InferenceEngine.from_checkpoint(ckpt, decoder="greedy")
    rng = np.random.default_rng(0)
    emg = [_emg(rng, 180), _emg(rng, 240)]
    got = t.transcribe(emg)
    want = engine.transcribe(emg)
    assert got == want


def test_bucket_overflow_raises(exported):
    from ssd_tpu.serving.export import ExportedTranscriber

    t = ExportedTranscriber.load(exported)
    rng = np.random.default_rng(1)
    with pytest.raises(ValueError, match="no exported bucket"):
        t.transcribe([_emg(rng, BUCKET + 1)])
    with pytest.raises(ValueError, match="no exported bucket"):
        t.transcribe([_emg(rng, 100)] * 3)


def test_cli(tmp_path, ckpt):
    from ssd_tpu.serving.export import ExportedTranscriber, main

    out = tmp_path / "artifact"
    main([
        "--checkpoint", str(ckpt), "--out", str(out),
        "--batch-sizes", "1", "--sample-lengths", str(BUCKET),
    ])
    t = ExportedTranscriber.load(out)
    rng = np.random.default_rng(2)
    hyp = t.transcribe([_emg(rng, 200)])
    assert len(hyp) == 1 and isinstance(hyp[0], str)


def test_export_quantized_prequant(tmp_path, ckpt):
    """--quantize int8_prequant exports a working artifact whose hypotheses
    match the live int8-dynamic engine (same math, prequantized weights)."""
    from ssd_tpu.serving import engine as engmod
    from ssd_tpu.serving.export import ExportedTranscriber, main

    out = tmp_path / "artifact_q"
    main([
        "--checkpoint", str(ckpt), "--out", str(out),
        "--batch-sizes", "1", "--sample-lengths", str(BUCKET),
        "--quantize", "int8_prequant",
    ])
    manifest = json.loads((out / "manifest.json").read_text())
    assert manifest["quantize"] == "int8_prequant"
    t = ExportedTranscriber.load(out)
    rng = np.random.default_rng(3)
    emg = [_emg(rng, 200)]
    got = t.transcribe(emg)
    want = engmod.InferenceEngine.from_checkpoint(
        ckpt, decoder="greedy", quantize="int8"
    ).transcribe(emg)
    assert got == want


def test_platform_mismatch_gives_clear_error(exported, tmp_path, monkeypatch):
    import shutil

    from ssd_tpu.serving.export import ExportedTranscriber

    copy = tmp_path / "foreign"
    shutil.copytree(exported, copy)
    manifest = json.loads((copy / "manifest.json").read_text())
    manifest["platforms"] = ["tpu"]
    (copy / "manifest.json").write_text(json.dumps(manifest))
    with pytest.raises(RuntimeError, match="platform-locked"):
        ExportedTranscriber.load(copy)
