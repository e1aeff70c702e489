"""Streaming transcription: incremental feed produces refreshed hypotheses."""

import numpy as np
import pytest

from ssd_tpu.training.train import train_from_config

from .helpers import make_tiny_setup


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("stream")
    cfg, vocab, root = make_tiny_setup(tmp)
    cfg["model"]["encoder"]["input_dim"] = 16
    cfg["features"]["emg"] = {
        "sample_rate": 1000, "n_fft": 64, "hop_length": 16, "n_mels": 8,
        "normalize": "per_file",
    }
    run_dir = root / "run"
    train_from_config(cfg, run_dir, dry_run=True)

    from ssd_tpu.serving import engine as engmod

    engmod.SAMPLE_BUCKET = 256
    engmod.BATCH_BUCKETS = (1, 2)
    from ssd_tpu.serving.engine import InferenceEngine

    return InferenceEngine.from_checkpoint(run_dir / "best")


def test_streaming_updates(engine):
    from ssd_tpu.serving.engine import StreamingTranscriber

    rng = np.random.default_rng(0)
    st = StreamingTranscriber(engine, update_every_sec=0.2)
    updates = 0
    for _ in range(6):
        out = st.feed(rng.normal(size=(120, 2)).astype(np.float32))
        if out is not None:
            updates += 1
            assert isinstance(out, str)
    final = st.finish()
    assert isinstance(final, str)
    assert updates >= 2

    st.reset()
    assert st.hypothesis == ""
    # too-short stream yields empty hypothesis without erroring
    st.feed(rng.normal(size=(10, 2)).astype(np.float32))
    assert st.finish() == ""
