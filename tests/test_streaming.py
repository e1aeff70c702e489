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


# ---------------------------------------------------------------------------
# Chunked streaming (bounded recompute)
# ---------------------------------------------------------------------------


def test_collapse_ids_carries_across_chunks():
    from ssd_tpu.serving.streaming import collapse_ids

    blank, pad = 1, 0
    # first chunk ends on token 5; second begins with 5 → one emission
    out1, carry = collapse_ids([5, 5, blank, 3], blank, blank, pad)
    assert out1 == [5, 3]
    out2, carry = collapse_ids([3, 3, 7], carry, blank, pad)
    assert out2 == [7]  # leading 3 merges with the carried 3
    # blank between repeats separates them
    out3, carry = collapse_ids([blank, 7, pad, 7], carry, blank, pad)
    assert out3 == [7, 7]


def test_chunked_single_window_matches_offline_exactly(engine):
    """A stream short enough for one window decodes identically to offline:
    the window sees the whole signal, the running z-norm equals the per-file
    z-norm and the dynamic-range clip covers the same frames."""
    from ssd_tpu.serving.streaming import ChunkedStreamingTranscriber

    rng = np.random.default_rng(3)
    emg = rng.normal(size=(300, 2)).astype(np.float32)

    st = ChunkedStreamingTranscriber(
        engine, chunk_frames=16, left_context_frames=32, right_context_frames=16
    )
    # F = 1 + (300 − 64)//16 = 15 < S + R → nothing emits during feed
    for i in range(0, 300, 100):
        assert st.feed(emg[i : i + 100]) is None
    chunked = st.finish()

    offline = engine.transcribe([emg])[0]
    assert chunked == offline


def test_chunked_bounded_emits_monotone(engine):
    from ssd_tpu.models.conformer import EncoderConfig, subsampled_lengths
    from ssd_tpu.serving.streaming import ChunkedStreamingTranscriber

    rng = np.random.default_rng(4)
    st = ChunkedStreamingTranscriber(
        engine, chunk_frames=8, left_context_frames=16, right_context_frames=8
    )
    updates = 0
    total = 0
    for _ in range(12):
        piece = rng.normal(size=(120, 2)).astype(np.float32)
        total += len(piece)
        if st.feed(piece) is not None:
            updates += 1
            assert isinstance(st.hypothesis, str)
    assert updates >= 2  # emissions happened DURING the stream
    final = st.finish()
    assert isinstance(final, str)

    # bookkeeping: every frame emitted exactly once, and the emitted
    # subsampled frame count equals the offline encoder's output length
    F = 1 + (total - 64) // 16
    assert st._emitted == F
    enc = EncoderConfig(input_dim=16, subsample_factor=2)
    expected_out = int(subsampled_lengths(np.asarray([F]), enc)[0])
    assert sum(len(l) for l in st._log_probs) == expected_out

    st.reset()
    assert st.hypothesis == "" and st._emitted == 0


def test_chunked_finish_beam(engine):
    from ssd_tpu.serving.streaming import ChunkedStreamingTranscriber

    rng = np.random.default_rng(5)
    st = ChunkedStreamingTranscriber(
        engine, chunk_frames=8, left_context_frames=16, right_context_frames=8
    )
    for _ in range(6):
        st.feed(rng.normal(size=(120, 2)).astype(np.float32))
    out = st.finish(beam=True)
    assert isinstance(out, str)


def test_concurrent_sessions_no_cross_talk(engine):
    """Interleaved sessions with identical inputs produce identical outputs,
    and a beam finish() never perturbs the engine's configured decoder.

    Regression for two review findings: finish(beam=True) used to mutate
    engine.decoder (racing other requests), and the per-geometry jit cache
    used to pin the first session object.
    """
    import threading

    from ssd_tpu.serving.streaming import ChunkedStreamingTranscriber

    rng = np.random.default_rng(11)
    audio = rng.normal(size=(900, 2)).astype(np.float32)
    kw = dict(chunk_frames=8, left_context_frames=16, right_context_frames=4)

    # sequential reference
    ref = ChunkedStreamingTranscriber(engine, **kw)
    for i in range(3):
        ref.feed(audio[i * 300 : (i + 1) * 300])
    want = ref.finish()

    decoder_before = engine.decoder
    sessions = [ChunkedStreamingTranscriber(engine, **kw) for _ in range(4)]
    results = [None] * 4
    errors = []

    def run(i):
        try:
            for j in range(3):
                sessions[i].feed(audio[j * 300 : (j + 1) * 300])
            # odd sessions finish with a one-off beam pass
            results[i] = sessions[i].finish(beam=bool(i % 2))
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=run, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    # greedy finishes match the sequential reference exactly
    assert results[0] == want and results[2] == want
    # beam finishes are deterministic across sessions
    assert results[1] == results[3]
    # the shared engine's decoder setting was never perturbed
    assert engine.decoder == decoder_before
