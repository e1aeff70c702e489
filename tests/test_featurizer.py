"""Featurizer numerics: golden test against an independent numpy transcription
of the librosa pipeline (STFT center=False, Slaney mel, power_to_db top_db=80,
per-file z-norm) used by the reference (preprocessing.py:67-122)."""

import numpy as np
import pytest

from ssd_tpu.ops import mel as melmod
from ssd_tpu.ops.featurizer import FeaturizerConfig, logmel, logmel_batch

CFG = FeaturizerConfig(sample_rate=1000, n_fft=320, hop_length=10, n_mels=80)


def _naive_logmel(emg: np.ndarray, cfg: FeaturizerConfig) -> np.ndarray:
    """Straight-line numpy port of the reference formulas (loop framing)."""
    window = melmod.hann_window(cfg.n_fft).astype(np.float64)
    fb = melmod.mel_filterbank(
        cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax, dtype=np.float64
    )
    T = cfg.frame_count(emg.shape[0])
    chans = []
    for c in range(emg.shape[1]):
        sig = emg[:, c].astype(np.float64)
        frames = np.stack(
            [sig[t * cfg.hop_length : t * cfg.hop_length + cfg.n_fft] for t in range(T)]
        )
        spec = np.fft.rfft(frames * window, axis=-1)
        power = np.abs(spec) ** 2
        m = power @ fb.T
        logm = 10.0 * np.log10(np.maximum(m, 1e-10))
        logm = np.maximum(logm, logm.max() - 80.0)  # per-channel top_db clip
        chans.append(logm)
    feats = np.stack(chans, axis=1).astype(np.float32)  # (T, C, M)
    if cfg.normalize == "per_file":
        mean = feats.mean()
        std = feats.std() + 1e-8
        feats = (feats - mean) / std
    return feats


@pytest.fixture(scope="module")
def emg():
    rng = np.random.default_rng(0)
    # band-limited noise + tone, 8 channels, ~1.7 s
    t = np.arange(1711) / 1000.0
    sig = rng.normal(size=(1711, 8)).astype(np.float32)
    sig += np.sin(2 * np.pi * 70.0 * t)[:, None].astype(np.float32)
    return sig


def test_mel_filterbank_invariants():
    fb = melmod.mel_filterbank(1000, 320, 80)
    assert fb.shape == (80, 161)
    assert np.all(fb >= 0)
    # every filter has support (no empty rows for this sr/n_mels combo)
    assert np.all(fb.sum(axis=1) > 0)
    # triangles: each row unimodal (diff changes sign at most once on support)
    mids = fb.argmax(axis=1)
    assert np.all(np.diff(mids) >= 0)


def test_hann_periodic():
    w = melmod.hann_window(8)
    # periodic hann: w[0]=0 and len-8 window != symmetric hann
    assert w[0] == 0.0
    assert np.isclose(w[4], 1.0)


def test_logmel_matches_naive(emg):
    got, stats = logmel(emg, CFG)
    want = _naive_logmel(emg, CFG)
    assert got.shape == want.shape == (CFG.frame_count(len(emg)), 8, 80)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)
    assert "mean" in stats and "std" in stats


def test_logmel_no_normalize(emg):
    cfg = FeaturizerConfig(normalize="none")
    got, stats = logmel(emg, cfg)
    want = _naive_logmel(emg, cfg)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)
    assert stats == {}


def test_fused_matches_xla(emg):
    got, _ = logmel(emg, CFG, fused=True)
    want, _ = logmel(emg, CFG, fused=False)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_batch_padding_invariance(emg):
    import jax.numpy as jnp

    n = emg.shape[0]
    padded = np.zeros((2, n + 577, 8), np.float32)
    padded[0, :n] = emg
    padded[1, : n - 500] = emg[: n - 500]
    feats, lengths, mean, std = logmel_batch(
        jnp.asarray(padded), jnp.asarray([n, n - 500]), CFG
    )
    single, _ = logmel(emg, CFG)
    T0 = int(lengths[0])
    assert T0 == CFG.frame_count(n)
    np.testing.assert_allclose(np.asarray(feats[0, :T0]), single, atol=1e-4, rtol=1e-4)
    # second item matches its own standalone featurization
    single2, _ = logmel(emg[: n - 500], CFG)
    T1 = int(lengths[1])
    np.testing.assert_allclose(np.asarray(feats[1, :T1]), single2, atol=1e-4, rtol=1e-4)
    # padding region zeroed
    assert np.all(np.asarray(feats[1, T1:]) == 0)
