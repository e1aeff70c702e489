"""Native library tests: FLAC decoder (against a minimal in-test encoder)
and the edit-distance kernel (against the pure-Python DP)."""

import numpy as np
import pytest

from ssd_tpu.utils.native import load


class _BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def write_signed(self, value, nbits):
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, q):
        self.bits.extend([0] * q + [1])

    def write_rice(self, value, k):
        z = (value << 1) if value >= 0 else ((-value) << 1) - 1
        self.write_unary(z >> k)
        if k:
            self.write(z & ((1 << k) - 1), k)

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def tobytes(self):
        self.align()
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def _encode_flac(channels_data, sample_rate=16000, bps=16, mode="verbatim"):
    """Minimal FLAC encoder: one frame, fixed blocksize (exact sample count)."""
    n = len(channels_data[0])
    ch = len(channels_data)

    w = _BitWriter()
    # STREAMINFO block
    w.write(0x664C6143, 32)  # "fLaC"
    w.write(0x80, 8)  # last metadata block, type 0
    w.write(34, 24)
    w.write(n, 16)  # min blocksize
    w.write(n, 16)  # max blocksize
    w.write(0, 24)  # min frame size
    w.write(0, 24)  # max frame size
    w.write(sample_rate, 20)
    w.write(ch - 1, 3)
    w.write(bps - 1, 5)
    w.write(n, 36)  # total samples
    w.write(0, 128)  # md5

    # frame header
    w.write(0x3FFE, 14)
    w.write(0, 1)  # reserved
    w.write(0, 1)  # fixed blocksize strategy
    w.write(7, 4)  # blocksize code 7: 16-bit value follows
    w.write(0, 4)  # sample rate: from streaminfo
    w.write(ch - 1, 4)  # independent channels
    w.write(4, 3)  # sample size 16-bit
    w.write(0, 1)
    w.write(0, 8)  # frame number 0 (utf8, 1 byte)
    w.write(n - 1, 16)  # blocksize-1
    w.write(0, 8)  # crc8 (not verified)

    for data in channels_data:
        w.write(0, 1)  # padding
        if mode == "verbatim":
            w.write(1, 6)
            w.write(0, 1)  # no wasted bits
            for s in data:
                w.write_signed(int(s), bps)
        elif mode == "constant":
            w.write(0, 6)
            w.write(0, 1)
            w.write_signed(int(data[0]), bps)
        elif mode == "fixed2":
            order = 2
            w.write(8 + order, 6)
            w.write(0, 1)
            for s in data[:order]:
                w.write_signed(int(s), bps)
            # residual: method 0 (4-bit rice), partition order 0
            w.write(0, 2)
            w.write(0, 4)
            k = 6
            w.write(k, 4)
            for i in range(order, n):
                r = int(data[i]) - 2 * int(data[i - 1]) + int(data[i - 2])
                w.write_rice(r, k)
        else:
            raise ValueError(mode)

    w.align()
    w.write(0, 16)  # crc16 (not verified)
    return w.tobytes()


needs_native = pytest.mark.skipif(load() is None, reason="native lib unavailable")


@needs_native
@pytest.mark.parametrize("mode", ["verbatim", "constant", "fixed2"])
def test_flac_roundtrip_mono(tmp_path, mode):
    from ssd_tpu.data.flac import decode_flac

    rng = np.random.default_rng(0)
    if mode == "constant":
        data = np.full(1000, 1234, np.int32)
    else:
        data = rng.integers(-20000, 20000, size=1000).astype(np.int32)
    raw = _encode_flac([data], mode=mode)
    path = tmp_path / "test.flac"
    path.write_bytes(raw)
    audio, sr = decode_flac(path)
    assert sr == 16000
    assert audio.shape == (1000,)
    np.testing.assert_allclose(audio, data / 32768.0, atol=1e-6)


@needs_native
def test_flac_roundtrip_stereo(tmp_path):
    from ssd_tpu.data.flac import decode_flac
    from ssd_tpu.data.audio import load_audio

    rng = np.random.default_rng(1)
    left = rng.integers(-30000, 30000, size=500).astype(np.int32)
    right = rng.integers(-30000, 30000, size=500).astype(np.int32)
    path = tmp_path / "st.flac"
    path.write_bytes(_encode_flac([left, right]))
    audio, sr = decode_flac(path)
    assert audio.shape == (500, 2)
    np.testing.assert_allclose(audio[:, 0], left / 32768.0, atol=1e-6)
    np.testing.assert_allclose(audio[:, 1], right / 32768.0, atol=1e-6)
    # load_audio keeps channel 0 and resamples
    mono = load_audio(path, target_sr=8000)
    assert mono.ndim == 1 and len(mono) == 250


@needs_native
def test_native_edit_distance_matches_python():
    from ssd_tpu.evaluation.metrics import _edit_counts_native, _edit_counts_py

    rng = np.random.default_rng(2)
    vocab = list("abcdef")
    for _ in range(25):
        ref = [vocab[i] for i in rng.integers(0, 6, size=rng.integers(0, 15))]
        hyp = [vocab[i] for i in rng.integers(0, 6, size=rng.integers(0, 15))]
        native = _edit_counts_native(ref, hyp)
        py = _edit_counts_py(ref, hyp)
        assert native == py, (ref, hyp)
