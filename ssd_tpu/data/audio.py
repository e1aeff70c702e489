"""Audio loading + resampling for the teacher pipeline.

Replaces the reference's ``torchaudio.load`` + ``torchaudio.functional.
resample`` (``src/data/preprocessing.py:139-145``): mono conversion (first
channel), polyphase sinc resampling to the teacher rate.

Formats: WAV via stdlib; FLAC via the in-repo native decoder
(:mod:`ssd_tpu.data.flac`) since neither soundfile nor ffmpeg is a
dependency. Unknown formats raise with a clear message.
"""

from __future__ import annotations

import wave
from pathlib import Path

import numpy as np
from scipy.signal import resample_poly


def _load_wav(path: Path) -> tuple[np.ndarray, int]:
    with wave.open(str(path), "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        width = w.getsampwidth()
        channels = w.getnchannels()
        raw = w.readframes(n)
    if width == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif width == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"Unsupported WAV sample width {width} in {path}")
    if channels > 1:
        data = data.reshape(-1, channels)[:, 0]  # keep first channel (mono)
    return data, sr


def _load_flac(path: Path) -> tuple[np.ndarray, int]:
    from ssd_tpu.data.flac import decode_flac

    data, sr = decode_flac(path)
    if data.ndim > 1:
        data = data[:, 0]
    return data.astype(np.float32), sr


def load_audio(path: Path, target_sr: int) -> np.ndarray:
    """Load audio as mono float32 resampled to ``target_sr``."""
    path = Path(path)
    suffix = path.suffix.lower()
    if suffix == ".wav":
        data, sr = _load_wav(path)
    elif suffix == ".flac":
        data, sr = _load_flac(path)
    else:
        raise ValueError(f"Unsupported audio format: {path}")
    if sr != target_sr:
        g = np.gcd(int(sr), int(target_sr))
        data = resample_poly(data, target_sr // g, sr // g).astype(np.float32)
    return data.astype(np.float32)
