"""FLAC decoding via the in-repo native decoder.

Replaces the reference's torchaudio/libsndfile FLAC path
(``src/data/preprocessing.py:139-145``). The decoder
(``native/flac_decoder.cpp``) covers the subset the Gaddy & Klein corpus
uses: 16-bit mono/stereo streams with constant/verbatim/fixed/LPC subframes
and Rice residuals.
"""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Tuple

import numpy as np

from ssd_tpu.utils.native import FlacInfo, load


def decode_flac(path: Path) -> Tuple[np.ndarray, int]:
    """Decode a FLAC file → (float32 samples in [-1, 1], sample_rate).

    Stereo returns shape ``(n, channels)``; mono returns ``(n,)``.
    """
    lib = load()
    if lib is None:
        raise RuntimeError(
            "Native FLAC decoder unavailable (g++/make missing?) — "
            "convert audio to WAV or install a toolchain."
        )
    data = Path(path).read_bytes()
    info = FlacInfo()
    # capacity query
    lib.flac_decode(data, len(data), None, 0, ctypes.byref(info))
    if info.channels == 0:
        raise ValueError(f"Not a decodable FLAC stream: {path}")
    capacity = int(info.total_samples) * info.channels
    if capacity == 0:
        # unknown length in STREAMINFO — size generously from the bitstream
        capacity = max(len(data) * 4, 1 << 20)
    out = np.empty(capacity, dtype=np.int32)
    n = lib.flac_decode(
        data,
        len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        capacity,
        ctypes.byref(info),
    )
    if n < 0:
        raise ValueError(f"FLAC decode failed with code {n} for {path}")
    samples = out[:n]
    scale = float(1 << (info.bits_per_sample - 1))
    audio = samples.astype(np.float32) / scale
    if info.channels > 1:
        audio = audio.reshape(-1, info.channels)
    return audio, int(info.sample_rate)
