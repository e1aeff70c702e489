"""Frozen WavLM teacher wrapper — reference API-parity module.

The reference exposes ``FrozenWavLM`` (``src/models/teacher.py:19-56``) even
though the main training path consumes *precomputed* teacher features; this
module preserves that surface. The implementation delegates to the flax
WavLM port (:mod:`ssd_tpu.models.wavlm`).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ssd_tpu.models.wavlm import WavLMTeacher


@dataclass
class TeacherConfig:
    model_name: str = "microsoft/wavlm-base-plus"
    layer: int = 9


class FrozenWavLM:
    """Runtime teacher: waveform (16 kHz mono) → layer hidden states."""

    def __init__(self, cfg: TeacherConfig):
        self.cfg = cfg
        self._teacher = WavLMTeacher.from_pretrained(cfg.model_name, layer=cfg.layer)

    def __call__(self, waveform: np.ndarray, sampling_rate: int = 16000) -> np.ndarray:
        """Returns (frames, dim) float32; resamples if needed."""
        if sampling_rate != 16000:
            from scipy.signal import resample_poly

            g = np.gcd(int(sampling_rate), 16000)
            waveform = resample_poly(waveform, 16000 // g, sampling_rate // g)
        return self._teacher.extract(np.asarray(waveform, np.float32))
