"""Lazy builder/loader for the native C++ helper library.

``native/libssd_native.so`` (FLAC decoder + edit-distance kernel) is compiled
on first use with the in-repo Makefile (g++). Pure-Python fallbacks exist for
every native entry point, so a missing toolchain only costs speed.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
import threading
from pathlib import Path
from typing import Optional

logger = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SO_PATH = _NATIVE_DIR / "libssd_native.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


class FlacInfo(ctypes.Structure):
    _fields_ = [
        ("sample_rate", ctypes.c_uint32),
        ("channels", ctypes.c_uint32),
        ("bits_per_sample", ctypes.c_uint32),
        ("total_samples", ctypes.c_uint64),
    ]


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s"], cwd=_NATIVE_DIR, check=True, capture_output=True
        )
        return _SO_PATH.exists()
    except (subprocess.CalledProcessError, FileNotFoundError) as exc:
        logger.warning("Native library build failed: %s", exc)
        return False


def load() -> Optional[ctypes.CDLL]:
    """Return the native library, building it on first use; None on failure."""
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not _SO_PATH.exists() and not _build():
            _failed = True
            return None
        try:
            lib = ctypes.CDLL(str(_SO_PATH))
            lib.flac_decode.restype = ctypes.c_longlong
            lib.flac_decode.argtypes = [
                ctypes.c_char_p,
                ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_size_t,
                ctypes.POINTER(FlacInfo),
            ]
            lib.edit_distance_counts.restype = None
            lib.edit_distance_counts.argtypes = [
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32),
            ]
            _lib = lib
        except OSError as exc:  # pragma: no cover - environment-specific
            logger.warning("Native library load failed: %s", exc)
            _failed = True
    return _lib
