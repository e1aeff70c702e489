"""Runtime platform detection.

The attached TPU backend may register under a plugin platform name (``axon``
on this image) rather than ``tpu``, so ``jax.default_backend() == "tpu"``
under-detects real TPU hardware. Detection here keys on the *device*:
``device_kind`` of every Cloud TPU PJRT device starts with ``"TPU"``
regardless of the platform alias.

Used by every Pallas call site to pick Mosaic compilation vs interpret mode,
and by the serving/eval layers to pick the fused featurizer path.
"""

from __future__ import annotations

import jax


def is_tpu_backend() -> bool:
    """True when the default JAX backend is real TPU hardware."""
    if jax.default_backend() == "tpu":
        return True
    try:
        dev = jax.devices()[0]
    except RuntimeError:
        return False
    return dev.platform == "tpu" or dev.device_kind.startswith("TPU")


def pallas_interpret() -> bool:
    """Pallas ``interpret=`` flag: Mosaic on TPU, interpret everywhere else."""
    return not is_tpu_backend()


def enable_compile_cache(cache_dir: "str | None" = None) -> "str | None":
    """Persistent XLA compilation cache — production cold-start control.

    Remote-compiler latency dominates cold starts on TPU pods and on this
    rig (20–240 s per graph, measured); a persistent cache makes trainer
    restarts (preemption recovery), eval re-runs, and server restarts reuse
    every previously compiled executable. Enabled when ``cache_dir`` or the
    ``SSD_COMPILE_CACHE`` env var is set; returns the active path or None.

    The min-compile-time floor is dropped to 0 so the small decode/collate
    jits are cached too — a serving restart should hit for every graph, not
    just the encoder.
    """
    import os
    from pathlib import Path

    path = cache_dir or os.environ.get("SSD_COMPILE_CACHE")
    if not path:
        return None
    Path(path).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return str(path)
