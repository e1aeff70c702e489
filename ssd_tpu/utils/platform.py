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
