"""Test configuration: force an 8-device virtual CPU platform.

All tests run on CPU so that the mesh/pjit paths are exercised without TPU
hardware (SURVEY.md §4: multi-device CPU simulation). Must be set before jax
is imported anywhere.

Opt-out: ``SSD_TEST_TPU=1`` leaves the platform alone so the ``tests/tpu/``
suite can compile the Pallas kernels via Mosaic on the attached chip
(VERDICT r2 weak #1). Run it as::

    SSD_TEST_TPU=1 PYTHONPATH=/root/.axon_site:/root/repo \
        python -m pytest tests/tpu -q

(one TPU holder at a time — don't run it while a bench or another TPU
process is live).
"""

import os

if os.environ.get("SSD_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    # NOTE: the persistent compilation cache stays OFF here for test
    # hermeticity (no cross-test executable reuse). History: an earlier jax
    # build SIGABRTed when restoring a cached executable with donated
    # buffers; on jax 0.9.0 the warm restore of the donated train step works
    # on both CPU and the TPU and is covered by
    # test_compile_cache.py::test_warm_cache_restart_of_donated_train_step.

    # The axon TPU plugin can override JAX_PLATFORMS; pin via jax.config too.
    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")
