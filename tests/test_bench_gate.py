"""Perf-regression gate in bench.py (VERDICT r4 weak #5).

The gate itself must be trustworthy: healthy round-4 numbers pass, a
deliberately slowed run trips it, and a metric that didn't run (None — e.g.
a bench phase skipped on budget) is not a false breach.
"""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from bench import GATES, check_regressions  # noqa: E402

R4_EXTRAS = {
    "mfu_estimate": 0.398,
    "beam50_decode_p50_sec_per_utt": 0.0025,
    "lm_fused_beam50_p50_sec_per_utt": 0.0070,
}


def test_healthy_round4_numbers_pass():
    assert check_regressions(2439.87, R4_EXTRAS) == []


def test_deliberately_slowed_run_trips_every_gate():
    """A halved-throughput run must breach all four gates; a 10% slowdown
    (past the ±4% methodology spread but within the decode gates' wider
    latency slack) must breach at least the train headline."""
    halved = {
        "mfu_estimate": 0.398 * 0.5,
        "beam50_decode_p50_sec_per_utt": 0.0025 / 0.5,
        "lm_fused_beam50_p50_sec_per_utt": 0.0070 / 0.5,
    }
    breaches = check_regressions(2439.87 * 0.5, halved)
    assert len(breaches) == len(GATES), breaches

    mild = check_regressions(2439.87 * 0.90, dict(R4_EXTRAS, mfu_estimate=0.36))
    assert any("value=" in b for b in mild), mild
    assert any("mfu_estimate" in b for b in mild), mild


def test_single_metric_regression_is_isolated():
    extras = dict(R4_EXTRAS, lm_fused_beam50_p50_sec_per_utt=0.012)
    breaches = check_regressions(2439.87, extras)
    assert len(breaches) == 1 and "lm_fused" in breaches[0], breaches


def test_skipped_phase_is_not_a_breach():
    extras = dict(R4_EXTRAS, beam50_decode_p50_sec_per_utt=None)
    assert check_regressions(2439.87, extras) == []


def test_floors_sit_below_the_methodology_spread():
    """The headline floor must tolerate the documented ±4% same-session
    spread (13.12 vs 12.63 ms/step in r4) around the observed 2,440 utt/s —
    otherwise the gate cries wolf on methodology, not regressions."""
    assert check_regressions(2439.87 * 0.96, R4_EXTRAS) == []


def test_bench_importable_and_gate_keys_match_output_schema():
    """Every gated extras key must be one bench.py actually emits — a renamed
    field would silently disable its gate (checked against the emitted-key
    literals in the source, no chip needed)."""
    src = (REPO / "bench.py").read_text()
    for key in GATES:
        if key != "value":
            assert f'"{key}"' in src, key
