"""REAL multi-host validation: two jax.distributed processes on CPU.

Unlike the simulated shard tests (test_partition.py), this spawns two actual
JAX processes (gloo CPU collectives, 4 virtual devices each → one 8-device
global mesh) and runs the production train/eval epoch helpers end to end:
global-batch sharded loaders, ``jax.make_array_from_process_local_data``
assembly, cross-process gradient psum. Both processes must step in lockstep
and report identical global losses.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pandas as pd

from ssd_tpu.data.index_dataset import save_index
from ssd_tpu.data.vocab import default_vocab

REPO = Path(__file__).resolve().parents[1]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _corpus(wd: Path, n=13) -> None:
    rng = np.random.default_rng(4)
    rows = []
    d = wd / "features/emg/voiced_parallel_data/s1"
    d.mkdir(parents=True, exist_ok=True)
    for i in range(n):
        t = int(rng.integers(30, 120))
        np.save(d / f"{i}_0.npy", rng.normal(size=(t, 2, 8)).astype(np.float32))
        rows.append(dict(
            utterance_id=f"voiced_parallel_data/s1/{i}_0",
            split="voiced_parallel_data", subset="train", speaker="s1",
            stem=f"{i}_0", emg_path="x", audio_path=None,
            transcript=["hi there", "a cat", "go now fast"][i % 3],
            sentence_index=i, book="", has_audio=True, metadata_json="{}",
        ))
    save_index(pd.DataFrame(rows), wd / "index.parquet")
    default_vocab().to_json(wd / "vocab.json")


def test_two_process_training_lockstep(tmp_path):
    _corpus(tmp_path)
    port = _free_port()

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the axon plugin unregistered
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")

    worker = REPO / "tests" / "multihost_worker.py"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"

    r0 = json.loads((tmp_path / "result_0.json").read_text())
    r1 = json.loads((tmp_path / "result_1.json").read_text())
    assert len(r0["epochs"]) == len(r1["epochs"]) == 2
    for e0, e1 in zip(r0["epochs"], r1["epochs"]):
        # identical step counts (no deadlock) and identical GLOBAL losses
        assert e0["batches"] == e1["batches"] > 0
        np.testing.assert_allclose(e0["train_total"], e1["train_total"], rtol=1e-6)
        np.testing.assert_allclose(e0["val_total"], e1["val_total"], rtol=1e-6)
        assert np.isfinite(e0["train_total"]) and np.isfinite(e0["val_total"])
    # training actually progressed
    assert r0["epochs"][1]["val_total"] < r0["epochs"][0]["val_total"] * 1.5

    # preemption coordination: the signal reached ONLY process 0, yet both
    # processes agreed to stop (collective max) and broke at the same step —
    # no one-sided break, no psum deadlock (a hang would trip the timeout)
    assert r0["preempt"]["agreed"] is True
    assert r1["preempt"]["agreed"] is True
    assert r0["preempt"]["batches"] == r1["preempt"]["batches"] == 0

    # tp×sp×fsdp across processes: the model-axis collectives ran over the
    # distributed backend and both processes computed the same global loss
    np.testing.assert_allclose(r0["tp"]["loss"], r1["tp"]["loss"], rtol=1e-6)
    assert np.isfinite(r0["tp"]["loss"])

    # GPipe across the REAL process boundary: the stage mesh interleaves
    # devices so every microbatch-handoff ppermute crosses processes
    # (gloo transport); identical finite global losses prove the hops
    np.testing.assert_allclose(r0["pp"]["loss"], r1["pp"]["loss"], rtol=1e-6)
    assert np.isfinite(r0["pp"]["loss"])
