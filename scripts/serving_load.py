"""Serving under concurrent load — p50/p99 latency, throughput, occupancy.

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/serving_load.py \
        --workdir /tmp/ssd_tpu_demo [--clients 2 8 16] [--requests 12]

Starts ``ssd_tpu.serving.server`` in-process on ``<workdir>``'s demo
checkpoint (the single TPU holder), then for each client count N runs N
concurrent clients that mix the two product surfaces:

* even clients: POST /transcribe of a real corpus utterance;
* odd clients: a full /stream session (start → feed×4 → finish).

Reports per-N p50/p99 request latency, aggregate request throughput, and the
MicroBatcher occupancy delta from /stats (how full the device batches
actually ran). Correctness is asserted inline: every /transcribe answer must
equal the serial single-client answer for that utterance (micro-batching and
concurrency must not change decodes — VERDICT r4 weak #4).

Output: one JSON line per client count + a trailing summary line.
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
import urllib.request
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _post(base: str, path: str, payload: dict, timeout: float = 600.0) -> dict:
    req = urllib.request.Request(
        base + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.load(r)


def _get(base: str, path: str) -> dict:
    with urllib.request.urlopen(base + path, timeout=60) as r:
        return json.load(r)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", type=Path, required=True,
                   help="demo_synthetic.py workdir (checkpoint + corpus)")
    p.add_argument("--decoder", choices=["greedy", "beam"], default="beam")
    p.add_argument("--beam-width", type=int, default=16)
    p.add_argument("--clients", type=int, nargs="+", default=[2, 8, 16])
    p.add_argument("--requests", type=int, default=12,
                   help="requests per client (stream clients count one "
                        "session = one request)")
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--max-wait-ms", type=float, default=10.0)
    args = p.parse_args()

    from ssd_tpu.serving.server import encode_npy, serve

    ckpt = args.workdir / "results/checkpoints/demo/best"
    corpus = args.workdir / "data/emg_data/voiced_parallel_data/spk"
    utts = sorted(corpus.glob("*_emg.npy"))[:8]
    emgs = [np.load(u).astype(np.float32) for u in utts]
    assert emgs, f"no corpus utterances under {corpus}"

    t0 = time.time()
    server = serve(ckpt, port=0, decoder=args.decoder,
                   beam_width=args.beam_width, warmup=True,
                   max_batch=args.max_batch, max_wait_ms=args.max_wait_ms)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    startup_s = time.time() - t0

    # serial ground truth per utterance (single client, no contention)
    serial = {}
    for i, emg in enumerate(emgs):
        serial[i] = _post(base, "/transcribe", {"emg": encode_npy(emg)})[
            "hypotheses"][0]
    # warm the streaming executable once so per-N numbers are compile-free
    sid = _post(base, "/stream/start", {"chunk_frames": 8,
                                        "left_context_frames": 16,
                                        "right_context_frames": 8})["session"]
    _post(base, "/stream/feed", {"session": sid,
                                 "emg": encode_npy(emgs[0][:400])})
    _post(base, "/stream/finish", {"session": sid})

    results = []
    for n_clients in args.clients:
        latencies: list = []
        mismatches: list = []
        errors: list = []
        lock = threading.Lock()
        occ0 = _get(base, "/stats")["micro_batch"]

        def transcribe_client(ci: int) -> None:
            for k in range(args.requests):
                u = (ci + k) % len(emgs)
                t = time.perf_counter()
                try:
                    out = _post(base, "/transcribe",
                                {"emg": encode_npy(emgs[u])})
                    dt = time.perf_counter() - t
                    hyp = out["hypotheses"][0]
                    with lock:
                        latencies.append(dt)
                        if hyp != serial[u]:
                            mismatches.append((ci, k, u, hyp, serial[u]))
                except Exception as exc:  # noqa: BLE001
                    with lock:
                        errors.append(f"transcribe c{ci} r{k}: {exc!r}")

        def stream_client(ci: int) -> None:
            for k in range(args.requests):
                u = (ci + k) % len(emgs)
                pieces = np.array_split(emgs[u], 4)
                t = time.perf_counter()
                try:
                    sid = _post(base, "/stream/start",
                                {"chunk_frames": 8, "left_context_frames": 16,
                                 "right_context_frames": 8})["session"]
                    for piece in pieces:
                        _post(base, "/stream/feed",
                              {"session": sid, "emg": encode_npy(piece)})
                    _post(base, "/stream/finish", {"session": sid})
                    with lock:
                        latencies.append(time.perf_counter() - t)
                except Exception as exc:  # noqa: BLE001
                    with lock:
                        errors.append(f"stream c{ci} r{k}: {exc!r}")

        threads = [
            threading.Thread(
                target=transcribe_client if ci % 2 == 0 else stream_client,
                args=(ci,))
            for ci in range(n_clients)
        ]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        occ1 = _get(base, "/stats")["micro_batch"]

        lat = np.asarray(sorted(latencies))
        d_batches = occ1["batches"] - occ0["batches"]
        d_items = occ1["items"] - occ0["items"]
        # lat can be empty when every request errored — still print the row
        # (it carries the error sample that explains the failure)
        pct = (lambda q: round(float(np.percentile(lat, q)) * 1e3, 1)) \
            if lat.size else (lambda q: None)
        row = {
            "clients": n_clients,
            "requests": len(latencies),
            "errors": errors[:5],
            "mismatches": len(mismatches),
            "p50_ms": pct(50),
            "p99_ms": pct(99),
            "wall_s": round(wall, 2),
            "req_per_sec": round(len(latencies) / wall, 2),
            "microbatch_occupancy": (
                round(d_items / d_batches, 2) if d_batches else None
            ),
            "microbatches_run": d_batches,
        }
        results.append(row)
        print(json.dumps(row), flush=True)
        if mismatches:
            print(json.dumps({"first_mismatch": mismatches[0][:5]}),
                  file=sys.stderr, flush=True)

    print(json.dumps({
        "startup_s": round(startup_s, 1),
        "decoder": args.decoder,
        "sweep": results,
        "ok": all(not r["errors"] and r["mismatches"] == 0 for r in results),
    }), flush=True)
    server.shutdown()


if __name__ == "__main__":
    main()
