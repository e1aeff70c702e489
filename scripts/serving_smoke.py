"""Serving smoke against a trained checkpoint — works on any backend.

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/serving_smoke.py \
        --workdir /tmp/ssd_tpu_demo [--decoder beam --beam-width 16]

Starts ``ssd_tpu.serving.server`` in-process on ``<workdir>``'s demo
checkpoint, then drives the full HTTP surface: /healthz, /transcribe on a
REAL corpus utterance (checks the hypothesis against the utterance's
transcript), a /stream session (start → feed ×4 → finish), a malformed body
(expect 400), an unknown session (expect 404), and /stats. Prints one JSON
summary line. This is the serving leg of the on-TPU CLI pipeline drive
(docs/PERF.md "Product CLIs on the chip").
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
import urllib.error
import urllib.request
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", type=Path, required=True,
                   help="demo_synthetic.py workdir (checkpoint + corpus)")
    p.add_argument("--decoder", choices=["greedy", "beam"], default="beam")
    p.add_argument("--beam-width", type=int, default=16)
    args = p.parse_args()

    from ssd_tpu.serving.server import encode_npy, serve

    ckpt = args.workdir / "results/checkpoints/demo/best"
    corpus = args.workdir / "data/emg_data/voiced_parallel_data/spk"
    emg = np.load(corpus / "0_0_emg.npy")
    text = json.loads((corpus / "0_0_info.json").read_text())["text"]

    t0 = time.time()
    server = serve(ckpt, port=0, decoder=args.decoder,
                   beam_width=args.beam_width, warmup=True)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    startup_s = time.time() - t0

    base = f"http://127.0.0.1:{port}"

    def post(path, payload, timeout=600):
        req = urllib.request.Request(
            base + path, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return json.load(r)

    with urllib.request.urlopen(base + "/healthz") as r:
        assert json.load(r)["status"] == "ok"

    t0 = time.time()
    out = post("/transcribe", {"emg": encode_npy(emg.astype(np.float32))})
    transcribe_s = time.time() - t0
    hyp = out["hypotheses"][0]

    # streaming: same utterance fed in 4 pieces
    sid = post("/stream/start", {"chunk_frames": 8,
                                 "left_context_frames": 16,
                                 "right_context_frames": 8})["session"]
    pieces = np.array_split(emg.astype(np.float32), 4)
    t0 = time.time()
    for piece in pieces:
        sout = post("/stream/feed", {"session": sid, "emg": encode_npy(piece)})
        assert sout["final"] is False
    sout = post("/stream/finish", {"session": sid})
    stream_s = time.time() - t0
    assert sout["final"] is True

    for path, payload, want in [
        ("/transcribe", {"wrong_field": 1}, 400),
        ("/stream/feed", {"session": "nope", "emg": encode_npy(pieces[0])}, 404),
    ]:
        try:
            post(path, payload)
            raise AssertionError(f"expected HTTP {want} from {path}")
        except urllib.error.HTTPError as e:
            assert e.code == want, f"{path}: got {e.code}, want {want}"

    with urllib.request.urlopen(base + "/stats") as r:
        stats = json.load(r)["latency"]

    import jax

    print(json.dumps({
        "backend": jax.devices()[0].platform,
        "startup_warmup_s": round(startup_s, 1),
        "transcribe_s": round(transcribe_s, 3),
        "hypothesis": hyp,
        "reference": text,
        "exact_match": hyp == text,
        "stream_hypothesis": sout["hypothesis"],
        "stream_s": round(stream_s, 3),
        "server_p50_ms": stats.get("p50_ms"),
        "requests": stats.get("count"),
        "errors_4xx_ok": True,
    }))
    server.shutdown()


if __name__ == "__main__":
    main()
