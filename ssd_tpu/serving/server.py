"""HTTP serving front-end with micro-batching.

  python -m ssd_tpu.serving.server --checkpoint results/checkpoints/run/best \
      [--port 8776] [--decoder beam] [--max-batch 8] [--max-wait-ms 10]

Endpoints:
  POST /transcribe     body: {"emg": <base64 of a float32 .npy (samples, C)>}
                       or    {"emg_list": [<base64 npy>, …]}
                       → {"hypotheses": ["text", …], "latency_ms": …}
  POST /stream/start   [{"chunk_frames": …, "left_context_frames": …,
                       "right_context_frames": …}] → {"session": "<id>"}
  POST /stream/feed    {"session": …, "emg": <base64 npy>}
                       → {"hypothesis": "text so far", "final": false}
  POST /stream/finish  {"session": …, ["beam": true]}
                       → {"hypothesis": …, "final": true}  (session closed)
  GET  /healthz        → {"status": "ok"}
  GET  /stats          → per-utterance latency percentiles

Streaming sessions run the chunked bounded-recompute transcriber
(ssd_tpu/serving/streaming.py): per-feed device work is one fixed-shape
window regardless of stream length, and sessions with identical window
geometry share a single compiled executable.

Requests are micro-batched: a collector thread drains the queue up to
``max_batch`` items or ``max_wait_ms``, whichever first, and runs one device
call — the TPU sees large batches even under concurrent single-utterance
load.
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import logging
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import List, Optional

import numpy as np

from ssd_tpu.serving.engine import InferenceEngine

logger = logging.getLogger(__name__)


def _decode_npy(b64: str) -> np.ndarray:
    raw = base64.b64decode(b64)
    arr = np.load(io.BytesIO(raw), allow_pickle=False)
    if arr.ndim != 2:
        raise ValueError(f"expected (samples, channels), got {arr.shape}")
    return arr.astype(np.float32)


def encode_npy(arr: np.ndarray) -> str:
    """Client-side helper: ndarray → base64 npy string."""
    buf = io.BytesIO()
    np.save(buf, np.asarray(arr, np.float32), allow_pickle=False)
    return base64.b64encode(buf.getvalue()).decode("ascii")


class _Request:
    __slots__ = ("emg", "event", "result", "error")

    def __init__(self, emg: np.ndarray):
        self.emg = emg
        self.event = threading.Event()
        self.result: Optional[str] = None
        self.error: Optional[str] = None


class MicroBatcher:
    """Collects requests into device-sized batches."""

    def __init__(self, engine: InferenceEngine, max_batch: int = 8, max_wait_ms: float = 10.0):
        self.engine = engine
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1e3
        self.q: "queue.Queue[_Request]" = queue.Queue()
        # occupancy accounting (mutated only by the collector thread; read
        # by /stats): how full the device batches actually run under load
        self.batches_run = 0
        self.items_run = 0
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._stop = False
        self._thread.start()

    def occupancy(self) -> dict:
        n, items = self.batches_run, self.items_run
        return {
            "batches": n,
            "items": items,
            "mean_batch": round(items / n, 3) if n else None,
            "max_batch": self.max_batch,
        }

    def submit(self, emg: np.ndarray, timeout: float = 60.0) -> str:
        req = _Request(emg)
        self.q.put(req)
        if not req.event.wait(timeout):
            raise TimeoutError("transcription timed out")
        if req.error:
            raise RuntimeError(req.error)
        return req.result  # type: ignore[return-value]

    def shutdown(self) -> None:
        self._stop = True

    def _loop(self) -> None:
        while not self._stop:
            try:
                first = self.q.get(timeout=0.2)
            except queue.Empty:
                continue
            batch: List[_Request] = [first]
            deadline = time.perf_counter() + self.max_wait
            while len(batch) < self.max_batch:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    batch.append(self.q.get(timeout=remaining))
                except queue.Empty:
                    break
            self.batches_run += 1
            self.items_run += len(batch)
            try:
                hyps = self.engine.transcribe([r.emg for r in batch])
                for r, h in zip(batch, hyps):
                    r.result = h
            except Exception as exc:  # pragma: no cover - defensive
                logger.exception("batch failed")
                for r in batch:
                    r.error = str(exc)
            for r in batch:
                r.event.set()


class UnknownSession(KeyError):
    """Stream session id is unknown or expired (HTTP 404, not 400)."""


class StreamSessions:
    """Session registry for chunked streaming transcription."""

    def __init__(self, engine: InferenceEngine, idle_ttl_sec: float = 600.0):
        self.engine = engine
        self.idle_ttl = idle_ttl_sec
        self._sessions: dict = {}
        self._lock = threading.Lock()
        self._counter = 0

    def start(self, **kwargs) -> str:
        from ssd_tpu.serving.streaming import ChunkedStreamingTranscriber

        st = ChunkedStreamingTranscriber(self.engine, **kwargs)
        with self._lock:
            self._counter += 1
            sid = f"s{self._counter:08d}"
            self._sessions[sid] = [st, threading.Lock(), time.monotonic()]
            self._evict_idle()
        return sid

    def _evict_idle(self) -> None:
        now = time.monotonic()
        for sid in [
            s
            for s, v in self._sessions.items()
            # a held per-session lock means a feed/finish is IN FLIGHT right
            # now — never evict mid-operation, however stale the timestamp
            # (the timestamp is only refreshed at _get time, so an operation
            # longer than idle_ttl would otherwise race its own eviction)
            if now - v[2] > self.idle_ttl and not v[1].locked()
        ]:
            del self._sessions[sid]

    def _get(self, sid: str):
        with self._lock:
            # evict here too: a server that stops receiving NEW streams must
            # still reclaim sessions abandoned without /stream/finish
            self._evict_idle()
            entry = self._sessions.get(sid)
            if entry is None:
                raise UnknownSession(f"unknown or expired session {sid!r}")
            entry[2] = time.monotonic()
            return entry

    def feed(self, sid: str, emg: np.ndarray) -> str:
        entry = self._get(sid)
        st, lock, _ = entry
        with lock:
            st.feed(emg)
            hyp = st.hypothesis
            # idle clock starts when the op ENDS — and the write must happen
            # while the session lock is still held: after release, a stale
            # timestamp + unlocked lock is exactly what _evict_idle reclaims,
            # so writing it post-release reopens the evict-vs-feed race for
            # the instant between unlock and the store
            entry[2] = time.monotonic()
        return hyp

    def finish(self, sid: str, beam: bool = False) -> str:
        st, lock, _ = self._get(sid)
        with lock:
            hyp = st.finish(beam=beam)
        with self._lock:
            self._sessions.pop(sid, None)
        return hyp


def make_handler(batcher: MicroBatcher, engine: InferenceEngine):
    sessions = StreamSessions(engine)
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            logger.debug(fmt, *args)

        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"status": "ok"})
            elif self.path == "/stats":
                self._reply(
                    200,
                    {
                        "latency": engine.stats.summary(),
                        "micro_batch": batcher.occupancy(),
                    },
                )
            else:
                self._reply(404, {"error": "not found"})

        def do_POST(self):
            try:
                length = int(self.headers.get("Content-Length", "0"))
                payload = json.loads(self.rfile.read(length)) if length else {}
                t0 = time.perf_counter()
                if self.path == "/transcribe":
                    if "emg_list" in payload:
                        arrays = [_decode_npy(b) for b in payload["emg_list"]]
                        hyps = engine.transcribe(arrays)
                    else:
                        hyps = [batcher.submit(_decode_npy(payload["emg"]))]
                    self._reply(
                        200,
                        {
                            "hypotheses": hyps,
                            "latency_ms": (time.perf_counter() - t0) * 1e3,
                        },
                    )
                elif self.path == "/stream/start":
                    kwargs = {
                        k: int(payload[k])
                        for k in (
                            "chunk_frames",
                            "left_context_frames",
                            "right_context_frames",
                        )
                        if k in payload
                    }
                    if "blank_bias" in payload:
                        kwargs["blank_bias"] = float(payload["blank_bias"])
                    self._reply(200, {"session": sessions.start(**kwargs)})
                elif self.path == "/stream/feed":
                    hyp = sessions.feed(
                        payload["session"], _decode_npy(payload["emg"])
                    )
                    self._reply(200, {"hypothesis": hyp, "final": False})
                elif self.path == "/stream/finish":
                    hyp = sessions.finish(
                        payload["session"], beam=bool(payload.get("beam", False))
                    )
                    self._reply(200, {"hypothesis": hyp, "final": True})
                else:
                    self._reply(404, {"error": "not found"})
            except UnknownSession as exc:
                self._reply(404, {"error": str(exc)})
            except (KeyError, ValueError, TypeError) as exc:
                # Malformed request body (missing fields, bad base64/npy, wrong
                # types) — the caller's fault.
                self._reply(400, {"error": str(exc)})
            except Exception:
                # Anything else (engine/device/compile failures) is server-side:
                # log the full exception, but reply generically — XLA/engine
                # error strings embed paths and shapes callers shouldn't see.
                logger.exception("Internal error handling %s", self.path)
                self._reply(500, {"error": "internal server error"})

    return Handler


def serve(
    checkpoint: Path,
    port: int = 8776,
    decoder: str = "greedy",
    beam_width: int = 50,
    max_batch: int = 8,
    max_wait_ms: float = 10.0,
    warmup: bool = True,
    warmup_grid: bool = False,
    lm_path: Path | None = None,
    alpha: float | None = None,
    beta: float | None = None,
    data_parallel: bool = False,
    quantize: str | None = None,
    compile_cache: Path | None = None,
) -> ThreadingHTTPServer:
    from ssd_tpu.utils.platform import enable_compile_cache

    # server restarts replay every pipeline/decode compile from the cache —
    # cold-start is checkpoint-load + cache reads instead of remote compiles
    enable_compile_cache(str(compile_cache) if compile_cache else None)
    engine = InferenceEngine.from_checkpoint(
        checkpoint, decoder=decoder, beam_width=beam_width,
        lm_path=lm_path, alpha=alpha, beta=beta, data_parallel=data_parallel,
        quantize=quantize,
    )
    if warmup:
        logger.info("Warming compile cache…")
        engine.warmup(grid=warmup_grid)
    batcher = MicroBatcher(engine, max_batch=max_batch, max_wait_ms=max_wait_ms)
    server = ThreadingHTTPServer(("0.0.0.0", port), make_handler(batcher, engine))
    logger.info("Serving on :%d (decoder=%s)", port, decoder)
    return server


def main() -> None:
    from ssd_tpu.utils.config import setup_cli_logging

    setup_cli_logging()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", type=Path, required=True)
    p.add_argument("--port", type=int, default=8776)
    p.add_argument("--decoder", choices=["greedy", "beam"], default="greedy")
    p.add_argument("--beam-width", type=int, default=50)
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--max-wait-ms", type=float, default=10.0)
    p.add_argument("--no-warmup", action="store_true")
    p.add_argument(
        "--warmup-grid", action="store_true",
        help="Pre-compile EVERY (batch × length) bucket at startup — slower "
        "start, flat p99 (no first-request-at-a-new-shape compiles; see "
        "docs/PERF.md 'Serving under concurrent load').",
    )
    p.add_argument("--lm-path", type=Path, help="ARPA LM for on-device fusion (beam only)")
    # None → fall back to the checkpoint config's decoding block (tuned
    # weights), then to 0.5/0.0 — mirrors the eval CLI's precedence
    p.add_argument("--alpha", type=float, default=None)
    p.add_argument("--beta", type=float, default=None)
    p.add_argument(
        "--data-parallel", action="store_true",
        help="Shard request batches over every local device (SPMD serving).",
    )
    p.add_argument(
        "--compile-cache", type=Path, default=None,
        help="Persistent XLA compilation cache dir (default: env "
        "SSD_COMPILE_CACHE) — server restarts skip warmup recompiles.",
    )
    p.add_argument(
        "--quantize", choices=["none", "int8", "int8_prequant"], default=None,
        help="Inference-time dense quantization: int8 serves any float "
        "checkpoint W8A8 on the FFN/pointwise matmuls; int8_prequant "
        "converts the kernels once at load so the forward pays only "
        "activation-side quantization. Pays off only when dense FLOPs "
        "dominate (docs/PERF.md).",
    )
    args = p.parse_args()
    server = serve(
        args.checkpoint,
        port=args.port,
        decoder=args.decoder,
        beam_width=args.beam_width,
        max_batch=args.max_batch,
        max_wait_ms=args.max_wait_ms,
        warmup=not args.no_warmup,
        warmup_grid=args.warmup_grid,
        lm_path=args.lm_path,
        alpha=args.alpha,
        beta=args.beta,
        data_parallel=args.data_parallel,
        quantize=args.quantize,
        compile_cache=args.compile_cache,
    )
    server.serve_forever()


if __name__ == "__main__":
    main()
