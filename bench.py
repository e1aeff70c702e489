"""Benchmark harness — ONE JSON line for the driver.

Measures the two headline numbers from BASELINE.md on the attached TPU:

* training throughput (EMG utterances/sec/chip) for the voiced-baseline
  ``tpu_fast_plus`` model — full jitted step: encoder + CTC + distillation
  MSE + AdamW update, realistic shapes (≈7.7 s utterances at 100 fps);
* p50 beam-width-50 decode latency per utterance (reported as extra field).

``vs_baseline`` compares against the reference's Apple-Silicon MPS pipeline,
estimated at 2.0 utterances/sec from the blog's probe wall-clock (~15 min for
6 epochs × 48 batches × batch 5 + val; blog_post.pdf p.4) — the reference
publishes no direct throughput number.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

_T0 = time.time()


def _mark(msg: str) -> None:
    """Phase timing to stderr (stdout stays the one-JSON-line contract)."""
    print(f"[bench +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)

MPS_BASELINE_UTT_PER_SEC = 2.0

# realistic voiced-utterance shapes: ~7.7 s at 100 fps (hop 10 ms), 640-dim
# flattened features, ~128-char transcripts
BATCH = 32
T_FRAMES = 768
TOKENS = 128
INPUT_DIM = 640
VOCAB = 48
TEACHER_DIM = 768
WARMUP_STEPS = 3
MEASURE_STEPS = 20

DECODE_BATCH = 8
DECODE_BEAM = 50

# ---------------------------------------------------------------------------
# Perf-regression gate (VERDICT r4 weak #5): floors/ceilings pinned from the
# r3/r4 history with tunnel-jitter slack. Methodology note: the device-chained
# headline and the same-session batch-sweep disagree by ±4% (13.12 vs
# 12.63 ms/step observed in r4 — different executables, same math), and
# round-over-round headline drift r3→r4 was 2,459 → 2,440 utt/s (−0.8%).
# Floors sit ~6% under the observed band so they fail on a real regression
# (a >5% step-time loss), not on methodology spread or tunnel jitter.
# ---------------------------------------------------------------------------
GATES = {
    # key in extras (or "value" for the headline), (op, threshold)
    "value": (">=", 2300.0),  # utt/s/chip; observed 2,440–2,459
    "mfu_estimate": (">=", 0.37),  # observed 0.398
    "beam50_decode_p50_sec_per_utt": ("<=", 0.0035),  # observed 2.5 ms
    "lm_fused_beam50_p50_sec_per_utt": ("<=", 0.009),  # observed 7.0 ms
}


def check_regressions(value: float, extras: dict) -> list:
    """Return a list of human-readable gate breaches (empty = healthy).

    Metrics that didn't run this time (None — e.g. a phase skipped on
    budget) are NOT breaches; only a measured number can regress.
    """
    breaches = []
    for key, (op, threshold) in GATES.items():
        measured = value if key == "value" else extras.get(key)
        if measured is None:
            continue
        ok = measured >= threshold if op == ">=" else measured <= threshold
        if not ok:
            breaches.append(f"{key}={measured} breaches {op} {threshold}")
    return breaches


# peak bf16 TFLOP/s per chip by device kind (for the MFU estimate)
PEAK_TFLOPS = {
    "TPU v4": 275.0,
    "TPU v5 lite": 197.0,  # v5e
    "TPU v5": 459.0,  # v5p
    "TPU v6 lite": 918.0,  # v6e / Trillium
}


def _train_step_flops() -> float:
    """Analytic matmul FLOPs of one train step (fwd ≈ ⅓, bwd ≈ ⅔).

    Counts every MXU op at the bench shapes: subsampler conv, per-block
    qkv/out + attention scores/values + macaron FFN pair + conv-module
    pointwise/depthwise, projection + CTC heads. Elementwise work is ignored
    (standard MFU convention).
    """
    B, D, H, FFN = BATCH, 288, 6, 1152
    T = T_FRAMES // 2  # post ×2 subsample
    hd = D // H
    mm = lambda m, k, n: 2.0 * m * k * n  # noqa: E731
    sub = mm(B * T, INPUT_DIM * 5, D)  # stride-2 k=5 conv as matmul
    qkvo = 4 * mm(B * T, D, D)
    attn = 2 * 2.0 * B * H * T * T * hd  # scores + values
    ffn = 2 * (mm(B * T, D, FFN) + mm(B * T, FFN, D))
    convm = mm(B * T, D, 2 * D) + mm(B * T, D, D) + 2.0 * B * T * D * 15
    block = qkvo + attn + ffn + convm
    heads = mm(B * T, D, TEACHER_DIM) + mm(B * T, D, VOCAB)
    fwd = sub + 6 * block + heads
    return 3.0 * fwd  # backward ≈ 2× forward


def _timed_slope(run_n, n_small: int, n_large: int) -> float:
    """Per-iteration seconds via two-point slope.

    ``run_n(n)`` must execute n chained iterations and END WITH A SCALAR HOST
    READBACK: on this platform ``block_until_ready`` returns before remote
    execution finishes, so only a device→host transfer gives a true fence.
    The slope cancels the constant dispatch/readback latency.
    """
    run_n(2)  # warm
    t0 = time.perf_counter()
    run_n(n_small)
    t_small = time.perf_counter() - t0
    t0 = time.perf_counter()
    run_n(n_large)
    t_large = time.perf_counter() - t0
    return max((t_large - t_small) / (n_large - n_small), 1e-9)


def bench_train(jax, jnp):
    from ssd_tpu.models.conformer import EncoderConfig
    from ssd_tpu.models.ssd_model import SSDModel
    from ssd_tpu.parallel.mesh import make_mesh, shard_batch
    from ssd_tpu.training.schedules import build_optimizer
    from ssd_tpu.training.train import init_state, make_train_step

    enc_cfg = EncoderConfig(
        input_dim=INPUT_DIM,
        d_model=288,
        num_layers=6,
        num_heads=6,
        ffn_dim=1152,
        depthwise_conv_kernel_size=15,
        dropout=0.12,
        subsample_factor=2,
        compute_dtype="bfloat16",  # production mixed precision (params fp32)
    )
    model = SSDModel(
        encoder_cfg=enc_cfg, projection_dim=TEACHER_DIM, vocab_size=VOCAB, ctc_dropout=0.12
    )
    cfg = {
        "optim": {
            "lr": 3e-4,
            "weight_decay": 1e-2,
            "clip_grad_norm": 5.0,
            "grad_accum": 1,
            "scheduler": {"name": "warmup_hold", "warmup_steps": 800},
        }
    }
    tx, _ = build_optimizer(cfg, total_updates=1000)
    state = init_state(model, tx, INPUT_DIM, jax.random.PRNGKey(0))
    train_step = make_train_step(model, tx, blank_id=1, normalize_distill=False)

    rng = np.random.default_rng(0)
    n_dev = len(jax.devices())
    mesh = make_mesh()
    batch_np = {
        "emg": rng.normal(size=(BATCH, T_FRAMES, INPUT_DIM)).astype(np.float32),
        "emg_lengths": rng.integers(T_FRAMES // 2, T_FRAMES + 1, size=BATCH).astype(np.int32),
        "tokens": rng.integers(2, VOCAB, size=(BATCH, TOKENS)).astype(np.int32),
        "token_lengths": rng.integers(TOKENS // 2, TOKENS + 1, size=BATCH).astype(np.int32),
        "teacher": rng.normal(size=(BATCH, T_FRAMES // 2, TEACHER_DIM)).astype(np.float32),
        "teacher_lengths": np.full((BATCH,), T_FRAMES // 2, np.int32),
        "weight": np.ones((BATCH,), np.float32),
    }
    lambdas = jnp.asarray([0.65, 0.35], jnp.float32)
    drop_rng = jax.random.key(1, impl="rbg")

    with mesh:
        batch = shard_batch(mesh, batch_np)
        final_loss = [0.0]

        # Headline measurement: K steps chained ON DEVICE in one executable
        # (lax.fori_loop, dynamic trip count so one compile serves warmup and
        # both timed points). Per-call host dispatch over the remote tunnel
        # is multi-ms and VARIABLE — an unlucky run of the per-step-dispatch
        # slope once read 26.9 ms/step where the device loop reads 13.6
        # (docs/PERF.md "Measurement methodology"). The two-point slope over
        # loop lengths still cancels the constant dispatch+readback cost.
        @functools.partial(jax.jit, donate_argnums=(0,))
        def run_k_steps(st, k):
            def body(_, carry):
                st, _ = carry
                st, losses = train_step(st, batch, lambdas, drop_rng)
                return st, losses["total"]

            return jax.lax.fori_loop(0, k, body, (st, jnp.float32(0)))

        def run_n(n):
            nonlocal state
            state, total = run_k_steps(state, jnp.int32(n))
            final_loss[0] = float(total)  # scalar readback = true fence

        sec_per_step = _timed_slope(run_n, 10, 40)

    utt_per_sec = BATCH / sec_per_step
    ctx = dict(
        state=state, train_step=train_step, mesh=mesh,
        lambdas=lambdas, drop_rng=drop_rng, batch=batch,
    )
    return utt_per_sec / n_dev, final_loss[0], sec_per_step, ctx


def bench_epoch(jax, jnp, ctx, n_utts=96, epochs=2):
    """End-to-end epoch throughput: DataLoader → collate → shard → step.

    VERDICT r2 weak #3: the headline number proves the device step; this one
    proves the SYSTEM — synthetic feature cache at flagship shapes, the real
    loader/collate path (SpecAugment on), `shard_batch`, and the already-
    compiled train step. Utterance lengths are drawn so every batch pads to
    exactly the bench shapes (768/128/384 buckets) and reuses the train
    executable — no extra compiles inside the timed region.

    Returns ``(full_path_rate, host_only_rate)`` utt/s. On THIS rig the full
    path is dominated by ``device_put`` of ~100 MB/batch over the WAN tunnel
    to the remote chip (~25 MB/s), which a locally-attached TPU does over
    PCIe at ~16 GB/s — so the host-only rate (loader → collate → pad) is the
    number that transfers to production; both are reported (docs/PERF.md).
    """
    import tempfile
    from pathlib import Path

    import pandas as pd

    from ssd_tpu.data.augment import SpecAugmentConfig
    from ssd_tpu.data.dataset import make_dataloader, prefetch
    from ssd_tpu.data.vocab import default_vocab
    from ssd_tpu.parallel.mesh import shard_batch
    from ssd_tpu.training.train import batch_to_arrays

    rng = np.random.default_rng(4)
    words = ["the", "cat", "sat", "on", "mat", "dog", "ran", "quick", "brown"]

    def transcript():
        s = ""
        while len(s) < 100:  # 97..128 chars → token bucket 128
            s += (" " if s else "") + words[rng.integers(len(words))]
        return s[:127]

    with tempfile.TemporaryDirectory() as tmp:
        root = Path(tmp)
        feats = root / "features"
        rows = []
        for i in range(n_utts):
            d = feats / "emg" / "voiced_parallel_data" / "s1"
            td = feats / "teacher" / "voiced_parallel_data" / "s1"
            d.mkdir(parents=True, exist_ok=True)
            td.mkdir(parents=True, exist_ok=True)
            t = int(rng.integers(642, T_FRAMES + 1))  # time bucket → 768
            np.save(d / f"{i}_0.npy", rng.normal(size=(t, 8, 80)).astype(np.float32))
            np.save(
                td / f"{i}_0.npy",
                rng.normal(size=(t // 2, TEACHER_DIM)).astype(np.float32),
            )
            rows.append(dict(
                utterance_id=f"voiced_parallel_data/s1/{i}_0",
                split="voiced_parallel_data", subset="train", speaker="s1",
                stem=f"{i}_0", emg_path="x", audio_path=None,
                transcript=transcript(), sentence_index=i, book="",
                has_audio=True, metadata_json="{}",
            ))
        idx = root / "index.parquet"
        pd.DataFrame(rows).to_parquet(idx)
        loader = make_dataloader(
            idx, feats, ["voiced_parallel_data"], ["train"], default_vocab(),
            batch_size=BATCH, spec_augment_cfg=SpecAugmentConfig(),
        )

        state = ctx["state"]
        mesh = ctx["mesh"]

        def run_epoch(feed_device: bool):
            nonlocal state
            losses = None
            with mesh:
                for batch in prefetch(loader):
                    arrays = batch_to_arrays(batch, include_teacher=True)
                    arrays["weight"][batch.size:] = 0.0
                    if feed_device:
                        sharded = shard_batch(mesh, arrays)
                        state, losses = ctx["train_step"](
                            state, sharded, ctx["lambdas"], ctx["drop_rng"]
                        )
            if losses is not None:
                float(losses["total"])  # scalar readback = fence

        run_epoch(True)  # warm: page cache + any residual compile

        t0 = time.perf_counter()
        for _ in range(epochs):
            loader.epoch += 1
            run_epoch(False)
        host_rate = epochs * n_utts / (time.perf_counter() - t0)

        t0 = time.perf_counter()
        for _ in range(epochs):
            loader.epoch += 1
            run_epoch(True)
        full_rate = epochs * n_utts / (time.perf_counter() - t0)
    # hand the live (post-donation) state back: bench_train's copy was
    # donated to the steps above, and main() measures the per-dispatch
    # slope on this same warm executable afterwards
    ctx["state"] = state
    n_dev = len(jax.devices())
    return full_rate / n_dev, host_rate


def _decode_inputs(jax, jnp):
    rng = np.random.default_rng(2)
    t_out = 256  # ~5 s utterance post-subsample
    logits = rng.normal(size=(DECODE_BATCH, t_out, VOCAB)).astype(np.float32) * 2
    lp = jnp.asarray(logits)
    lp = lp - jax.nn.logsumexp(lp, axis=-1, keepdims=True)
    lengths = jnp.full((DECODE_BATCH,), t_out, jnp.int32)
    return lp, lengths


TOKEN_TOP_K = 16  # production decode path: per-frame token preselection


def warm_decode(jax, jnp):
    """Trigger the beam-search compile (run from a thread to overlap with the
    train bench's compile — the remote compiler handles requests independently)."""
    from ssd_tpu.ops.ctc_decode import beam_search

    lp, lengths = _decode_inputs(jax, jnp)
    _, _, scores = beam_search(
        lp, lengths, blank_id=1, pad_id=0, beam_width=DECODE_BEAM,
        token_top_k=TOKEN_TOP_K,
    )
    float(scores[0, 0])


def bench_decode(jax, jnp, token_top_k=TOKEN_TOP_K, beam_width=DECODE_BEAM):
    from ssd_tpu.ops.ctc_decode import beam_search

    lp, lengths = _decode_inputs(jax, jnp)

    def run_n(n):
        s = None
        for _ in range(n):
            chars, parents, scores = beam_search(
                lp, lengths, blank_id=1, pad_id=0, beam_width=beam_width,
                token_top_k=token_top_k,
            )
            s = scores
        float(s[0, 0])  # scalar readback = fence

    sec_per_batch = _timed_slope(run_n, 3, 9)
    return sec_per_batch / DECODE_BATCH


def _synthetic_char_lm():
    """A realistically sized 5-gram char LM (~40k n-grams) for the fused bench.

    Table size only affects lookup gathers (O(1) per probe), but building a
    non-toy table keeps the HBM-traffic pattern honest.
    """
    from ssd_tpu.data.vocab import default_vocab
    from ssd_tpu.decoding.device_lm import pack_lm
    from ssd_tpu.decoding.lm import train_ngram

    rng = np.random.default_rng(6)
    words = [
        "the", "cat", "sat", "mat", "dog", "ran", "quick", "brown", "fox",
        "jumps", "over", "lazy", "a", "on", "to", "and", "he", "she", "said",
        "is", "here", "there", "play", "silent", "speech", "decode",
    ]
    corpus = [
        " ".join(words[i] for i in rng.integers(0, len(words), size=12))
        for _ in range(1500)
    ]
    vocab = default_vocab()
    lm = train_ngram(corpus, order=5)
    return pack_lm(lm, vocab), vocab


def bench_lm_decode(jax, jnp, token_top_k=TOKEN_TOP_K):
    """p50 per-utterance latency of the LM-FUSED device beam search (width 50).

    Reference bar: pyctcdecode's in-search C-loop fusion
    (``src/decoding/ctc.py:67-96``), per-utterance serial on CPU.
    """
    from ssd_tpu.decoding.device_lm import beam_search_lm_device

    table, vocab = _synthetic_char_lm()
    lp, lengths = _decode_inputs(jax, jnp)

    def run_n(n):
        s = None
        for _ in range(n):
            _, _, scores, _ = beam_search_lm_device(
                lp, lengths, table,
                blank_id=vocab.blank_id, pad_id=vocab.pad_id,
                space_id=vocab.token_to_id[" "], beam_width=DECODE_BEAM,
                alpha=0.5, beta=0.05, token_top_k=token_top_k,
            )
            s = scores
        float(s[0, 0])  # scalar readback = fence

    sec_per_batch = _timed_slope(run_n, 3, 9)
    return sec_per_batch / DECODE_BATCH


def _attach_or_report(jax, jnp, timeout_sec: float) -> None:
    """Bounded first-device-op probe: a wedged remote TPU service makes the
    attach HANG (observed: an 8h UNAVAILABLE window where every attach blocked
    forever) — without this guard the bench would never print its JSON line."""
    import threading

    result: dict = {}

    def probe():
        try:
            x = jnp.ones((8, 8))
            result["ok"] = float((x @ x).sum()) == 512.0
        except Exception as exc:  # noqa: BLE001 - report any attach failure
            result["err"] = str(exc)

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(timeout_sec)
    if result.get("ok"):
        return
    err = result.get("err") or f"device attach did not complete in {timeout_sec:.0f}s"
    print(
        json.dumps(
            {
                "metric": "train_utterances_per_sec_per_chip",
                "value": 0.0,
                "unit": "utt/s/chip",
                "vs_baseline": 0.0,
                "error": f"TPU unavailable: {err}",
            }
        ),
        flush=True,
    )
    sys.exit(1)


def main() -> None:
    import jax
    import jax.numpy as jnp

    # Cold-compile of the two graphs dominates wall-clock (~4–5 min each via
    # the remote TPU compiler); keep total under the driver's budget by
    # skipping the decode bench when the train bench already consumed it.
    budget = float(os.environ.get("SSD_BENCH_BUDGET_SEC", "540"))
    t_start = time.time()
    _attach_or_report(
        jax, jnp, float(os.environ.get("SSD_BENCH_ATTACH_TIMEOUT_SEC", "600"))
    )

    import threading

    warm = threading.Thread(target=warm_decode, args=(jax, jnp), daemon=True)
    warm.start()

    _mark("train bench: compile + measure")
    train_tput, loss, sec_per_step, ctx = bench_train(jax, jnp)
    _mark(f"train done: {train_tput:.0f} utt/s/chip")
    # Remote-compiler latency is highly variable on this rig (the SAME train
    # graph compiled in ~5 min and ~17 min on consecutive runs). With the
    # DEFAULT budget, grant the remaining phases a grace window after the
    # train graph lands; an explicit SSD_BENCH_BUDGET_SEC is a driver-owned
    # hard cap and is honored as-is (overrunning it could get the process
    # killed before the JSON line prints).
    if "SSD_BENCH_BUDGET_SEC" not in os.environ:
        budget = max(budget, (time.time() - t_start) + 480)
    decode_p50 = None
    decode_p50_exact = None
    lm_decode_p50 = None
    epoch_tput = None
    epoch_host = None
    remaining = budget - (time.time() - t_start)
    warm.join(timeout=max(remaining - 30, 0))
    if not warm.is_alive() and remaining > 30:
        decode_p50 = bench_decode(jax, jnp)
        _mark(f"topk decode done: {decode_p50 * 1e3:.1f} ms/utt")
    # epoch mode reuses the train executable — runs AFTER the warm-decode
    # thread has joined so its compile/execution can't contaminate the
    # host-timing-sensitive epoch rates
    if warm.is_alive():
        warm.join(timeout=300)
    if warm.is_alive():
        _mark("epoch skipped: warm-decode compile still running (would skew timing)")
    else:
        try:
            epoch_tput, epoch_host = bench_epoch(jax, jnp, ctx)
            _mark(f"epoch done: full {epoch_tput:.1f}, host {epoch_host:.1f} utt/s")
        except Exception as exc:
            _mark(f"epoch FAILED: {exc!r}")
    # Secondary headline (ADVICE r3): per-HOST-DISPATCH slope on the same
    # warm standalone step executable — what train.py's host-side loop pays
    # on this rig. The device-chained headline excludes that dispatch; both
    # are reported so the methodology difference stays visible. Only runs
    # when the epoch phase compiled the standalone executable (otherwise
    # this would pay a fresh multi-minute remote compile).
    dispatch_sec = None
    if epoch_tput is not None:
        try:
            def run_disp(n):
                st, losses = ctx["state"], None
                for _ in range(n):
                    st, losses = ctx["train_step"](
                        st, ctx["batch"], ctx["lambdas"], ctx["drop_rng"]
                    )
                ctx["state"] = st
                float(losses["total"])  # scalar readback = fence

            with ctx["mesh"]:
                dispatch_sec = _timed_slope(run_disp, 10, 40)
            _mark(f"per-dispatch slope: {dispatch_sec * 1e3:.1f} ms/step")
        except Exception as exc:
            _mark(f"per-dispatch slope FAILED: {exc!r}")
    # LM-fused device search (VERDICT r2 missing #3): its own executable
    if time.time() - t_start < budget - 60:
        try:
            _mark("lm decode: compile + measure")
            lm_decode_p50 = bench_lm_decode(jax, jnp)
            _mark(f"lm decode done: {lm_decode_p50 * 1e3:.1f} ms/utt")
        except Exception as exc:
            _mark(f"lm decode FAILED: {exc!r}")
    # exact (all-token-sort) decode path: the eval CLI default; compile+measure
    # only when real slack remains (a separate executable, and the remote
    # compiler can be slow) or explicitly requested — it is informational
    # (r2 recorded 4.7 ms; docs/PERF.md). 240 s covers the observed exact-path
    # compile (~2–4 min); a fast-compile run (train graph in ~3.5 min) lands
    # here with ~4 min of slack and would miss the number at a 300 s guard.
    if os.environ.get("SSD_BENCH_EXACT") == "1" or (
        time.time() - t_start < budget - 240
    ):
        try:
            _mark("exact decode: compile + measure")
            decode_p50_exact = bench_decode(jax, jnp, token_top_k=None)
            _mark(f"exact decode done: {decode_p50_exact * 1e3:.1f} ms/utt")
        except Exception:
            decode_p50_exact = None
    # beam-100 (BASELINE.md's silent-best decoder width) — informational,
    # only when real slack remains after everything above
    decode_p50_beam100 = None
    if time.time() - t_start < budget - 240:
        try:
            _mark("beam100 decode: compile + measure")
            decode_p50_beam100 = bench_decode(jax, jnp, beam_width=100)
            _mark(f"beam100 done: {decode_p50_beam100 * 1e3:.1f} ms/utt")
        except Exception:
            decode_p50_beam100 = None

    flops = _train_step_flops()
    kind = jax.devices()[0].device_kind
    peak = next((v for k, v in PEAK_TFLOPS.items() if kind.startswith(k)), None)
    achieved_tflops = flops / sec_per_step / 1e12
    extras_for_gate = {
        "mfu_estimate": (
            round(achieved_tflops / (peak * len(jax.devices())), 3) if peak else None
        ),
        "beam50_decode_p50_sec_per_utt": decode_p50,
        "lm_fused_beam50_p50_sec_per_utt": lm_decode_p50,
    }
    regressions = check_regressions(train_tput, extras_for_gate)
    for breach in regressions:
        _mark(f"PERF REGRESSION: {breach}")
    print(
        json.dumps(
            {
                "metric": "train_utterances_per_sec_per_chip",
                "value": round(train_tput, 2),
                "unit": "utt/s/chip",
                "vs_baseline": round(train_tput / MPS_BASELINE_UTT_PER_SEC, 2),
                "regressions": regressions,
                "extras": {
                    "beam50_decode_p50_sec_per_utt": (
                        round(decode_p50, 4) if decode_p50 is not None else None
                    ),
                    "beam50_exact_decode_p50_sec_per_utt": (
                        round(decode_p50_exact, 4)
                        if decode_p50_exact is not None
                        else None
                    ),
                    "beam100_decode_p50_sec_per_utt": (
                        round(decode_p50_beam100, 4)
                        if decode_p50_beam100 is not None
                        else None
                    ),
                    "lm_fused_beam50_p50_sec_per_utt": (
                        round(lm_decode_p50, 4) if lm_decode_p50 is not None else None
                    ),
                    "epoch_utt_per_sec_per_chip": (
                        round(epoch_tput, 1) if epoch_tput is not None else None
                    ),
                    "epoch_host_pipeline_utt_per_sec_per_core": (
                        round(epoch_host, 1) if epoch_host is not None else None
                    ),
                    # full-path epoch rate on THIS rig is bounded by the WAN
                    # tunnel to the remote chip (~100 MB/batch of features);
                    # a PCIe-attached chip moves that in ~6 ms/batch. See
                    # docs/PERF.md "Epoch mode".
                    "epoch_note": "full-path bounded by remote-chip tunnel bandwidth on this rig",
                    "decode_token_top_k": TOKEN_TOP_K,
                    "final_loss": round(loss, 3),
                    "batch": BATCH,
                    "frames": T_FRAMES,
                    "sec_per_step": round(sec_per_step, 5),
                    # headline = device-chained steps (one fori_loop
                    # executable; excludes per-step host dispatch, which on
                    # this remote rig is multi-ms and variable). The
                    # per-dispatch slope below is what a host-side step loop
                    # (training.train) pays here.
                    "headline_methodology": "device-chained fori_loop slope",
                    "sec_per_step_per_dispatch": (
                        round(dispatch_sec, 5) if dispatch_sec is not None else None
                    ),
                    "flops_per_step": round(flops),
                    "achieved_bf16_tflops": round(achieved_tflops, 1),
                    # achieved_tflops is AGGREGATE across the mesh; divide by
                    # the aggregate peak so multi-chip hosts don't inflate MFU
                    "mfu_estimate": (
                        round(achieved_tflops / (peak * len(jax.devices())), 3)
                        if peak
                        else None
                    ),
                    "device_kind": kind,
                    "n_devices": len(jax.devices()),
                    "mps_baseline_estimate_utt_per_sec": MPS_BASELINE_UTT_PER_SEC,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
