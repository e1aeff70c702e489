"""Decoder tests: greedy collapse semantics vs a loop transcription of the
reference (_greedy_decode, src/decoding/ctc.py:16-36) and beam search vs (a)
an exhaustive posterior computation on tiny problems and (b) an independent
Python prefix-beam-search with the same admission/prune rules."""

import itertools
import math

import numpy as np
import pytest

import jax.numpy as jnp

from ssd_tpu.ops.ctc_decode import beam_decode, beam_search, greedy_decode, traceback

BLANK, PAD = 1, 0


def _ref_greedy(log_probs, lengths, blank_id, blank_bias=0.0):
    lp = log_probs.copy()
    if blank_bias:
        lp[:, :, blank_id] += blank_bias
    preds = lp.argmax(-1)
    out = []
    for seq, length in zip(preds, lengths):
        toks, prev = [], None
        for i in range(int(length)):
            t = int(seq[i])
            if t == blank_id:
                prev = t
                continue
            if t == prev:
                continue
            toks.append(t)
            prev = t
        out.append(toks)
    return out


def test_greedy_matches_reference_semantics():
    rng = np.random.default_rng(0)
    B, T, V = 4, 30, 10
    logits = rng.normal(size=(B, T, V)).astype(np.float32) * 2
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    lengths = np.array([30, 17, 1, 24])
    for bias in (0.0, 0.5):
        want = _ref_greedy(lp, lengths, BLANK, bias)
        toks, counts = greedy_decode(jnp.asarray(lp), jnp.asarray(lengths), BLANK, PAD, bias)
        got = [list(np.asarray(toks[i, : int(counts[i])])) for i in range(B)]
        assert got == want


def _exhaustive_best_prefix(lp, blank_id, pad_id):
    """True MAP prefix by brute-force path sum (collapse repeats+blank)."""
    T, V = lp.shape
    # merge pad into blank as the decoder does
    lp = lp.copy()
    lp[:, blank_id] = np.logaddexp(lp[:, blank_id], lp[:, pad_id])
    scores = {}
    for path in itertools.product([v for v in range(V) if v != pad_id], repeat=T):
        logp = sum(lp[t, v] for t, v in enumerate(path))
        # collapse
        out, prev = [], None
        for v in path:
            if v != blank_id and v != prev:
                out.append(v)
            prev = v
        key = tuple(out)
        scores[key] = np.logaddexp(scores.get(key, -np.inf), logp)
    return max(scores.items(), key=lambda kv: kv[1])


def test_beam_finds_map_prefix_small():
    rng = np.random.default_rng(1)
    T, V = 4, 4  # tiny: exhaustive has 3^4 paths
    logits = rng.normal(size=(1, T, V)).astype(np.float32)
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    want, _ = _exhaustive_best_prefix(lp[0], BLANK, PAD)
    got = beam_decode(
        jnp.asarray(lp),
        jnp.asarray([T]),
        blank_id=BLANK,
        pad_id=PAD,
        beam_width=32,
        beam_prune_logp=-1e9,
        token_min_logp=-1e9,
    )
    assert tuple(got[0]) == want


def test_beam_matches_python_prefix_search():
    """Independent Python implementation with the same semantics."""

    def py_beam(lp, K, blank_id, pad_id, prune, tok_min):
        T, V = lp.shape
        lp = lp.copy()
        lp[:, blank_id] = np.logaddexp(lp[:, blank_id], lp[:, pad_id])
        beams = {(): (0.0, -np.inf)}  # prefix -> (p_b, p_nb)
        for t in range(T):
            argmax_v = int(lp[t].argmax())
            cand = {}

            def add(prefix, pb, pnb):
                opb, opnb = cand.get(prefix, (-np.inf, -np.inf))
                cand[prefix] = (np.logaddexp(opb, pb), np.logaddexp(opnb, pnb))

            for prefix, (pb, pnb) in beams.items():
                ptot = np.logaddexp(pb, pnb)
                for v in range(V):
                    l = lp[t, v]
                    if l < tok_min and v != argmax_v:
                        continue
                    if v == pad_id and v != blank_id:
                        continue
                    if v == blank_id:
                        add(prefix, ptot + l, -np.inf)
                    elif prefix and v == prefix[-1]:
                        add(prefix, -np.inf, pnb + l)  # repeat collapses
                        add(prefix + (v,), -np.inf, pb + l)
                    else:
                        add(prefix + (v,), -np.inf, ptot + l)
            scored = sorted(
                cand.items(), key=lambda kv: -np.logaddexp(*kv[1])
            )[:K]
            best = np.logaddexp(*scored[0][1])
            beams = {
                p: v for p, v in scored if np.logaddexp(*v) >= best + prune
            }
        return max(beams.items(), key=lambda kv: np.logaddexp(*kv[1]))[0]

    rng = np.random.default_rng(2)
    B, T, V = 3, 15, 8
    logits = rng.normal(size=(B, T, V)).astype(np.float32) * 1.5
    lp = (logits - np.log(np.exp(logits).sum(-1, keepdims=True))).astype(np.float32)
    lengths = np.array([15, 9, 12])
    got = beam_decode(
        jnp.asarray(lp),
        jnp.asarray(lengths),
        blank_id=BLANK,
        pad_id=PAD,
        beam_width=8,
        beam_prune_logp=-10.0,
        token_min_logp=-5.0,
    )
    for b in range(B):
        want = py_beam(lp[b, : lengths[b]], 8, BLANK, PAD, -10.0, -5.0)
        assert tuple(got[b]) == want, f"batch {b}"


def test_beam_length_masking():
    """Frames beyond `lengths` must not affect the result."""
    rng = np.random.default_rng(3)
    T, V = 12, 8
    logits = rng.normal(size=(1, T, V)).astype(np.float32)
    lp = (logits - np.log(np.exp(logits).sum(-1, keepdims=True))).astype(np.float32)
    full = beam_decode(jnp.asarray(lp[:, :7]), jnp.asarray([7]), BLANK, PAD, 6)
    padded = beam_decode(jnp.asarray(lp), jnp.asarray([7]), BLANK, PAD, 6)
    assert full[0] == padded[0]


def test_token_top_k_matches_exact_on_peaked_logits():
    """Per-frame token preselection is exact when ≤k tokens pass admission
    (the production regime: peaked softmax outputs)."""
    from ssd_tpu.ops.ctc_decode import beam_search

    rng = np.random.default_rng(7)
    B, T, V = 3, 40, 24
    logits = rng.normal(size=(B, T, V)).astype(np.float32)
    logits[:, :, BLANK] += 2.0
    for b in range(B):
        for t in range(T):
            logits[b, t, rng.integers(2, V)] += 5.0
    lp = (logits - np.log(np.exp(logits).sum(-1, keepdims=True))).astype(np.float32)
    lengths = jnp.asarray([40, 25, 33])

    exact = beam_search(jnp.asarray(lp), lengths, BLANK, PAD, 12)
    pruned = beam_search(jnp.asarray(lp), lengths, BLANK, PAD, 12, token_top_k=8)
    want = traceback(np.asarray(exact[0]), np.asarray(exact[1]), 0)
    got = traceback(np.asarray(pruned[0]), np.asarray(pruned[1]), 0)
    assert want == got


def test_token_top_k_matches_exact_production_shape():
    """VERDICT r1 item 4: width 50 / V=48 (the benched production path) —
    top-k preselection must equal the exact all-token sort on peaked logits."""
    from ssd_tpu.ops.ctc_decode import beam_search

    rng = np.random.default_rng(11)
    B, T, V = 4, 64, 48
    logits = rng.normal(size=(B, T, V)).astype(np.float32)
    logits[:, :, BLANK] += 2.0
    for b in range(B):
        for t in range(T):
            logits[b, t, rng.integers(3, V)] += 5.0
    lp = (logits - np.log(np.exp(logits).sum(-1, keepdims=True))).astype(np.float32)
    lengths = jnp.asarray([64, 40, 51, 64])

    exact = beam_search(jnp.asarray(lp), lengths, BLANK, PAD, 50)
    pruned = beam_search(jnp.asarray(lp), lengths, BLANK, PAD, 50, token_top_k=16)
    assert traceback(np.asarray(exact[0]), np.asarray(exact[1]), 0) == traceback(
        np.asarray(pruned[0]), np.asarray(pruned[1]), 0
    )


def _brute_force_map(lp: np.ndarray, blank: int, pad: int):
    """Independent oracle: exact CTC posterior by enumerating ALL V^T
    alignment paths (nothing shared with the implementation under test).
    Returns (best_label_sequence, its log posterior)."""
    from itertools import product

    T, V = lp.shape
    lp = lp.copy()
    lp[:, blank] = np.logaddexp(lp[:, blank], lp[:, pad])
    lp[:, pad] = -np.inf
    scores = {}
    for path in product(range(V), repeat=T):
        if pad in path:
            continue
        s = float(sum(lp[t, v] for t, v in enumerate(path)))
        out, prev = [], -1
        for v in path:
            if v != blank and v != prev:
                out.append(v)
            prev = v
        key = tuple(out)
        scores[key] = np.logaddexp(scores.get(key, -np.inf), s)
    return max(scores.items(), key=lambda kv: kv[1])


def test_beam_matches_brute_force_enumeration():
    """De-circularized golden (VERDICT r1 item 5): with full width and no
    pruning, the device beam search must return the maximum-posterior label
    sequence computed by exhaustive path enumeration."""
    rng = np.random.default_rng(21)
    T, V = 5, 4  # 4^5 = 1024 paths; ≤ 63 distinct prefixes → width 64 covers all
    for seed in range(5):
        rng = np.random.default_rng(100 + seed)
        logits = rng.normal(size=(1, T, V)).astype(np.float32) * 1.5
        lp = (logits - np.log(np.exp(logits).sum(-1, keepdims=True))).astype(np.float32)
        want, _ = _brute_force_map(lp[0], BLANK, PAD)
        got = beam_decode(
            jnp.asarray(lp),
            jnp.asarray([T]),
            BLANK,
            PAD,
            beam_width=64,
            beam_prune_logp=-1e9,
            token_min_logp=-1e9,
        )
        assert tuple(got[0]) == want, f"seed {seed}: {got[0]} != {want}"


def test_build_decoder_token_top_k_threads_through():
    """The factory knob reaches the device kernel (eval CLI parity)."""
    from ssd_tpu.data.vocab import default_vocab
    from ssd_tpu.decoding.ctc import build_decoder

    vocab = default_vocab()
    rng = np.random.default_rng(5)
    B, T = 2, 30
    logits = rng.normal(size=(B, T, vocab.size)).astype(np.float32)
    logits[:, :, vocab.blank_id] += 2.0
    for b in range(B):
        for t in range(T):
            logits[b, t, rng.integers(3, vocab.size)] += 5.0
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    lengths = np.asarray([T, T - 7])

    exact_fn = build_decoder("beam", vocab, beam_width=50)
    topk_fn = build_decoder("beam", vocab, beam_width=50, token_top_k=16)
    assert exact_fn(lp, lengths) == topk_fn(lp, lengths)


def test_beam_blank_bias_suppresses_tokens():
    rng = np.random.default_rng(4)
    T, V = 10, 6
    logits = rng.normal(size=(1, T, V)).astype(np.float32)
    lp = (logits - np.log(np.exp(logits).sum(-1, keepdims=True))).astype(np.float32)
    base = beam_decode(jnp.asarray(lp), jnp.asarray([T]), BLANK, PAD, 8)
    biased = beam_decode(
        jnp.asarray(lp), jnp.asarray([T]), BLANK, PAD, 8, blank_bias=50.0
    )
    assert len(biased[0]) <= len(base[0])
    assert biased[0] == []  # overwhelming bias → all blank
