"""On-device in-search LM fusion for the batched CTC beam search.

The reference fuses a word n-gram during beam search inside pyctcdecode's C
backend (``src/decoding/ctc.py:67-96``); round 1 kept an equivalent *host*
prefix search (``host_beam.py``) — the last CPU-serial decode loop. This
module moves LM fusion onto the TPU:

* the backoff n-gram LM is packed into an **open-addressing hash table** of
  device arrays (two independent 32-bit key streams ≈ one 64-bit key;
  linear probing with a static probe count — lookups are plain gathers);
* every beam carries its **word-history hashes** in the scan exactly like
  prefix hashes: rolling char hashes identify the partial word, rolling
  word-sequence hashes identify the last 1..order−1 completed words;
* when a beam proposes a space, the completed word is scored with the
  standard backoff recursion (longest context first, accumulated backoff
  penalties, ``<unk>`` substitution) — a statically unrolled walk of
  ``order`` masked table lookups, vectorized over (batch, beam);
* fusion follows pyctcdecode/host_beam: fused score ``α·ln10·log10P + β``
  added to the beam's ranking/pruning score (not its acoustic mass), and the
  trailing partial word is scored once at finalization.

Parity with the host search is tested in ``tests/test_device_lm.py``.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ssd_tpu.data.vocab import Vocab
from ssd_tpu.decoding.lm import NGramLM, UNK
from ssd_tpu.ops.ctc_decode import NEG_INF, _segmented_logsumexp, traceback

LN10 = math.log(10.0)

# char-stream multipliers (same family as the prefix hashes) and
# word-sequence-stream multipliers — two independent 32-bit streams
_W1 = np.uint32(1000003)
_W2 = np.uint32(65599)
_S1 = np.uint32(2654435761)
_S2 = np.uint32(334214467)
_PHI = np.uint32(0x9E3779B9)

# reserved word hashes for special LM tokens (never produced by char rolling)
_UNK_H = (np.uint32(0xFFFF1234), np.uint32(0xFFFF5678))
_BOS_H = (np.uint32(0xFFFFB050), np.uint32(0xFFFFB051))
_EOS_H = (np.uint32(0xFFFFE050), np.uint32(0xFFFFE051))

_PROBES = 8  # static linear-probe length; table grows until all entries fit


@dataclass(frozen=True)
class DeviceLMTable:
    """Hashed n-gram table as flat arrays (host numpy; moved to device once)."""

    keys1: np.ndarray  # (size,) uint32
    keys2: np.ndarray  # (size,) uint32
    used: np.ndarray  # (size,) bool
    logprob: np.ndarray  # (size,) float32, log10
    backoff: np.ndarray  # (size,) float32, log10 (0 when absent)
    order: int
    size: int


def _word_hash(word: str, vocab: Vocab) -> Tuple[np.uint32, np.uint32]:
    if word == UNK:
        return _UNK_H
    if word == "<s>":
        return _BOS_H
    if word == "</s>":
        return _EOS_H
    with np.errstate(over="ignore"):  # uint32 wraparound is the hash
        h1 = np.uint32(0)
        h2 = np.uint32(0)
        for cid in vocab.encode(word):
            h1 = h1 * _W1 + np.uint32(cid + 1)
            h2 = h2 * _W2 + np.uint32(cid + 1)
    return h1, h2


def _seq_hash(word_hashes) -> Tuple[np.uint32, np.uint32]:
    with np.errstate(over="ignore"):
        k1 = np.uint32(0)
        k2 = np.uint32(0)
        for h1, h2 in word_hashes:
            k1 = k1 * _S1 + h1
            k2 = k2 * _S2 + h2
    return k1, k2


def pack_lm(lm: NGramLM, vocab: Vocab) -> DeviceLMTable:
    """Pack an :class:`NGramLM` into the device hash table."""
    entries = []
    for ngram, lp in lm.logprob.items():
        hashes = [_word_hash(w, vocab) for w in ngram]
        k1, k2 = _seq_hash(hashes)
        bo = lm.backoff.get(ngram, 0.0)
        entries.append((np.uint32(k1), np.uint32(k2), np.float32(lp), np.float32(bo)))

    size = 1
    while size < 2 * max(len(entries), 1):
        size *= 2
    while True:
        keys1 = np.zeros((size,), np.uint32)
        keys2 = np.zeros((size,), np.uint32)
        used = np.zeros((size,), bool)
        lp_t = np.zeros((size,), np.float32)
        bo_t = np.zeros((size,), np.float32)
        ok = True
        for k1, k2, lp, bo in entries:
            with np.errstate(over="ignore"):
                idx = int((k1 ^ np.uint32(k2 * _PHI)) & np.uint32(size - 1))
            for p in range(_PROBES):
                j = (idx + p) % size
                if not used[j]:
                    keys1[j], keys2[j], used[j] = k1, k2, True
                    lp_t[j], bo_t[j] = lp, bo
                    break
                if keys1[j] == k1 and keys2[j] == k2:
                    break  # duplicate n-gram (hash collision in source): keep first
            else:
                ok = False
                break
        if ok:
            return DeviceLMTable(
                keys1=keys1, keys2=keys2, used=used, logprob=lp_t, backoff=bo_t,
                order=lm.order, size=size,
            )
        size *= 2


# --------------------------------------------------------------------------
# Device-side scoring
# --------------------------------------------------------------------------


def _lookup(table, k1, k2):
    """Open-addressing probe: (hit, logprob, backoff), elementwise over k1."""
    keys1, keys2, used, lp_t, bo_t, size = table
    mask = jnp.uint32(size - 1)
    idx0 = (k1 ^ (k2 * jnp.uint32(_PHI))) & mask
    found = jnp.zeros(k1.shape, bool)
    lp = jnp.zeros(k1.shape, jnp.float32)
    bo = jnp.zeros(k1.shape, jnp.float32)
    for p in range(_PROBES):
        idx = (idx0 + jnp.uint32(p)) & mask
        ok = used[idx] & (keys1[idx] == k1) & (keys2[idx] == k2)
        take = ok & ~found
        lp = jnp.where(take, lp_t[idx], lp)
        bo = jnp.where(take, bo_t[idx], bo)
        found = found | ok
    return found, lp, bo


def _score_word(table, order, cx1, cx2, nw, w1, w2):
    """Backoff recursion, vectorized: log10 P(word | last nw words).

    ``cx1/cx2``: (..., order−1) rolling hashes of the last j+1 words at slot
    j. Mirrors ``NGramLM.score_word`` (lm.py:41-55): longest context first,
    accumulate skipped contexts' backoffs, ``<unk>`` substitution when the
    word's unigram is absent, −99 when even that misses.
    """
    O = order - 1
    uni_hit, _, _ = _lookup(table, w1, w2)
    w1 = jnp.where(uni_hit, w1, jnp.uint32(_UNK_H[0]))
    w2 = jnp.where(uni_hit, w2, jnp.uint32(_UNK_H[1]))

    kmax = jnp.minimum(nw, O)
    found = jnp.zeros(w1.shape, bool)
    score = jnp.full(w1.shape, -99.0, jnp.float32)
    penalty = jnp.zeros(w1.shape, jnp.float32)
    for j in range(O, -1, -1):  # static walk: longest context → unigram
        valid = kmax >= j
        if j > 0:
            c1, c2 = cx1[..., j - 1], cx2[..., j - 1]
            k1 = c1 * jnp.uint32(_S1) + w1
            k2 = c2 * jnp.uint32(_S2) + w2
        else:
            k1, k2 = w1, w2
        hit, lp, _ = _lookup(table, k1, k2)
        take = valid & hit & ~found
        score = jnp.where(take, penalty + lp, score)
        found = found | (valid & hit)
        if j > 0:
            _, _, bo = _lookup(table, c1, c2)  # backoff of the skipped context
            penalty = penalty + jnp.where(valid & ~found, bo, 0.0)
    return score


# --------------------------------------------------------------------------
# Fused beam search
# --------------------------------------------------------------------------


def beam_search_lm_device(
    log_probs: jnp.ndarray,
    lengths: jnp.ndarray,
    table: DeviceLMTable,
    blank_id: int,
    pad_id: int,
    space_id: int,
    beam_width: int,
    alpha: float = 0.5,
    beta: float = 0.0,
    beam_prune_logp: float = -10.0,
    token_min_logp: float = -5.0,
    blank_bias: float = 0.0,
):
    """Batched prefix beam search with in-search word-LM fusion.

    Returns ``(chars (T,B,K), parents (T,B,K), final_scores (B,K),
    best_beam (B,))`` — feed ``best_beam`` to :func:`traceback`.
    """
    return _beam_search_lm_jit(
        log_probs,
        lengths,
        (
            jnp.asarray(table.keys1),
            jnp.asarray(table.keys2),
            jnp.asarray(table.used),
            jnp.asarray(table.logprob),
            jnp.asarray(table.backoff),
            table.size,
        ),
        table.order,
        blank_id,
        pad_id,
        space_id,
        beam_width,
        float(alpha),
        float(beta),
        float(beam_prune_logp),
        float(token_min_logp),
        float(blank_bias),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "order", "blank_id", "pad_id", "space_id", "beam_width",
        "alpha", "beta", "beam_prune_logp", "token_min_logp", "blank_bias",
    ),
)
def _beam_search_lm_jit(
    log_probs,
    lengths,
    table_arrays,
    order,
    blank_id,
    pad_id,
    space_id,
    beam_width,
    alpha,
    beta,
    beam_prune_logp,
    token_min_logp,
    blank_bias,
):
    B, T, V = log_probs.shape
    K = beam_width
    O = order - 1
    table = table_arrays

    lp = log_probs.astype(jnp.float32)
    lp = lp.at[:, :, blank_id].add(blank_bias)
    if pad_id != blank_id:
        lp = lp.at[:, :, blank_id].set(
            jnp.logaddexp(lp[:, :, blank_id], lp[:, :, pad_id])
        )

    token_ids = jnp.arange(V, dtype=jnp.int32)
    ext_invalid = (token_ids == blank_id) | (token_ids == pad_id)
    is_space_tok = token_ids == space_id  # (V,)

    C = K + K * V  # stay + extension candidates

    def fused(pb, pnb, lm):
        return jnp.logaddexp(pb, pnb) + lm

    carry0 = dict(
        p_b=jnp.full((B, K), NEG_INF).at[:, 0].set(0.0),
        p_nb=jnp.full((B, K), NEG_INF),
        h1=jnp.zeros((B, K), jnp.uint32),
        h2=jnp.zeros((B, K), jnp.uint32),
        last=jnp.full((B, K), -1, jnp.int32),
        lm=jnp.zeros((B, K), jnp.float32),
        pw1=jnp.zeros((B, K), jnp.uint32),
        pw2=jnp.zeros((B, K), jnp.uint32),
        nw=jnp.zeros((B, K), jnp.int32),
        cx1=jnp.zeros((B, K, O), jnp.uint32),
        cx2=jnp.zeros((B, K, O), jnp.uint32),
    )

    def step(carry, inputs):
        lp_t, t_idx = inputs  # (B, V), scalar
        pb, pnb = carry["p_b"], carry["p_nb"]
        h1, h2, last, lm = carry["h1"], carry["h2"], carry["last"], carry["lm"]
        pw1, pw2, nw = carry["pw1"], carry["pw2"], carry["nw"]
        cx1, cx2 = carry["cx1"], carry["cx2"]

        argmax_v = jnp.argmax(lp_t, axis=-1)  # (B,)
        admitted = (lp_t >= token_min_logp) | (token_ids[None, :] == argmax_v[:, None])
        lp_adm = jnp.where(admitted & ~ext_invalid[None, :], lp_t, NEG_INF)
        lp_blank = jnp.where(
            (lp_t[:, blank_id] >= token_min_logp) | (argmax_v == blank_id),
            lp_t[:, blank_id],
            NEG_INF,
        )[:, None]  # (B, 1)

        p_tot = jnp.logaddexp(pb, pnb)

        # ---- per-beam LM delta for completing the current partial word
        partial_live = (pw1 != 0) | (pw2 != 0)  # (B, K)
        score10 = _score_word((*table,), order, cx1, cx2, nw, pw1, pw2)
        delta = jnp.where(
            partial_live, alpha * LN10 * score10 + beta, 0.0
        )  # (B, K)

        # ---- stay candidates (prefix unchanged)
        stay_pb = p_tot + lp_blank
        lp_last = jnp.take_along_axis(lp_adm, jnp.clip(last, 0, V - 1), axis=1)
        stay_pnb = jnp.where(last >= 0, pnb + lp_last, NEG_INF)

        # ---- extension candidates (beam × token)
        same_as_last = token_ids[None, None, :] == last[:, :, None]  # (B,K,V)
        base = jnp.where(same_as_last, pb[:, :, None], p_tot[:, :, None])
        ext_pnb = base + lp_adm[:, None, :]  # (B, K, V)

        vv = token_ids.astype(jnp.uint32) + jnp.uint32(1)
        ext_h1 = h1[:, :, None] * _W1 + vv[None, None, :]
        ext_h2 = h2[:, :, None] * _W2 + vv[None, None, :]

        completes = is_space_tok[None, None, :] & partial_live[:, :, None]
        ext_lm = lm[:, :, None] + jnp.where(completes, delta[:, :, None], 0.0)

        # partial-word hash: space resets, chars roll
        ext_pw1 = jnp.where(
            is_space_tok[None, None, :],
            jnp.uint32(0),
            pw1[:, :, None] * _W1 + vv[None, None, :],
        )
        ext_pw2 = jnp.where(
            is_space_tok[None, None, :],
            jnp.uint32(0),
            pw2[:, :, None] * _W2 + vv[None, None, :],
        )
        ext_nw = nw[:, :, None] + completes.astype(jnp.int32)

        # word-context hashes shift only when a word completes
        if O > 0:
            new_cx1 = jnp.concatenate(
                [pw1[:, :, None], cx1[:, :, :-1] * _S1 + pw1[:, :, None]], axis=2
            )  # (B, K, O)
            new_cx2 = jnp.concatenate(
                [pw2[:, :, None], cx2[:, :, :-1] * _S2 + pw2[:, :, None]], axis=2
            )
        else:  # unigram LM: no word context to carry
            new_cx1, new_cx2 = cx1, cx2
        ext_cx1 = jnp.where(
            completes[:, :, :, None], new_cx1[:, :, None, :], cx1[:, :, None, :]
        )  # (B, K, V, O)
        ext_cx2 = jnp.where(
            completes[:, :, :, None], new_cx2[:, :, None, :], cx2[:, :, None, :]
        )

        # ---- flatten candidates [stay K | ext K·V]
        def flat2(stay, ext):
            return jnp.concatenate([stay, ext.reshape(B, K * V)], axis=1)

        cand = dict(
            pb=flat2(stay_pb, jnp.full((B, K, V), NEG_INF)),
            pnb=flat2(stay_pnb, ext_pnb),
            h1=flat2(h1, ext_h1),
            h2=flat2(h2, ext_h2),
            lm=flat2(lm, ext_lm),
            pw1=flat2(pw1, ext_pw1),
            pw2=flat2(pw2, ext_pw2),
            nw=flat2(nw, ext_nw),
            last=flat2(
                last, jnp.broadcast_to(token_ids[None, None, :], (B, K, V))
            ),
            char=flat2(
                jnp.full((B, K), -1, jnp.int32),
                jnp.broadcast_to(token_ids[None, None, :], (B, K, V)),
            ),
            parent=flat2(
                jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None], (B, K)),
                jnp.broadcast_to(
                    jnp.repeat(jnp.arange(K, dtype=jnp.int32), V)[None], (B, K * V)
                ).reshape(B, K, V),
            ),
        )
        cand_cx1 = jnp.concatenate(
            [cx1, ext_cx1.reshape(B, K * V, O)], axis=1
        )  # (B, C, O)
        cand_cx2 = jnp.concatenate([cx2, ext_cx2.reshape(B, K * V, O)], axis=1)

        # ---- dedup: sort by prefix hash, get permutation, gather everything
        iota = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32)[None], (B, C))
        _, _, perm = jax.lax.sort(
            (cand["h1"], cand["h2"], iota), dimension=1, num_keys=2
        )

        def pick(x):
            return jnp.take_along_axis(x, perm, axis=1)

        s = {k: pick(v) for k, v in cand.items()}
        s_cx1 = jnp.take_along_axis(cand_cx1, perm[:, :, None], axis=1)
        s_cx2 = jnp.take_along_axis(cand_cx2, perm[:, :, None], axis=1)

        new_seg = jnp.concatenate(
            [
                jnp.ones((B, 1), bool),
                (s["h1"][:, 1:] != s["h1"][:, :-1])
                | (s["h2"][:, 1:] != s["h2"][:, :-1]),
            ],
            axis=1,
        )
        m_pb = _segmented_logsumexp(s["pb"], new_seg)
        m_pnb = _segmented_logsumexp(s["pnb"], new_seg)
        run_last = jnp.concatenate([new_seg[:, 1:], jnp.ones((B, 1), bool)], axis=1)
        score = jnp.where(run_last, fused(m_pb, m_pnb, s["lm"]), NEG_INF)

        top_score, top_idx = jax.lax.top_k(score, K)

        def pick_top(x):
            return jnp.take_along_axis(x, top_idx, axis=1)

        n = {k: pick_top(v) for k, v in s.items()}
        n_pb, n_pnb = pick_top(m_pb), pick_top(m_pnb)
        n_cx1 = jnp.take_along_axis(s_cx1, top_idx[:, :, None], axis=1)
        n_cx2 = jnp.take_along_axis(s_cx2, top_idx[:, :, None], axis=1)

        best = top_score[:, :1]
        dead = top_score < best + beam_prune_logp
        n_pb = jnp.where(dead, NEG_INF, n_pb)
        n_pnb = jnp.where(dead, NEG_INF, n_pnb)

        active = (t_idx < lengths)[:, None]

        def keep(new, old):
            return jnp.where(active, new, old)

        def keep3(new, old):
            return jnp.where(active[:, :, None], new, old)

        out = dict(
            p_b=keep(n_pb, pb),
            p_nb=keep(n_pnb, pnb),
            h1=keep(n["h1"], h1),
            h2=keep(n["h2"], h2),
            last=keep(n["last"], last),
            lm=keep(n["lm"], lm),
            pw1=keep(n["pw1"], pw1),
            pw2=keep(n["pw2"], pw2),
            nw=keep(n["nw"], nw),
            cx1=keep3(n_cx1, cx1),
            cx2=keep3(n_cx2, cx2),
        )
        bp_parent = jnp.where(
            active, n["parent"],
            jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None], (B, K)),
        )
        bp_char = jnp.where(active, n["char"], jnp.full((B, K), -1, jnp.int32))
        return out, (bp_char, bp_parent)

    final, (chars, parents) = jax.lax.scan(
        step, carry0, (jnp.moveaxis(lp, 0, 1), jnp.arange(T))
    )

    # finalization: score the trailing partial word (host_beam.py:134-138)
    partial_live = (final["pw1"] != 0) | (final["pw2"] != 0)
    score10 = _score_word(
        (*table,), order, final["cx1"], final["cx2"], final["nw"],
        final["pw1"], final["pw2"],
    )
    final_delta = jnp.where(partial_live, alpha * LN10 * score10 + beta, 0.0)
    final_scores = (
        jnp.logaddexp(final["p_b"], final["p_nb"]) + final["lm"] + final_delta
    )
    best_beam = jnp.argmax(final_scores, axis=1).astype(jnp.int32)
    return chars, parents, final_scores, best_beam


def beam_decode_lm_device(
    log_probs,
    lengths,
    vocab: Vocab,
    table: DeviceLMTable,
    beam_width: int = 50,
    alpha: float = 0.5,
    beta: float = 0.0,
    beam_prune_logp: float = -10.0,
    token_min_logp: float = -5.0,
    blank_bias: float = 0.0,
) -> List[str]:
    """Convenience wrapper: fused search → best-beam texts."""
    space_id = vocab.token_to_id.get(" ")
    chars, parents, _, best = beam_search_lm_device(
        jnp.asarray(log_probs),
        jnp.asarray(lengths),
        table,
        blank_id=vocab.blank_id,
        pad_id=vocab.pad_id,
        space_id=int(space_id),
        beam_width=beam_width,
        alpha=alpha,
        beta=beta,
        beam_prune_logp=beam_prune_logp,
        token_min_logp=token_min_logp,
        blank_bias=blank_bias,
    )
    prefixes = traceback(np.asarray(chars), np.asarray(parents), np.asarray(best))
    return [vocab.decode(p) for p in prefixes]
