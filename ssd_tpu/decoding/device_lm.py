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
import logging
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

# Bucketized open addressing: each hash maps to ONE bucket of `_BUCKET`
# contiguous slots, fetched as a single 128-byte row. The device lookup cost
# is offset-count-bound (measured: per-probe linear addressing at 4 probes ≈
# 4× the gather offsets for the same hit rate), so a key costs exactly one
# gather offset. The packer keeps load ≤ 1 entry/bucket on average and grows
# the table when any bucket overflows (Poisson tail: ~once per ~10⁵ buckets
# at λ=1, i.e. at most one doubling in practice).
_BUCKET = 8  # slots per bucket


@dataclass(frozen=True)
class DeviceLMTable:
    """Hashed n-gram table as flat arrays (host numpy; moved to device once).

    Flat slot ``j`` lives in bucket ``j // _BUCKET``; ``size`` is the total
    slot count (``nbuckets · _BUCKET``, nbuckets a power of two).
    """

    keys1: np.ndarray  # (size,) uint32
    keys2: np.ndarray  # (size,) uint32
    used: np.ndarray  # (size,) bool
    logprob: np.ndarray  # (size,) float32, log10
    backoff: np.ndarray  # (size,) float32, log10 (0 when absent)
    order: int
    size: int
    # Does any n-gram of order ≥ 2 END in <unk>? KN/lmplz LMs carry <unk>
    # only as a unigram, in which case the scorer drops the speculative
    # <unk>-substituted n-gram keys from the backoff walk (L: 3·order−1 →
    # 2·order−1 gather offsets) and folds the OOV fallback into
    # "sum of valid context backoffs + the <unk> unigram" — see _score_word.
    unk_tailed: bool = True
    unk_uni_lp: Optional[float] = None  # log10 P(<unk>), None when absent


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
    unk_tailed = any(len(ng) >= 2 and ng[-1] == UNK for ng in lm.logprob)
    unk_uni_lp = lm.logprob.get((UNK,))
    entries = []
    for ngram, lp in lm.logprob.items():
        hashes = [_word_hash(w, vocab) for w in ngram]
        k1, k2 = _seq_hash(hashes)
        bo = lm.backoff.get(ngram, 0.0)
        entries.append((np.uint32(k1), np.uint32(k2), np.float32(lp), np.float32(bo)))

    nbuckets = 1
    while nbuckets < max(len(entries), 1):  # load factor ≤ 1 entry/bucket
        nbuckets *= 2
    while True:
        size = nbuckets * _BUCKET
        keys1 = np.zeros((size,), np.uint32)
        keys2 = np.zeros((size,), np.uint32)
        used = np.zeros((size,), bool)
        lp_t = np.zeros((size,), np.float32)
        bo_t = np.zeros((size,), np.float32)
        ok = True
        for k1, k2, lp, bo in entries:
            with np.errstate(over="ignore"):
                bidx = int((k1 ^ np.uint32(k2 * _PHI)) & np.uint32(nbuckets - 1))
            for p in range(_BUCKET):
                j = bidx * _BUCKET + p
                if not used[j]:
                    keys1[j], keys2[j], used[j] = k1, k2, True
                    lp_t[j], bo_t[j] = lp, bo
                    break
                if keys1[j] == k1 and keys2[j] == k2:
                    break  # duplicate n-gram (hash collision in source): keep first
            else:
                ok = False  # bucket overflow: double the bucket count
                break
        if ok:
            return DeviceLMTable(
                keys1=keys1, keys2=keys2, used=used, logprob=lp_t, backoff=bo_t,
                order=lm.order, size=size,
                unk_tailed=unk_tailed, unk_uni_lp=unk_uni_lp,
            )
        nbuckets *= 2


# ----------------------------------------------------------- packed cache
_PACK_FORMAT = 2  # bump when the table layout or hash scheme changes


def _vocab_digest(vocab: Vocab) -> str:
    import hashlib
    import json

    return hashlib.md5(json.dumps(list(vocab.tokens)).encode()).hexdigest()


def load_packed_lm(path, vocab: Vocab, cache: bool = True) -> DeviceLMTable:
    """ARPA → :class:`DeviceLMTable`, with a sidecar ``.packed.npz`` cache.

    Parsing + hashing + bucket packing is pure host work that scales with the
    LM (minutes for production-size ARPA files); the packed table is five
    flat arrays, so serving/eval cold starts pay it once per (file, vocab,
    format) and then ``np.load`` in milliseconds. Cache staleness is keyed on
    the ARPA's size+mtime and the vocab digest; a write failure (read-only
    model dir) degrades to pack-every-time with a warning.
    """
    from pathlib import Path as _Path

    path = _Path(path)
    cache_path = path.with_name(path.name + ".packed.npz")
    stat = path.stat()
    meta = np.asarray(
        [_PACK_FORMAT, int(_BUCKET), stat.st_size, stat.st_mtime_ns], np.int64
    )
    digest = _vocab_digest(vocab)
    if cache and cache_path.exists():
        try:
            z = np.load(cache_path, allow_pickle=False)
            if (
                np.array_equal(z["meta"], meta)
                and str(z["vocab_digest"]) == digest
            ):
                unk_uni = float(z["unk_uni_lp"])
                return DeviceLMTable(
                    keys1=z["keys1"], keys2=z["keys2"], used=z["used"],
                    logprob=z["logprob"], backoff=z["backoff"],
                    order=int(z["order"]), size=int(z["size"]),
                    unk_tailed=bool(z["unk_tailed"]),
                    unk_uni_lp=None if np.isnan(unk_uni) else unk_uni,
                )
            logging.getLogger(__name__).info(
                "stale packed-LM cache %s — repacking", cache_path
            )
        except Exception as exc:  # corrupt cache: repack
            logging.getLogger(__name__).warning(
                "unreadable packed-LM cache %s (%s) — repacking", cache_path, exc
            )
    table = pack_lm(NGramLM.from_arpa(path), vocab)
    if cache:
        import os
        import tempfile

        try:
            # tmp + atomic rename: concurrent cold starts (multi-process
            # serving/eval on one model dir) or a kill mid-write must never
            # leave a torn cache that every later start pays to repack
            fd, tmp = tempfile.mkstemp(
                dir=str(cache_path.parent), suffix=".npz.tmp"
            )
            try:
                with os.fdopen(fd, "wb") as f:
                    np.savez(
                        f,
                        meta=meta, vocab_digest=np.asarray(digest),
                        keys1=table.keys1, keys2=table.keys2, used=table.used,
                        logprob=table.logprob, backoff=table.backoff,
                        order=np.asarray(table.order),
                        size=np.asarray(table.size),
                        unk_tailed=np.asarray(table.unk_tailed),
                        unk_uni_lp=np.asarray(
                            np.nan if table.unk_uni_lp is None
                            else table.unk_uni_lp,
                            np.float64,
                        ),
                    )
                os.replace(tmp, cache_path)
            except BaseException:
                try:
                    os.unlink(tmp)
                except OSError:
                    pass
                raise
        except OSError as exc:
            logging.getLogger(__name__).warning(
                "cannot write packed-LM cache %s (%s)", cache_path, exc
            )
    return table


# --------------------------------------------------------------------------
# Device-side scoring
# --------------------------------------------------------------------------

_EMPTY_SENTINEL = np.uint32(0xFFFFFFFF)  # key pair of unused slots


def _packed_device_table(table: DeviceLMTable):
    """((nbuckets, _BUCKET·4) uint32 bucket rows, nbuckets), cached.

    Each bucket row holds its ``_BUCKET`` slots slot-major as
    ``[k1, k2, lp_bits, bo_bits] × _BUCKET`` (float32 values bit-cast into
    the uint32 row), so ONE gather offset fetches a key's entire probe set
    as one contiguous 128-byte row — the lookup cost on device is
    offset-count-bound, not byte-bound (docs/PERF.md "Fused LM search").
    Unused slots get a sentinel key pair — it never equals a real key (same
    ~2⁻⁶⁴ collision class as the two-stream hashes themselves), which
    removes the separate ``used`` check. Cached on the (frozen) table
    instance so repeated decode calls reuse the device copy.
    """
    cached = getattr(table, "_packed_device", None)
    if cached is not None:
        return cached
    slots = np.empty((table.size, 4), np.uint32)
    slots[:, 0] = table.keys1
    slots[:, 1] = table.keys2
    slots[~table.used, :2] = _EMPTY_SENTINEL
    slots[:, 2] = table.logprob.astype(np.float32).view(np.uint32)
    slots[:, 3] = table.backoff.astype(np.float32).view(np.uint32)
    nbuckets = table.size // _BUCKET
    packed = (jnp.asarray(slots.reshape(nbuckets, _BUCKET * 4)), nbuckets)
    object.__setattr__(table, "_packed_device", packed)
    return packed


def _lookup(table, k1, k2):
    """Bucketized hash probe over a trailing lookup axis.

    ``k1/k2``: (..., L) uint32 key pairs. Returns ``(hit, logprob, backoff)``
    each (..., L). ALL keys' buckets are fetched with ONE gather of
    (..., L, _BUCKET·4) rows — one offset per key. (History: the original
    one-gather-per-probe-per-key formulation cost ~80 serial gathers per
    scan step; fusing to per-probe rows cut that to 2 gathers; bucketizing
    cuts the OFFSET count another 4× — see docs/PERF.md "Fused LM search".)
    Empty slots hold a sentinel key pair that never matches.
    """
    rows_t, nbuckets = table  # (nbuckets, _BUCKET·4) uint32
    bidx = (k1 ^ (k2 * jnp.uint32(_PHI))) & jnp.uint32(nbuckets - 1)  # (..., L)
    rows = rows_t[bidx]  # (..., L, _BUCKET·4) — the single gather
    slots = rows.reshape(rows.shape[:-1] + (_BUCKET, 4))
    hit_p = (slots[..., 0] == k1[..., None]) & (slots[..., 1] == k2[..., None])
    first = jnp.argmax(hit_p, axis=-1)[..., None]  # first matching slot
    lp = jax.lax.bitcast_convert_type(
        jnp.take_along_axis(slots[..., 2], first, axis=-1)[..., 0], jnp.float32
    )
    bo = jax.lax.bitcast_convert_type(
        jnp.take_along_axis(slots[..., 3], first, axis=-1)[..., 0], jnp.float32
    )
    found = jnp.any(hit_p, axis=-1)
    zero = jnp.zeros_like(lp)
    return found, jnp.where(found, lp, zero), jnp.where(found, bo, zero)


def _score_word(table, order, cx1, cx2, nw, w1, w2, unk_tailed=True,
                unk_uni=None):
    """Backoff recursion, vectorized: log10 P(word | last nw words).

    ``cx1/cx2``: (..., order−1) rolling hashes of the last j+1 words at slot
    j. Mirrors ``NGramLM.score_word`` (lm.py:41-55): longest context first,
    accumulate skipped contexts' backoffs, ``<unk>`` substitution when the
    word's unigram is absent, −99 when even that misses.

    ONE table gather per call: both the real-word and the speculative
    ``<unk>``-substituted n-gram keys are stacked with the context-backoff
    keys into a single lookup batch (L = 3·order − 1), and the variant is
    selected afterwards by the real word's unigram hit.

    ``unk_tailed=False`` (static; detected at pack time — KN/lmplz LMs carry
    ``<unk>`` only as a unigram) drops the speculative ``<unk>`` n-gram keys:
    they can never hit, so the OOV fallback collapses to "sum of valid
    context backoffs + the <unk> unigram" (``unk_uni``, a traced log10
    scalar; None when the LM lacks the unigram → −99, matching the generic
    walk). L shrinks 3·order−1 → 2·order−1 gather offsets — the lookup is
    offset-count-bound, so this is a direct scorer-cost cut.
    """
    O = order - 1
    c1s = [cx1[..., j - 1] for j in range(O, 0, -1)]
    c2s = [cx2[..., j - 1] for j in range(O, 0, -1)]

    if not unk_tailed:
        # layout: [ng_real j=O..1 | uni_real | ctx j=O..1]
        all1 = jnp.stack(
            [c * jnp.uint32(_S1) + w1 for c in c1s] + [w1] + c1s, axis=-1
        )
        all2 = jnp.stack(
            [c * jnp.uint32(_S2) + w2 for c in c2s] + [w2] + c2s, axis=-1
        )
        hit_all, lp_all, bo_all = _lookup(table, all1, all2)
        uni_hit = hit_all[..., O]
        kmax = jnp.minimum(nw, O)
        found = jnp.zeros(w1.shape, bool)
        score = jnp.full(w1.shape, -99.0, jnp.float32)
        penalty = jnp.zeros(w1.shape, jnp.float32)
        pen_full = jnp.zeros(w1.shape, jnp.float32)  # OOV path: found never
        for i, j in enumerate(range(O, -1, -1)):  # longest context → unigram
            valid = kmax >= j
            take = valid & hit_all[..., i] & ~found
            score = jnp.where(take, penalty + lp_all[..., i], score)
            found = found | (valid & hit_all[..., i])
            if j > 0:
                bo = bo_all[..., O + 1 + i]  # backoff of the skipped context
                penalty = penalty + jnp.where(valid & ~found, bo, 0.0)
                pen_full = pen_full + jnp.where(valid, bo, 0.0)
        if unk_uni is None:
            unk_score = jnp.full(w1.shape, -99.0, jnp.float32)
        else:
            unk_score = pen_full + unk_uni
        return jnp.where(uni_hit, score, unk_score)

    u1, u2 = jnp.uint32(_UNK_H[0]), jnp.uint32(_UNK_H[1])

    # layout: [ng_real j=O..1 | uni_real | ng_unk j=O..1 | uni_unk | ctx j=O..1]
    all1 = jnp.stack(
        [c * jnp.uint32(_S1) + w1 for c in c1s] + [w1]
        + [c * jnp.uint32(_S1) + u1 for c in c1s] + [jnp.broadcast_to(u1, w1.shape)]
        + c1s,
        axis=-1,
    )
    all2 = jnp.stack(
        [c * jnp.uint32(_S2) + w2 for c in c2s] + [w2]
        + [c * jnp.uint32(_S2) + u2 for c in c2s] + [jnp.broadcast_to(u2, w2.shape)]
        + c2s,
        axis=-1,
    )
    hit_all, lp_all, bo_all = _lookup(table, all1, all2)

    uni_hit = hit_all[..., O]  # real word's unigram present?

    def sel(arr, i):  # level i: real variant when uni_hit, else unk variant
        return jnp.where(uni_hit, arr[..., i], arr[..., O + 1 + i])

    kmax = jnp.minimum(nw, O)
    found = jnp.zeros(w1.shape, bool)
    score = jnp.full(w1.shape, -99.0, jnp.float32)
    penalty = jnp.zeros(w1.shape, jnp.float32)
    for i, j in enumerate(range(O, -1, -1)):  # longest context → unigram
        valid = kmax >= j
        hit = sel(hit_all, i)
        lp = sel(lp_all, i)
        take = valid & hit & ~found
        score = jnp.where(take, penalty + lp, score)
        found = found | (valid & hit)
        if j > 0:
            bo = bo_all[..., 2 * O + 2 + i]  # backoff of the skipped context
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
    token_top_k: Optional[int] = None,
):
    """Batched prefix beam search with in-search word-LM fusion.

    ``token_top_k`` restricts per-frame extension candidates to the frame's
    top-k tokens (same preselection as ``ops.ctc_decode.beam_search``): the
    per-step candidate set shrinks from ``K·(V+1)`` to ``K·(k+1)``, which is
    the cost center of the fused search (the dedup sort carries ~11 arrays
    including the ``(B, C, O)`` word-context hashes). Exact whenever ≤k tokens
    pass the ``token_min_logp`` admission — the typical peaked-softmax case.

    Returns ``(chars (T,B,K), parents (T,B,K), final_scores (B,K),
    best_beam (B,))`` — feed ``best_beam`` to :func:`traceback`.
    """
    unk_uni = (
        None
        if table.unk_tailed or table.unk_uni_lp is None
        else jnp.float32(table.unk_uni_lp)
    )
    return _beam_search_lm_jit(
        log_probs,
        lengths,
        _packed_device_table(table),
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
        token_top_k,
        unk_tailed=table.unk_tailed,
        unk_uni=unk_uni,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "order", "blank_id", "pad_id", "space_id", "beam_width",
        "alpha", "beta", "beam_prune_logp", "token_min_logp", "blank_bias",
        "token_top_k", "unk_tailed",
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
    token_top_k=None,
    unk_tailed=True,
    unk_uni=None,
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

    # Extension-token axis: all valid tokens (E = V) or the per-frame top-k
    # (E = k), mirroring ops.ctc_decode.beam_search's preselection.
    masked_lp = jnp.where(ext_invalid[None, None, :], NEG_INF, lp)  # (B,T,V)
    if token_top_k is not None and token_top_k < V:
        ext_vals_all, ext_ids_all = jax.lax.top_k(masked_lp, token_top_k)
        ext_ids_all = ext_ids_all.astype(jnp.int32)
    else:
        ext_vals_all = masked_lp
        ext_ids_all = jnp.broadcast_to(token_ids[None, None, :], (B, T, V))
    E = ext_vals_all.shape[2]

    C = K + K * E  # stay + extension candidates

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
        lp_t, ext_vals, ext_ids, t_idx = inputs  # (B,V), (B,E), (B,E), scalar
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
        score10 = _score_word(
            (*table,), order, cx1, cx2, nw, pw1, pw2,
            unk_tailed=unk_tailed, unk_uni=unk_uni,
        )
        delta = jnp.where(
            partial_live, alpha * LN10 * score10 + beta, 0.0
        )  # (B, K)
        lm_sp = lm + delta  # fused lm IF this beam's next char is a space

        # ---- stay candidates (prefix unchanged)
        stay_pb = p_tot + lp_blank
        lp_last = jnp.take_along_axis(lp_adm, jnp.clip(last, 0, V - 1), axis=1)
        stay_pnb = jnp.where(last >= 0, pnb + lp_last, NEG_INF)

        # ---- extension candidates (beam × preselected token)
        ext_admitted = (ext_vals >= token_min_logp) | (
            ext_ids == argmax_v[:, None]
        )  # (B, E)
        lp_ext = jnp.where(ext_admitted, ext_vals, NEG_INF)  # (B, E)
        same_as_last = ext_ids[:, None, :] == last[:, :, None]  # (B,K,E)
        base = jnp.where(same_as_last, pb[:, :, None], p_tot[:, :, None])
        ext_pnb = base + lp_ext[:, None, :]  # (B, K, E)

        vv = ext_ids.astype(jnp.uint32) + jnp.uint32(1)  # (B, E)
        ext_h1 = h1[:, :, None] * _W1 + vv[:, None, :]
        ext_h2 = h2[:, :, None] * _W2 + vv[:, None, :]
        ext_char = jnp.broadcast_to(ext_ids[:, None, :], (B, K, E))

        # ---- flatten candidates [stay K | ext K·E]
        #
        # Only what the dedup-merge and ranking actually consume rides the
        # C-wide sort — and it rides as VARIADIC SORT OPERANDS, not post-sort
        # gathers: XLA's TPU sort permutes payload operands in place
        # (vectorized sorting network), whereas ``take_along_axis`` through a
        # sorted-iota permutation lowers to random-access gathers that cost
        # several times the sort itself at these shapes. The candidate ``lm``
        # is an elementwise select between the parent's ``lm``/``lm_sp``
        # (computed BEFORE flattening — no E-indexed gather), so ranking
        # needs no lookups after the sort. Every other beam attribute (pw,
        # nw, last, the (·, O) word-context hashes) is a pure function of
        # (parent, char) and is RECONSTRUCTED after top-k at width K — C/K ≈
        # 17× narrower. The original formulation carried ~11 columns plus two
        # (B, C, O) context arrays through the sort and materialized
        # (B, K, E, O) extension contexts every frame; that payload, not the
        # table lookups, dominated the fused search (docs/PERF.md "Fused LM
        # search").
        is_space_ext = (ext_ids == space_id)[:, None, :]  # (B, 1, E)
        ext_lm = jnp.broadcast_to(
            jnp.where(is_space_ext, lm_sp[:, :, None], lm[:, :, None]), (B, K, E)
        )

        def flat2(stay, ext):
            return jnp.concatenate([stay, ext.reshape(B, K * E)], axis=1)

        beam_iota = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None], (B, K))
        cand_pb = flat2(stay_pb, jnp.full((B, K, E), NEG_INF))
        cand_pnb = flat2(stay_pnb, ext_pnb)
        cand_h1 = flat2(h1, ext_h1)
        cand_h2 = flat2(h2, ext_h2)
        cand_lm = flat2(lm, ext_lm)
        cand_char = flat2(jnp.full((B, K), -1, jnp.int32), ext_char)
        cand_parent = flat2(
            beam_iota,
            jnp.broadcast_to(
                jnp.repeat(jnp.arange(K, dtype=jnp.int32), E)[None], (B, K * E)
            ).reshape(B, K, E),
        )

        # ---- dedup: one variadic lex-sort by the hash pair
        (s_h1, s_h2, s_pb, s_pnb, s_lm, s_char, s_parent) = jax.lax.sort(
            (cand_h1, cand_h2, cand_pb, cand_pnb, cand_lm, cand_char, cand_parent),
            dimension=1,
            num_keys=2,
        )

        new_seg = jnp.concatenate(
            [
                jnp.ones((B, 1), bool),
                (s_h1[:, 1:] != s_h1[:, :-1]) | (s_h2[:, 1:] != s_h2[:, :-1]),
            ],
            axis=1,
        )
        m_pb = _segmented_logsumexp(s_pb, new_seg)
        m_pnb = _segmented_logsumexp(s_pnb, new_seg)
        run_last = jnp.concatenate([new_seg[:, 1:], jnp.ones((B, 1), bool)], axis=1)
        score = jnp.where(run_last, fused(m_pb, m_pnb, s_lm), NEG_INF)

        top_score, top_idx = jax.lax.top_k(score, K)

        def pick_top(x):
            return jnp.take_along_axis(x, top_idx, axis=1)

        n_pb, n_pnb = pick_top(m_pb), pick_top(m_pnb)
        n_h1, n_h2 = pick_top(s_h1), pick_top(s_h2)
        n_char, n_parent = pick_top(s_char), pick_top(s_parent)
        n_lm = pick_top(s_lm)

        # ---- reconstruct the winners' beam state from (parent, char) —
        # every gather here is (B, K[, O]); duplicates within a merged
        # segment carry different (parent, char) pairs but identical
        # prefixes, so any member reconstructs the same state (the same
        # invariant the merge itself relies on)
        def from_parent(a):
            return jnp.take_along_axis(a, n_parent, axis=1)

        p_pw1, p_pw2 = from_parent(pw1), from_parent(pw2)
        p_nw, p_last = from_parent(nw), from_parent(last)
        is_ext = n_char >= 0
        is_sp = is_ext & (n_char == space_id)
        completes = is_sp & ((p_pw1 != 0) | (p_pw2 != 0))
        v_n = n_char.astype(jnp.uint32) + jnp.uint32(1)  # masked by is_ext
        n_last = jnp.where(is_ext, n_char, p_last)
        n_pw1 = jnp.where(
            is_ext, jnp.where(is_sp, jnp.uint32(0), p_pw1 * _W1 + v_n), p_pw1
        )
        n_pw2 = jnp.where(
            is_ext, jnp.where(is_sp, jnp.uint32(0), p_pw2 * _W2 + v_n), p_pw2
        )
        n_nw = p_nw + completes.astype(jnp.int32)
        if O > 0:
            p_cx1 = jnp.take_along_axis(cx1, n_parent[:, :, None], axis=1)
            p_cx2 = jnp.take_along_axis(cx2, n_parent[:, :, None], axis=1)
            # word-context hashes shift only when a word completes
            shift_cx1 = jnp.concatenate(
                [p_pw1[:, :, None], p_cx1[:, :, :-1] * _S1 + p_pw1[:, :, None]],
                axis=2,
            )  # (B, K, O)
            shift_cx2 = jnp.concatenate(
                [p_pw2[:, :, None], p_cx2[:, :, :-1] * _S2 + p_pw2[:, :, None]],
                axis=2,
            )
            n_cx1 = jnp.where(completes[:, :, None], shift_cx1, p_cx1)
            n_cx2 = jnp.where(completes[:, :, None], shift_cx2, p_cx2)
        else:  # unigram LM: no word context to carry
            n_cx1, n_cx2 = cx1, cx2

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
            h1=keep(n_h1, h1),
            h2=keep(n_h2, h2),
            last=keep(n_last, last),
            lm=keep(n_lm, lm),
            pw1=keep(n_pw1, pw1),
            pw2=keep(n_pw2, pw2),
            nw=keep(n_nw, nw),
            cx1=keep3(n_cx1, cx1),
            cx2=keep3(n_cx2, cx2),
        )
        bp_parent = jnp.where(active, n_parent, beam_iota)
        bp_char = jnp.where(active, n_char, jnp.full((B, K), -1, jnp.int32))
        return out, (bp_char, bp_parent)

    final, (chars, parents) = jax.lax.scan(
        step,
        carry0,
        (
            jnp.moveaxis(lp, 0, 1),
            jnp.moveaxis(ext_vals_all, 0, 1),
            jnp.moveaxis(ext_ids_all, 0, 1),
            jnp.arange(T),
        ),
    )

    # finalization: score the trailing partial word (host_beam.py:134-138)
    partial_live = (final["pw1"] != 0) | (final["pw2"] != 0)
    score10 = _score_word(
        (*table,), order, final["cx1"], final["cx2"], final["nw"],
        final["pw1"], final["pw2"],
        unk_tailed=unk_tailed, unk_uni=unk_uni,
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
    token_top_k: Optional[int] = None,
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
        token_top_k=token_top_k,
    )
    prefixes = traceback(np.asarray(chars), np.asarray(parents), np.asarray(best))
    return [vocab.decode(p) for p in prefixes]
