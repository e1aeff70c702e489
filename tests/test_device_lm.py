"""Device LM-fused beam search parity vs the host prefix search (the oracle).

VERDICT r1 item 7: the LM grid must no longer drop to per-utterance Python —
the device kernel must match ``host_beam.beam_search_lm`` on random and
crafted cases across (alpha, beta, width) settings.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from ssd_tpu.data.vocab import default_vocab
from ssd_tpu.decoding.device_lm import (
    beam_decode_lm_device,
    pack_lm,
    _word_hash,
    _seq_hash,
)
from ssd_tpu.decoding.host_beam import beam_search_lm_batch
from ssd_tpu.decoding.lm import NGramLM, train_ngram

VOCAB = default_vocab()

CORPUS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "a cat and a dog",
    "the cat ran to the dog",
    "dogs and cats play on the mat",
    "the quick brown fox",
    "he said the cat is here",
    "she said the dog is there",
]


@pytest.fixture(scope="module")
def lm():
    return train_ngram(CORPUS, order=3)


@pytest.fixture(scope="module")
def table(lm):
    return pack_lm(lm, VOCAB)


def _softmax_logits(rng, B, T, peaked_text=None, scale=1.5):
    logits = rng.normal(size=(B, T, VOCAB.size)).astype(np.float32) * scale
    logits[:, :, VOCAB.blank_id] += 1.0
    if peaked_text is not None:
        ids = VOCAB.encode(peaked_text)
        for b in range(B):
            for t, cid in enumerate(ids):
                if 2 * t + 1 < T:
                    logits[b, 2 * t, cid] += 6.0
                    logits[b, 2 * t + 1, VOCAB.blank_id] += 6.0
    return logits - np.log(np.exp(logits).sum(-1, keepdims=True))


def test_table_lookup_roundtrip(lm, table):
    """Every packed n-gram is recoverable through the device hash scheme."""
    from ssd_tpu.decoding.device_lm import _BUCKET

    nbuckets = table.size // _BUCKET
    for ngram, lp in list(lm.logprob.items())[:200]:
        k1, k2 = _seq_hash([_word_hash(w, VOCAB) for w in ngram])
        bidx = int(
            (np.uint32(k1) ^ np.uint32(np.uint32(k2) * np.uint32(0x9E3779B9)))
            & np.uint32(nbuckets - 1)
        )
        found = False
        for p in range(_BUCKET):
            j = bidx * _BUCKET + p
            if table.used[j] and table.keys1[j] == k1 and table.keys2[j] == k2:
                assert np.isclose(table.logprob[j], lp, atol=1e-6)
                found = True
                break
        assert found, ngram


@pytest.mark.parametrize(
    "alpha,beta,width",
    [(0.5, 0.0, 16), (0.9, 0.3, 16), (0.5, 0.05, 32)],
)
def test_device_matches_host_random(lm, table, alpha, beta, width):
    rng = np.random.default_rng(3)
    B, T = 3, 24
    lp = _softmax_logits(rng, B, T)
    lengths = np.asarray([24, 17, 20], np.int32)

    want = beam_search_lm_batch(
        lp, lengths, VOCAB, lm,
        beam_width=width, alpha=alpha, beta=beta,
        beam_prune_logp=-10.0, token_min_logp=-5.0,
    )
    got = beam_decode_lm_device(
        lp, lengths, VOCAB, table,
        beam_width=width, alpha=alpha, beta=beta,
        beam_prune_logp=-10.0, token_min_logp=-5.0,
    )
    assert got == want


def test_device_matches_host_peaked_sentences(lm, table):
    """Crafted case: clean emissions of in-corpus sentences, plus blank bias."""
    rng = np.random.default_rng(5)
    text = "the cat sat"
    T = 2 * len(text) + 4
    lp = _softmax_logits(rng, 2, T, peaked_text=text, scale=0.5)
    # valid lengths stop at the peaked region so the decode is clean text
    lengths = np.asarray([2 * len(text), 2 * len(text) - 3], np.int32)

    kwargs = dict(beam_width=16, alpha=0.6, beta=0.1,
                  beam_prune_logp=-10.0, token_min_logp=-5.0, blank_bias=0.1)
    want = beam_search_lm_batch(lp, lengths, VOCAB, lm, **kwargs)
    got = beam_decode_lm_device(lp, lengths, VOCAB, table, **kwargs)
    assert got == want
    assert want[0] == text  # sanity: the peaked sentence is actually decoded


def test_lm_fusion_changes_the_answer(lm, table):
    """Fusion must actually steer: with acoustically ambiguous 'cat'/'cax',
    the LM (which knows 'cat') must win at high alpha."""
    rng = np.random.default_rng(7)
    # emit "the ca?" with ? ambiguous between t and x
    text = "the cat"
    T = 2 * len(text) + 2
    lp = _softmax_logits(rng, 1, T, peaked_text=text, scale=0.3)
    lp = np.array(lp)
    # find the frame where 't' of 'cat' peaks; make 'x' equally likely
    t_pos = 2 * (len(text) - 1)
    t_id = VOCAB.encode("t")[0]
    x_id = VOCAB.encode("x")[0]
    lp[0, t_pos, x_id] = lp[0, t_pos, t_id] + 0.1  # x slightly preferred
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
    lengths = np.asarray([T], np.int32)

    no_lm_kwargs = dict(beam_width=16, alpha=0.0, beta=0.0)
    strong_lm = dict(beam_width=16, alpha=2.5, beta=0.0)
    base = beam_decode_lm_device(lp, lengths, VOCAB, table, **no_lm_kwargs)
    fused = beam_decode_lm_device(lp, lengths, VOCAB, table, **strong_lm)
    host = beam_search_lm_batch(lp, lengths, VOCAB, lm, **strong_lm)
    assert fused == host
    assert fused[0].endswith("cat")
    assert base[0] != fused[0]


def test_token_top_k_matches_exact_on_peaked(lm, table):
    """Top-k preselection is exact when ≤k tokens pass admission per frame."""
    rng = np.random.default_rng(11)
    text = "the dog sat on the log"
    T = 2 * len(text) + 4
    lp = _softmax_logits(rng, 2, T, peaked_text=text, scale=0.5)
    lengths = np.asarray([2 * len(text), 2 * len(text) - 5], np.int32)
    kwargs = dict(beam_width=16, alpha=0.6, beta=0.1,
                  beam_prune_logp=-10.0, token_min_logp=-5.0)
    exact = beam_decode_lm_device(lp, lengths, VOCAB, table, **kwargs)
    fast = beam_decode_lm_device(
        lp, lengths, VOCAB, table, token_top_k=16, **kwargs
    )
    host = beam_search_lm_batch(lp, lengths, VOCAB, lm, **kwargs)
    assert fast == exact == host
    assert exact[0] == text


def test_token_top_k_random_logits_close(lm, table):
    """On diffuse random logits top-k is an approximation; with k well above
    the admitted-token count it must still agree with the exact search."""
    rng = np.random.default_rng(13)
    lp = _softmax_logits(rng, 3, 20, scale=2.5)  # peaked-ish random
    lengths = np.asarray([20, 14, 17], np.int32)
    kwargs = dict(beam_width=16, alpha=0.5, beta=0.0,
                  beam_prune_logp=-10.0, token_min_logp=-5.0)
    exact = beam_decode_lm_device(lp, lengths, VOCAB, table, **kwargs)
    fast = beam_decode_lm_device(
        lp, lengths, VOCAB, table, token_top_k=24, **kwargs
    )
    assert fast == exact


@pytest.mark.parametrize("seed", range(6))
def test_device_matches_host_randomized_soak(lm, table, seed):
    """Differential soak: random logits, random knob draws, exact equality
    vs the host oracle (the fused search's full contract surface)."""
    rng = np.random.default_rng(100 + seed)
    B = int(rng.integers(1, 4))
    T = int(rng.integers(8, 28))
    lp = _softmax_logits(rng, B, T, scale=float(rng.uniform(0.5, 2.5)))
    lengths = rng.integers(max(T - 6, 1), T + 1, size=B).astype(np.int32)
    kwargs = dict(
        beam_width=int(rng.choice([8, 16, 24])),
        alpha=float(rng.uniform(0.0, 1.2)),
        beta=float(rng.uniform(-0.2, 0.3)),
        beam_prune_logp=float(rng.choice([-10.0, -6.0, -1e9])),
        token_min_logp=float(rng.choice([-5.0, -8.0, -1e9])),
        blank_bias=float(rng.uniform(-0.3, 0.3)),
    )
    want = beam_search_lm_batch(lp, lengths, VOCAB, lm, **kwargs)
    got = beam_decode_lm_device(lp, lengths, VOCAB, table, **kwargs)
    assert got == want, kwargs


# ------------------------------------------------------------ packed cache
def test_load_packed_lm_cache_roundtrip(lm, table, tmp_path):
    """First load packs + writes the sidecar; second load reads it and the
    tables are identical. Touching the ARPA invalidates the cache."""
    import os

    from ssd_tpu.decoding.device_lm import load_packed_lm

    arpa = tmp_path / "test.arpa"
    lm.to_arpa(arpa)
    t1 = load_packed_lm(arpa, VOCAB)
    sidecar = tmp_path / "test.arpa.packed.npz"
    assert sidecar.exists()
    t2 = load_packed_lm(arpa, VOCAB)  # cache hit
    for field in ("keys1", "keys2", "used", "logprob", "backoff"):
        np.testing.assert_array_equal(getattr(t1, field), getattr(t2, field))
    assert (t1.order, t1.size) == (t2.order, t2.size)
    # the cached table must equal a fresh pack of the same ARPA
    fresh = pack_lm(NGramLM.from_arpa(arpa), VOCAB)
    np.testing.assert_array_equal(t2.keys1, fresh.keys1)
    np.testing.assert_array_equal(t2.logprob, fresh.logprob)

    # staleness: rewrite the ARPA with different content → repack, not reuse
    lm2 = train_ngram(CORPUS[:4], order=2)
    lm2.to_arpa(arpa)
    os.utime(arpa, ns=(1, 1))  # force a distinct mtime even on coarse clocks
    t3 = load_packed_lm(arpa, VOCAB)
    assert t3.order == 2

    # corrupt cache degrades to a repack
    sidecar.write_bytes(b"not an npz")
    t4 = load_packed_lm(arpa, VOCAB)
    assert t4.order == 2


def test_load_packed_lm_readonly_dir(lm, tmp_path, monkeypatch):
    """An unwritable model dir degrades to pack-every-time, no crash.

    (chmod can't block root, so the write failure is injected.)"""
    from ssd_tpu import decoding

    from ssd_tpu.decoding.device_lm import load_packed_lm

    arpa = tmp_path / "ro.arpa"
    lm.to_arpa(arpa)

    def boom(*a, **k):
        raise OSError("read-only file system")

    monkeypatch.setattr(decoding.device_lm.np, "savez", boom)
    t = load_packed_lm(arpa, VOCAB)
    assert t.order == lm.order
    assert not (tmp_path / "ro.arpa.packed.npz").exists()


# ------------------------------------------------- <unk>-key specialization
def test_trained_lm_packs_specialized(lm, table):
    """The native KN trainer emits <unk> only as a unigram, so pack_lm
    detects unk_tailed=False — meaning every host-parity test in this file
    exercises the SPECIALIZED scorer (reduced key set), not just the
    generic walk."""
    from ssd_tpu.decoding.lm import UNK

    assert table.unk_tailed is False
    assert table.unk_uni_lp is not None
    assert np.isclose(table.unk_uni_lp, lm.logprob[(UNK,)])


def test_unk_tailed_lm_generic_path_matches_host():
    """Hand-built LM WITH <unk>-tailed bigrams: detection keeps the generic
    (speculative <unk>-substitution) walk, which must still match the host
    oracle — <unk>-tailed n-grams now actually fire for OOV words."""
    lm = NGramLM(
        order=2,
        logprob={
            ("<unk>",): -1.2,
            ("the",): -0.4,
            ("cat",): -0.9,
            ("sat",): -1.0,
            ("a",): -0.8,
            ("the", "cat"): -0.3,
            ("the", "<unk>"): -0.6,
            ("cat", "sat"): -0.5,
            ("a", "<unk>"): -0.9,
        },
        backoff={("the",): -0.25, ("cat",): -0.1, ("a",): -0.15},
    )
    t = pack_lm(lm, VOCAB)
    assert t.unk_tailed is True
    rng = np.random.default_rng(7)
    B, T = 2, 18
    lp = _softmax_logits(rng, B, T, scale=2.0)
    lengths = np.full((B,), T, np.int32)
    kwargs = dict(beam_width=12, alpha=0.8, beta=0.1)
    want = beam_search_lm_batch(lp, lengths, VOCAB, lm, **kwargs)
    got = beam_decode_lm_device(lp, lengths, VOCAB, t, **kwargs)
    assert got == want


def test_unk_unigram_absent_specialized_matches_generic():
    """LM with NO <unk> unigram at all: the specialized OOV fallback (flat
    −99) must decode identically to the generic device walk on the same
    table (forced via unk_tailed=True)."""
    import dataclasses

    lm = NGramLM(
        order=2,
        logprob={("the",): -0.4, ("cat",): -0.9, ("the", "cat"): -0.3},
        backoff={("the",): -0.2},
    )
    t_spec = pack_lm(lm, VOCAB)
    assert t_spec.unk_tailed is False and t_spec.unk_uni_lp is None
    t_gen = dataclasses.replace(t_spec, unk_tailed=True)
    rng = np.random.default_rng(11)
    B, T = 2, 16
    lp = _softmax_logits(rng, B, T, scale=1.8)
    lengths = np.full((B,), T, np.int32)
    kwargs = dict(beam_width=10, alpha=0.9, beta=0.0)
    spec = beam_decode_lm_device(lp, lengths, VOCAB, t_spec, **kwargs)
    gen = beam_decode_lm_device(lp, lengths, VOCAB, t_gen, **kwargs)
    assert spec == gen
