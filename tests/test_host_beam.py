"""Host LM-fused beam search: no-LM agreement with the device search, LM
steering behavior, and decoder-factory dispatch."""

import numpy as np

import jax.numpy as jnp

from ssd_tpu.data.vocab import default_vocab
from ssd_tpu.decoding.ctc import build_decoder
from ssd_tpu.decoding.host_beam import beam_search_lm
from ssd_tpu.decoding.lm import train_ngram
from ssd_tpu.ops.ctc_decode import beam_decode


def _log_probs_for(text, vocab, frames_per_char=3, noise=0.8, seed=0):
    """Synthetic log-probs peaked on `text` with blanks between chars."""
    rng = np.random.default_rng(seed)
    ids = vocab.encode(text)
    T = frames_per_char * len(ids) + 4
    logits = rng.normal(size=(T, vocab.size)).astype(np.float64) * noise
    logits[:, vocab.blank_id] += 3.0
    for i, tok in enumerate(ids):
        t0 = 2 + i * frames_per_char
        logits[t0 : t0 + 2, tok] += 6.0
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    return lp.astype(np.float32)


def test_no_lm_matches_device_search():
    vocab = default_vocab()
    lp = _log_probs_for("hi there", vocab)
    T = lp.shape[0]
    host = beam_search_lm(lp, T, vocab, lm=None, beam_width=16)
    dev = beam_decode(
        jnp.asarray(lp[None]), jnp.asarray([T]), vocab.blank_id, vocab.pad_id, 16
    )
    assert host == vocab.decode(dev[0])


def test_lm_steers_ambiguous_word():
    vocab = default_vocab()
    lm = train_ngram(["the cat sat on the mat"] * 20, order=3)
    # acoustics weakly prefer "cet"; LM should pull toward "cat"
    lp = _log_probs_for("the cet sat", vocab, noise=0.4, seed=3)
    c, a, e = vocab.token_to_id["c"], vocab.token_to_id["a"], vocab.token_to_id["e"]
    # make e vs a nearly ambiguous wherever e is peaked
    amb = lp[:, e] > -2
    lp[amb, a] = lp[amb, e] - 0.3
    T = lp.shape[0]
    no_lm = beam_search_lm(lp, T, vocab, lm=None, beam_width=32)
    with_lm = beam_search_lm(lp, T, vocab, lm=lm, beam_width=32, alpha=2.0, beta=0.0)
    assert "cet" in no_lm
    assert "cat" in with_lm


def test_factory_dispatch_with_lm(tmp_path):
    vocab = default_vocab()
    lm = train_ngram(["hello world"] * 5, order=2)
    arpa = tmp_path / "lm.arpa"
    lm.to_arpa(arpa)
    lp = _log_probs_for("hello world", vocab)
    T = lp.shape[0]
    dec = build_decoder("beam", vocab, lm_path=arpa, beam_width=16, alpha=0.5)
    out = dec(jnp.asarray(lp[None]), jnp.asarray([T]))
    assert out == ["hello world"]
    # greedy factory still works
    g = build_decoder("greedy", vocab)
    assert isinstance(g(jnp.asarray(lp[None]), jnp.asarray([T]))[0], str)
