"""n-gram LM + metrics tests."""

import math

import numpy as np
import pytest

from ssd_tpu.decoding.lm import NGramLM, train_ngram
from ssd_tpu.evaluation.metrics import cer, compute_error_breakdown, compute_metrics, wer

CORPUS = [
    "the cat sat on the mat",
    "the dog sat on the rug",
    "a cat and a dog",
    "the cat ran",
]


def test_train_and_score():
    lm = train_ngram(CORPUS, order=3)
    # seen sequences outscore unseen ones
    assert lm.score_log10("the cat sat") > lm.score_log10("cat the sat")
    # everything finite
    assert math.isfinite(lm.score_log10("zebra quantum flux"))


def test_probability_normalization():
    """Σ_w P(w | ctx) ≈ 1 for observed contexts (KN interpolation sanity)."""
    lm = train_ngram(CORPUS, order=2)
    vocab = {k[0] for k in lm.logprob if len(k) == 1} - {"<s>"}
    for ctx in (["the"], ["cat"]):
        total = sum(10 ** lm.score_word(ctx, w) for w in vocab)
        assert 0.8 < total < 1.05, (ctx, total)


def test_arpa_roundtrip(tmp_path):
    lm = train_ngram(CORPUS, order=3)
    path = tmp_path / "lm.arpa"
    lm.to_arpa(path)
    loaded = NGramLM.from_arpa(path)
    assert loaded.order == 3
    for text in CORPUS + ["the dog ran", "unseen words here"]:
        np.testing.assert_allclose(
            loaded.score_log10(text), lm.score_log10(text), rtol=1e-5
        )


def test_wer_cer_basics():
    refs = ["the cat sat", "hello world"]
    hyps = ["the cat sat", "hello world"]
    assert wer(refs, hyps) == 0.0
    assert cer(refs, hyps) == 0.0
    # one substitution of 3 words + perfect 2 words → pooled 1/5
    assert wer(["the cat sat", "hello world"], ["the dog sat", "hello world"]) == pytest.approx(1 / 5)
    assert cer(["abc"], ["axc"]) == pytest.approx(1 / 3)
    # insertion-only
    assert wer(["a b"], ["a b c"]) == pytest.approx(1 / 2)


def test_error_breakdown():
    out = compute_error_breakdown(["the cat sat"], ["the dog sat down"])
    assert out["substitutions"] == 1  # cat→dog
    assert out["insertions"] == 1  # down
    assert out["deletions"] == 0
    assert out["hits"] == 2
    assert out["substitution_rate"] == pytest.approx(1 / 3)


def test_compute_metrics_keys():
    m = compute_metrics(["a"], ["b"])
    assert set(m) == {"wer", "cer"}
    assert m["wer"] == 1.0 and m["cer"] == 1.0
