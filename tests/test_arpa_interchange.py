"""KenLM/lmplz ARPA interchange (ROADMAP #8).

The reference pipeline consumes ARPA files produced by KenLM's ``lmplz``
(``src/decoding/build_char_lm.py:35-41`` shells out to it). No KenLM binary
exists in this image, so the fixture below is a frozen, hand-written ARPA in
lmplz's exact output dialect:

* tab-separated ``logprob<TAB>ngram<TAB>backoff`` columns,
* ``-99`` sentinel probability for ``<s>`` (KenLM's own ``lm/test.arpa``
  convention; some emitters write ``-inf`` — also covered),
* entries with NO backoff column (``</s>``, highest order),
* entries with an EXPLICIT ``0`` backoff column (``<unk>``),
* blank lines between sections, ``\\data\\`` header, ``\\end\\`` footer.

Expected sentence scores are computed BY HAND in the comments from the raw
fixture numbers via the standard backoff recursion — independent of the
``NGramLM`` implementation — so this test is not circular.
"""

import math

import pytest

from ssd_tpu.decoding.lm import NGramLM

LMPLZ_STYLE_ARPA = """\
\\data\\
ngram 1=6
ngram 2=4
ngram 3=2

\\1-grams:
-1.0\t<unk>\t0
-99\t<s>\t-0.5
-0.6\t</s>
-0.4\tcat\t-0.2
-0.7\tdog\t-0.3
-inf\txx

\\2-grams:
-0.2\t<s> cat\t-0.1
-0.5\tcat dog\t-0.25
-0.3\tdog </s>
-0.9\t<s> dog\t0

\\3-grams:
-0.1\t<s> cat dog
-0.15\tcat dog </s>

\\end\\
"""


@pytest.fixture()
def lm(tmp_path):
    path = tmp_path / "lmplz_style.arpa"
    path.write_text(LMPLZ_STYLE_ARPA, encoding="utf-8")
    return NGramLM.from_arpa(path)


def test_parse_structure(lm):
    assert lm.order == 3
    assert len([k for k in lm.logprob if len(k) == 1]) == 6
    assert len([k for k in lm.logprob if len(k) == 2]) == 4
    assert len([k for k in lm.logprob if len(k) == 3]) == 2
    # no-backoff-column entries must not grow phantom backoffs
    assert ("</s>",) not in lm.backoff
    assert ("dog", "</s>") not in lm.backoff
    # explicit 0 backoff parses as 0 (multiply-by-one), not as missing
    assert lm.backoff.get(("<unk>",), 0.0) == 0.0
    assert math.isinf(lm.logprob[("xx",)])


def test_fully_observed_path(lm):
    # P(cat|<s>) = -0.2 [bigram hit]; P(dog|<s> cat) = -0.1 [trigram hit];
    # P(</s>|cat dog) = -0.15 [trigram hit]  ⇒ total -0.45
    assert lm.score_log10("cat dog") == pytest.approx(-0.45)


def test_backoff_chain(lm):
    # P(dog|<s>) = -0.9 [bigram hit]
    # P(cat|<s> dog): no trigram; bo(<s> dog)=0; no bigram (dog cat);
    #   bo(dog)=-0.3; unigram cat=-0.4          ⇒ -0.7
    # P(</s>|dog cat): no trigram; bo(dog cat) absent ⇒ 0; no bigram
    #   (cat </s>); bo(cat)=-0.2; unigram </s>=-0.6   ⇒ -0.8
    assert lm.score_log10("dog cat") == pytest.approx(-0.9 - 0.7 - 0.8)


def test_oov_maps_to_unk(lm):
    # P(zebra|<s>) → P(<unk>|<s>): no bigram; bo(<s>)=-0.5; unigram -1.0 ⇒ -1.5
    # P(</s>|<s> zebra): no trigram/bigram, no backoff mass on the way ⇒ -0.6
    assert lm.score_log10("zebra") == pytest.approx(-1.5 - 0.6)


def test_inf_sentinel_scores_neg_inf(lm):
    # ("xx",) IS in the vocab with -inf: no unk substitution, and the
    # backoff chain bo(<s>)=-0.5 + (-inf) stays -inf.
    assert lm.score_log10("xx", eos=False) == -math.inf


def test_roundtrip_preserves_kenlm_scores(lm, tmp_path):
    out = tmp_path / "rewritten.arpa"
    lm.to_arpa(out)
    again = NGramLM.from_arpa(out)
    for text in ("cat dog", "dog cat", "zebra", "cat", "dog dog dog"):
        assert again.score_log10(text) == pytest.approx(
            lm.score_log10(text), rel=1e-6
        )
