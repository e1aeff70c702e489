from ssd_tpu.data.text_normalizer import normalize_transcript


def test_basic_lower_and_strip():
    assert normalize_transcript("  Hello World  ") == "hello world"


def test_smart_quotes_and_dashes():
    assert normalize_transcript("“Hi” — it’s") == '"hi" - it\'s'


def test_leading_headings_stripped():
    assert normalize_transcript("IV. The chapter") == "the chapter"
    assert normalize_transcript("12. Another one") == "another one"
    # heading mid-string is untouched
    assert normalize_transcript("see 12. above") == "see 12. above"


def test_non_ascii_replaced_with_space():
    assert normalize_transcript("café au lait") == "caf au lait"


def test_none_and_empty():
    assert normalize_transcript(None) == ""
    assert normalize_transcript("   ") == ""


def test_whitespace_collapse():
    assert normalize_transcript("a\t\tb\n c") == "a b c"
