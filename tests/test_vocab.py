import json

import numpy as np

from ssd_tpu.data.vocab import DEFAULT_TOKENS, Vocab, default_vocab


def test_default_vocab_layout():
    v = default_vocab()
    assert v.size == 48
    assert v.tokens[v.pad_id] == "<pad>"
    assert v.tokens[v.blank_id] == "<blank>"
    assert v.tokens[v.unk_id] == "<unk>"
    assert v.token_to_id[" "] == 3
    assert v.token_to_id["a"] == 22
    assert v.token_to_id["z"] == 47


def test_encode_lowercases_and_unks():
    v = default_vocab()
    ids = v.encode("Ab~")
    assert ids == [v.token_to_id["a"], v.token_to_id["b"], v.unk_id]


def test_decode_skips_blank_and_pad():
    v = default_vocab()
    ids = [v.pad_id, v.token_to_id["h"], v.blank_id, v.token_to_id["i"], v.pad_id]
    assert v.decode(ids) == "hi"
    # blank decodes to its literal token when not skipped (reference semantics)
    assert v.decode(ids, skip_blank=False) == "h<blank>i"


def test_encode_np_pads():
    v = default_vocab()
    arr = v.encode_np("hi", max_len=5)
    assert arr.dtype == np.int32
    assert arr.tolist() == [v.token_to_id["h"], v.token_to_id["i"], 0, 0, 0]


def test_json_roundtrip(tmp_path):
    v = default_vocab()
    path = tmp_path / "vocab.json"
    v.to_json(path)
    loaded = Vocab.from_json(path)
    assert loaded.tokens == DEFAULT_TOKENS
    assert (loaded.pad_id, loaded.blank_id, loaded.unk_id) == (0, 1, 2)
    # format parity with the reference configs/vocab.json
    payload = json.loads(path.read_text())
    assert set(payload) == {"tokens", "pad_id", "blank_id", "unk_id"}
