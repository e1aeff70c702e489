import hashlib
import json

import numpy as np
import pandas as pd
import pytest

from ssd_tpu.data.index_dataset import (
    assign_subset,
    build_index,
    load_index,
    save_index,
    summarize_index,
)


def _write_sample(
    split_dir,
    speaker,
    stem,
    text="hello world",
    sentence_index=0,
    with_audio=True,
    with_clean=False,
    with_emg=True,
    emg_len=2000,
):
    d = split_dir / speaker
    d.mkdir(parents=True, exist_ok=True)
    info = {"text": text, "sentence_index": sentence_index, "book": "b"}
    (d / f"{stem}_info.json").write_text(json.dumps(info))
    if with_emg:
        np.save(d / f"{stem}_emg.npy", np.zeros((emg_len, 8), dtype=np.float32))
    if with_audio:
        (d / f"{stem}_audio.flac").touch()
    if with_clean:
        (d / f"{stem}_audio_clean.flac").touch()


@pytest.fixture
def fake_root(tmp_path):
    root = tmp_path / "emg_data"
    voiced = root / "voiced_parallel_data"
    silent = root / "silent_parallel_data"
    closed = root / "closed_vocab" / "voiced"
    _write_sample(voiced, "s1", "0_0", with_clean=True)
    _write_sample(voiced, "s1", "0_1")
    _write_sample(voiced, "s1", "0_2", text="", sentence_index=1)  # filtered: empty
    _write_sample(voiced, "s1", "0_3", sentence_index=-1)  # filtered: negative idx
    _write_sample(voiced, "s1", "0_4", with_emg=False)  # filtered: no EMG
    _write_sample(silent, "s1", "1_0", with_audio=False)
    _write_sample(closed, "s1", "2_0")
    return root


def test_build_index_filters(fake_root):
    df = build_index(fake_root, ["voiced_parallel_data", "silent_parallel_data", "closed_vocab_voiced"])
    assert len(df) == 4
    assert set(df["split"]) == {
        "voiced_parallel_data",
        "silent_parallel_data",
        "closed_vocab_voiced",
    }
    # all 12 manifest columns present
    assert list(df.columns) == [
        "utterance_id",
        "split",
        "subset",
        "speaker",
        "stem",
        "emg_path",
        "audio_path",
        "transcript",
        "sentence_index",
        "book",
        "has_audio",
        "metadata_json",
    ]


def test_clean_audio_preferred(fake_root):
    df = build_index(fake_root, ["voiced_parallel_data"])
    row = df[df["stem"] == "0_0"].iloc[0]
    assert row["audio_path"].endswith("_audio_clean.flac")
    row = df[df["stem"] == "0_1"].iloc[0]
    assert row["audio_path"].endswith("_audio.flac")


def test_silent_has_no_audio(fake_root):
    df = build_index(fake_root, ["silent_parallel_data"])
    assert not df.iloc[0]["has_audio"]
    assert df.iloc[0]["audio_path"] is None


def test_assign_subset_md5_parity():
    # parity with reference: int(md5(uid).hexdigest(),16) % 100 -> 80/10/10
    for split in ("voiced_parallel_data", "silent_parallel_data"):
        for i in range(50):
            uid = f"{split}/s1/{i}_{i}"
            h = int(hashlib.md5(uid.encode()).hexdigest(), 16) % 100
            expected = "train" if h < 80 else ("val" if h < 90 else "test")
            assert assign_subset(split, uid) == expected
    assert assign_subset("closed_vocab_voiced", "x") == "closed_vocab"
    assert assign_subset("nonparallel_data", "x") == "unused"


def test_save_load_roundtrip(fake_root, tmp_path):
    df = build_index(fake_root, ["voiced_parallel_data"])
    for name in ("idx.parquet", "idx.jsonl"):
        path = tmp_path / name
        save_index(df, path)
        loaded = load_index(path)
        assert len(loaded) == len(df)
        assert list(loaded["utterance_id"]) == list(df["utterance_id"])


def test_summarize_durations(fake_root):
    df = build_index(fake_root, ["voiced_parallel_data"])
    summary = summarize_index(df, root=fake_root, include_durations=True)
    stats = summary["voiced_parallel_data"]
    assert stats["count"] == 2
    assert stats["mean_duration_sec"] == pytest.approx(2.0)  # 2000 samples @ 1 kHz


def test_build_index_empty(tmp_path):
    df = build_index(tmp_path, ["voiced_parallel_data"])
    assert isinstance(df, pd.DataFrame)
    assert df.empty
