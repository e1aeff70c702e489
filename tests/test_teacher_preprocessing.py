"""Teacher preprocessing integration: wav audio → flax WavLM (random small
weights) → cache artifacts, with the reference's skip semantics."""

import json
import wave

import numpy as np
import pandas as pd
import pytest

from ssd_tpu.data.index_dataset import load_index, save_index
from ssd_tpu.data.preprocessing import process_teacher_rows


def _write_wav(path, samples, sr=16000):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes())


@pytest.fixture
def small_teacher(monkeypatch):
    import torch
    from transformers import WavLMConfig as HFConfig, WavLMModel

    from ssd_tpu.models import wavlm as wavlm_mod
    from ssd_tpu.models.wavlm import WavLMConfig, WavLMTeacher

    small = dict(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        conv_dim=(8, 8),
        conv_kernel=(10, 3),
        conv_stride=(5, 2),
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        num_buckets=40,
        max_bucket_distance=100,
    )
    hf = WavLMModel(
        HFConfig(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, conv_dim=[8, 8], conv_kernel=[10, 3],
            conv_stride=[5, 2], num_conv_pos_embeddings=16,
            num_conv_pos_embedding_groups=4, num_buckets=40,
            max_bucket_distance=100, do_stable_layer_norm=False,
            feat_extract_norm="group", conv_bias=False,
            mask_time_prob=0.0, mask_feature_prob=0.0, layerdrop=0.0,
        )
    ).eval()
    teacher = WavLMTeacher.from_torch_model(hf, layer=1, cfg=WavLMConfig(**small))
    monkeypatch.setattr(
        WavLMTeacher, "from_pretrained", classmethod(lambda cls, *a, **k: teacher)
    )
    return teacher


def test_process_teacher_rows(tmp_path, small_teacher):
    rng = np.random.default_rng(0)
    root = tmp_path / "data"
    d = root / "voiced_parallel_data" / "s1"
    d.mkdir(parents=True)
    _write_wav(d / "0_0_audio.flac".replace(".flac", ".wav"), rng.normal(size=8000) * 0.1)

    rows = []
    for i, audio in enumerate(["voiced_parallel_data/s1/0_0_audio.wav", None]):
        rows.append(
            dict(
                utterance_id=f"voiced_parallel_data/s1/{i}_0",
                split="voiced_parallel_data",
                subset="train",
                speaker="s1",
                stem=f"{i}_0",
                emg_path="x",
                audio_path=audio,
                transcript="t",
                sentence_index=i,
                book="",
                has_audio=audio is not None,
                metadata_json="{}",
            )
        )
    index_path = tmp_path / "index.parquet"
    save_index(pd.DataFrame(rows), index_path)
    out = tmp_path / "teacher_out"

    row_tuples = list(load_index(index_path).itertuples(index=False))
    n = process_teacher_rows(
        row_tuples, root, out, model_name="stub", layer=1, sample_rate=16000,
        overwrite=False,
    )
    assert n == 1  # second row skipped (no audio)

    feat = np.load(out / "voiced_parallel_data/s1/0_0.npy")
    # conv stack: (8000-10)//5+1=1599 → (1599-3)//2+1=799 frames, dim 32
    assert feat.shape == (799, 32)
    assert feat.dtype == np.float32
    meta = json.loads((out / "voiced_parallel_data/s1/0_0.json").read_text())
    assert meta["layer"] == 1 and meta["frames"] == 799
    assert meta["frame_stride_sec"] == 0.02

    # idempotent skip
    assert process_teacher_rows(
        row_tuples, root, out, model_name="stub", layer=1, sample_rate=16000,
        overwrite=False,
    ) == 0
