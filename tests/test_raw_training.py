"""Train-from-raw-EMG: on-device featurization inside the jitted step.

``data.train_from_raw: true`` feeds the original (samples, channels) signal
and log-mels it on device — ~8× fewer host/transfer bytes than cached
features at hop 10 (docs/PERF.md "Epoch mode"). These tests pin:

* loss equivalence: a raw batch through the featurize-in-step path matches
  the same utterances' cached features through the standard path;
* the raw loader contract (sample-bucketed shapes, same tokens/teacher);
* an end-to-end ``train_from_config`` run that actually learns.
"""

import numpy as np
import pytest

import jax

from ssd_tpu.data.dataset import make_dataloader, prefetch
from ssd_tpu.data.vocab import default_vocab
from ssd_tpu.training.train import batch_to_arrays, train_from_config

from .helpers import SEP_FEAT_CFG, make_separable_setup


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("raw_train")
    return make_separable_setup(tmp, n_train=12, n_val=4, max_epochs=10)


def test_raw_loader_contract(corpus):
    cfg, vocab, root, texts, _ = corpus
    loader = make_dataloader(
        cfg["data"]["index"], cfg["data"]["features_root"],
        ["voiced_parallel_data"], ["train"], vocab, batch_size=4,
        shuffle=False, include_teacher=False, raw=True,
        raw_hop_length=SEP_FEAT_CFG["hop_length"],
    )
    batch = next(iter(loader))
    B, L, C = batch.emg.shape
    assert C == 2  # raw channels, NOT flattened features
    # time axis bucketed in samples: frames bucket (128) × hop (16)
    assert L % (128 * SEP_FEAT_CFG["hop_length"]) == 0
    assert batch.emg_lengths.max() <= L
    assert batch.tokens.shape[0] == B


def test_raw_loader_rejects_host_augment(corpus):
    from ssd_tpu.data.augment import SpecAugmentConfig

    cfg, vocab, root, *_ = corpus
    with pytest.raises(ValueError, match="on_device"):
        make_dataloader(
            cfg["data"]["index"], cfg["data"]["features_root"],
            ["voiced_parallel_data"], ["train"], vocab, batch_size=4,
            raw=True, spec_augment_cfg=SpecAugmentConfig(),
        )


def test_raw_step_losses_match_feature_step(corpus):
    """Same utterances, two input paths, one loss (augment off, eval mode)."""
    from ssd_tpu.models.ssd_model import build_model
    from ssd_tpu.ops.featurizer import FeaturizerConfig
    from ssd_tpu.training.schedules import build_optimizer
    from ssd_tpu.training.train import init_state, make_eval_step

    import jax.numpy as jnp

    cfg, vocab, root, texts, _ = corpus
    feat_cfg = FeaturizerConfig(**SEP_FEAT_CFG)
    input_dim = 2 * SEP_FEAT_CFG["n_mels"]
    model = build_model(cfg, input_dim=input_dim, vocab_size=vocab.size)
    tx, _ = build_optimizer({"optim": {"lr": 1e-3, "weight_decay": 0.0,
                                       "clip_grad_norm": 5.0, "grad_accum": 1}}, 10)
    state = init_state(model, tx, input_dim, jax.random.PRNGKey(0))
    lambdas = jnp.asarray([1.0, 0.0], jnp.float32)

    kw = dict(batch_size=4, shuffle=False, include_teacher=False)
    feat_loader = make_dataloader(
        cfg["data"]["index"], cfg["data"]["features_root"],
        ["voiced_parallel_data"], ["train"], vocab, **kw)
    raw_loader = make_dataloader(
        cfg["data"]["index"], cfg["data"]["features_root"],
        ["voiced_parallel_data"], ["train"], vocab, raw=True,
        raw_hop_length=SEP_FEAT_CFG["hop_length"], **kw)

    eval_feat = make_eval_step(model, vocab.blank_id, False)
    eval_raw = make_eval_step(model, vocab.blank_id, False,
                              featurize=(feat_cfg, False))

    fb = batch_to_arrays(next(iter(feat_loader)), include_teacher=False)
    rb = batch_to_arrays(next(iter(raw_loader)), include_teacher=False)
    # same utterances in the same order (shuffle off)
    want = eval_feat(state, fb, lambdas)
    got = eval_raw(state, rb, lambdas)
    np.testing.assert_allclose(
        float(got["total"]), float(want["total"]), rtol=2e-4, atol=2e-4
    )


def test_train_from_raw_end_to_end(corpus):
    """train_from_config with data.train_from_raw learns the separable corpus
    and writes a serving-compatible checkpoint."""
    import copy

    cfg, vocab, root, texts, _ = corpus
    cfg = copy.deepcopy(cfg)
    cfg["data"]["train_from_raw"] = True
    cfg["augmentation"] = {"specaugment": {"p": 0.3, "time_masks": 1,
                                           "freq_masks": 1}}
    run_dir = root / "raw_run"
    summary = train_from_config(cfg, run_dir)
    assert (run_dir / "best").exists()
    assert summary["best_val"] < 2.0  # learned well below the ~3.9 init loss

    # the checkpoint serves raw EMG directly (engine featurizes on device)
    from ssd_tpu.serving import engine as engmod

    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(engmod, "SAMPLE_BUCKET", 512)
        mp.setattr(engmod, "BATCH_BUCKETS", (1,))
        engine = engmod.InferenceEngine.from_checkpoint(run_dir / "best")
        from .helpers import render_sine_emg, sep_char_codes

        rng = np.random.default_rng(5)
        freqs, phases = sep_char_codes()
        raw = render_sine_emg("cat dog", rng, freqs, phases, noise=0.05)
        hyp = engine.transcribe([raw])[0]
        assert isinstance(hyp, str) and len(hyp) > 0


def test_evaluate_checkpoint_on_raw_run(corpus):
    """Eval CLI path for raw-trained checkpoints: loader in raw mode, forward
    featurizes on device — no EMG feature cache required (review finding)."""
    import copy

    from ssd_tpu.evaluation.evaluate import evaluate_checkpoint
    from ssd_tpu.decoding.ctc import build_decoder

    cfg, vocab, root, texts, _ = corpus
    cfg = copy.deepcopy(cfg)
    cfg["data"]["train_from_raw"] = True
    run_dir = root / "raw_eval_run"
    train_from_config(cfg, run_dir)
    out = evaluate_checkpoint(
        run_dir / "best", cfg, vocab,
        splits=["voiced_parallel_data"], subsets=["val"],
        decoder_fn=build_decoder("greedy", vocab), batch_size=4,
    )
    m = out["metrics"]
    assert 0.0 <= m["cer"] <= 0.5  # the separable corpus is learnable
    assert len(out["records"]) == 4
