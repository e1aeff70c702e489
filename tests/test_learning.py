"""End-to-end learning sanity: on synthetic EMG whose features deterministically
encode the transcript, the full pipeline (loader → conformer → CTC → AdamW →
greedy decode) must drive CER to ~0. Catches sign errors, mask bugs, and
optimizer wiring that unit goldens cannot."""

import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

from ssd_tpu.data.index_dataset import save_index
from ssd_tpu.data.vocab import Vocab
from ssd_tpu.evaluation.metrics import cer
from ssd_tpu.models.conformer import EncoderConfig
from ssd_tpu.models.ssd_model import SSDModel
from ssd_tpu.ops.ctc_decode import greedy_decode
from ssd_tpu.ops.ctc_loss import ctc_loss
from ssd_tpu.training.schedules import build_optimizer
from ssd_tpu.training.train import TrainState, init_state, make_train_step
from ssd_tpu.parallel.mesh import make_mesh, shard_batch


def test_overfit_synthetic_ctc():
    """8 'words' over a 6-char alphabet, 4 frames/char feature patterns."""
    rng = np.random.default_rng(0)
    tokens = ["<pad>", "<blank>", "<unk>", "a", "b", "c", "d"]
    vocab = Vocab(tokens=tokens)
    n_char = len(tokens)
    F = 16
    # each char gets a distinct random feature template
    templates = rng.normal(size=(n_char, F)).astype(np.float32) * 2

    def render(text):
        ids = vocab.encode(text)
        frames = []
        for i in ids:
            frames.extend([templates[i]] * 4)
        x = np.asarray(frames)
        return x + rng.normal(size=x.shape).astype(np.float32) * 0.1

    texts = ["abcd", "dcba", "aabb", "cdcd", "badc", "abab", "ddca", "cabd"]
    B = len(texts)
    T = max(len(t) for t in texts) * 4
    S = max(len(t) for t in texts)
    emg = np.zeros((B, T, F), np.float32)
    emg_lengths = np.zeros((B,), np.int32)
    tok = np.zeros((B, S), np.int32)
    tok_lengths = np.zeros((B,), np.int32)
    for i, t in enumerate(texts):
        x = render(t)
        emg[i, : len(x)] = x
        emg_lengths[i] = len(x)
        ids = vocab.encode(t)
        tok[i, : len(ids)] = ids
        tok_lengths[i] = len(ids)

    cfg = EncoderConfig(
        input_dim=F, d_model=32, num_layers=2, num_heads=4, ffn_dim=64,
        depthwise_conv_kernel_size=7, dropout=0.0, subsample_factor=2,
    )
    model = SSDModel(encoder_cfg=cfg, projection_dim=8, vocab_size=vocab.size)
    opt_cfg = {"optim": {"lr": 3e-3, "weight_decay": 0.0, "clip_grad_norm": 5.0,
                         "grad_accum": 1}}
    tx, _ = build_optimizer(opt_cfg, 300)
    state = init_state(model, tx, F, jax.random.PRNGKey(0))
    train_step = make_train_step(model, tx, blank_id=vocab.blank_id, normalize_distill=False)

    mesh = make_mesh()
    batch = {
        "emg": emg, "emg_lengths": emg_lengths,
        "tokens": tok, "token_lengths": tok_lengths,
        "weight": np.ones((B,), np.float32),
    }
    lam = jnp.asarray([1.0, 0.0], jnp.float32)
    key = jax.random.PRNGKey(1)
    with mesh:
        dev_batch = shard_batch(mesh, batch)
        losses = None
        for i in range(250):
            state, losses = train_step(state, dev_batch, lam, key)
            # Bound the async dispatch queue: each step runs an 8-way
            # all-reduce on the virtual CPU mesh, and XLA:CPU's collective
            # rendezvous hard-aborts (CHECK-fail, 40 s) if one participant
            # thread is starved — which hundreds of un-awaited queued steps
            # on a small host reliably provoke. A periodic fence keeps the
            # queue shallow; production TPU dispatch is untouched.
            if (i + 1) % 16 == 0:
                jax.block_until_ready(losses)
        final_loss = float(losses["total"])

        lp, out_len, _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            jnp.asarray(emg), jnp.asarray(emg_lengths), train=False,
        )
        toks, counts = greedy_decode(lp, out_len, vocab.blank_id, vocab.pad_id)
    hyps = [vocab.decode(np.asarray(toks[i, : int(counts[i])])) for i in range(B)]
    score = cer(texts, hyps)
    assert final_loss < 0.5, (final_loss, hyps)
    assert score < 0.15, (score, hyps)
