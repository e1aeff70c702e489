"""CTC loss goldens vs torch.nn.CTCLoss (the reference's loss backend,
src/models/losses.py:28). Covers values, gradients, padding invariance,
zero_infinity, and empty targets."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ssd_tpu.ops.ctc_loss import ctc_loss, ctc_loss_reduced

BLANK = 1  # reference vocab: blank_id = 1
V = 12


def _rand_batch(rng, B, T, S, t_min=None):
    logits = rng.normal(size=(B, T, V)).astype(np.float32)
    log_probs = torch.log_softmax(torch.from_numpy(logits), dim=-1).numpy()
    logit_lengths = rng.integers(t_min or (T // 2), T + 1, size=B)
    logit_lengths[0] = T
    target_lengths = rng.integers(1, S + 1, size=B)
    targets = rng.integers(0, V, size=(B, S))
    # avoid blank inside targets (reference targets never contain blank)
    targets = np.where(targets == BLANK, 2, targets)
    for b in range(B):
        targets[b, target_lengths[b] :] = 0
    return log_probs, logit_lengths.astype(np.int32), targets.astype(np.int32), target_lengths.astype(np.int32)


def _torch_ctc(log_probs, logit_lengths, targets, target_lengths, reduction="none"):
    loss_fn = torch.nn.CTCLoss(blank=BLANK, zero_infinity=True, reduction=reduction)
    lp = torch.from_numpy(log_probs).transpose(0, 1).requires_grad_(True)  # (T,B,V)
    out = loss_fn(
        lp,
        torch.from_numpy(targets),
        torch.from_numpy(logit_lengths),
        torch.from_numpy(target_lengths),
    )
    return out, lp


def test_values_match_torch():
    rng = np.random.default_rng(1)
    lp, ll, tg, tl = _rand_batch(rng, B=5, T=40, S=9)
    want, _ = _torch_ctc(lp, ll, tg, tl)
    got = ctc_loss(jnp.asarray(lp), jnp.asarray(ll), jnp.asarray(tg), jnp.asarray(tl), BLANK)
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(), rtol=1e-4, atol=1e-4)


def test_mean_reduction_matches_torch():
    rng = np.random.default_rng(2)
    lp, ll, tg, tl = _rand_batch(rng, B=4, T=30, S=7)
    want, _ = _torch_ctc(lp, ll, tg, tl, reduction="mean")
    got = ctc_loss_reduced(
        jnp.asarray(lp), jnp.asarray(ll), jnp.asarray(tg), jnp.asarray(tl), BLANK, "mean"
    )
    np.testing.assert_allclose(float(got), float(want), rtol=1e-4, atol=1e-5)


def test_logits_gradients_match_torch():
    """Gradients compared at the LOGITS (pre-log-softmax) level.

    torch's CTC backward folds the log-softmax backward into its gradient
    (returns exp(lp) − γ); ours is the true ∂loss/∂log_probs (−γ). Composed
    through log-softmax both must produce identical logits gradients — that is
    what the encoder actually receives during training.
    """
    rng = np.random.default_rng(3)
    B, T, S = 3, 25, 6
    logits = rng.normal(size=(B, T, V)).astype(np.float32)
    _, ll, tg, tl = _rand_batch(rng, B, T, S)

    lt = torch.from_numpy(logits).requires_grad_(True)
    loss_fn = torch.nn.CTCLoss(blank=BLANK, zero_infinity=True, reduction="sum")
    out = loss_fn(
        torch.log_softmax(lt, dim=-1).transpose(0, 1),
        torch.from_numpy(tg),
        torch.from_numpy(ll),
        torch.from_numpy(tl),
    )
    out.backward()
    want_grad = lt.grad.numpy()

    def f(x):
        lp = jax.nn.log_softmax(x, axis=-1)
        return jnp.sum(
            ctc_loss(lp, jnp.asarray(ll), jnp.asarray(tg), jnp.asarray(tl), BLANK)
        )

    got_grad = np.asarray(jax.grad(f)(jnp.asarray(logits)))
    np.testing.assert_allclose(got_grad, want_grad, rtol=1e-3, atol=1e-4)


def test_repeated_labels():
    # repeats forbid the skip transition; classic correctness trap
    rng = np.random.default_rng(4)
    B, T, S = 2, 20, 6
    lp, ll, _, _ = _rand_batch(rng, B, T, S)
    tg = np.array([[3, 3, 4, 4, 3, 0], [5, 5, 5, 5, 5, 5]], dtype=np.int32)
    tl = np.array([5, 6], dtype=np.int32)
    want, _ = _torch_ctc(lp, ll, tg, tl)
    got = ctc_loss(jnp.asarray(lp), jnp.asarray(ll), jnp.asarray(tg), jnp.asarray(tl), BLANK)
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(), rtol=1e-4, atol=1e-4)


def test_zero_infinity():
    # target longer than input frames → impossible → 0 loss, 0 grad
    rng = np.random.default_rng(5)
    B, T, S = 2, 6, 10
    logits = rng.normal(size=(B, T, V)).astype(np.float32)
    lp = torch.log_softmax(torch.from_numpy(logits), dim=-1).numpy()
    ll = np.array([6, 6], np.int32)
    tg = np.tile(np.arange(2, 12, dtype=np.int32), (B, 1))
    tl = np.array([10, 3], np.int32)
    want, _ = _torch_ctc(lp, ll, tg, tl)
    got = ctc_loss(jnp.asarray(lp), jnp.asarray(ll), jnp.asarray(tg), jnp.asarray(tl), BLANK)
    assert float(got[0]) == 0.0
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(), rtol=1e-4, atol=1e-4)

    g = jax.grad(
        lambda x: jnp.sum(ctc_loss(x, jnp.asarray(ll), jnp.asarray(tg), jnp.asarray(tl), BLANK))
    )(jnp.asarray(lp))
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.allclose(np.asarray(g[0]), 0.0)


def test_padding_invariance():
    # extra T/S padding must not change the loss
    rng = np.random.default_rng(6)
    lp, ll, tg, tl = _rand_batch(rng, B=3, T=20, S=5)
    base = ctc_loss(jnp.asarray(lp), jnp.asarray(ll), jnp.asarray(tg), jnp.asarray(tl), BLANK)
    lp_pad = np.concatenate([lp, rng.normal(size=(3, 7, V)).astype(np.float32)], axis=1)
    tg_pad = np.concatenate([tg, np.zeros((3, 4), np.int32)], axis=1)
    padded = ctc_loss(
        jnp.asarray(lp_pad), jnp.asarray(ll), jnp.asarray(tg_pad), jnp.asarray(tl), BLANK
    )
    np.testing.assert_allclose(np.asarray(base), np.asarray(padded), rtol=1e-5, atol=1e-5)


def test_pallas_impl_matches_scan_bitwise():
    """Mosaic α/β kernels (interpret mode here; compiled in tests/tpu) vs the
    XLA scans: identical op order → bitwise-equal values AND gradients,
    including ragged lengths and an impossible (zero_infinity) row."""
    rng = np.random.default_rng(7)
    lp, ll, tg, tl = _rand_batch(rng, B=4, T=18, S=5)
    ll[1] = 3  # impossible: 3 frames for up-to-5 labels (plus blanks)
    tl[1] = 5
    args = (jnp.asarray(lp), jnp.asarray(ll), jnp.asarray(tg), jnp.asarray(tl))

    def run(impl):
        def loss(x):
            return jnp.sum(ctc_loss(x, *args[1:], BLANK, impl))

        v, g = jax.value_and_grad(loss)(args[0])
        return np.asarray(v), np.asarray(g)

    v_scan, g_scan = run("scan")
    v_pallas, g_pallas = run("pallas")
    np.testing.assert_array_equal(v_scan, v_pallas)
    np.testing.assert_array_equal(g_scan, g_pallas)
