"""Connectionist Temporal Classification loss, on-device.

The reference trains with ``torch.nn.CTCLoss(blank, zero_infinity=True)`` and
had to run it on **CPU** because MPS has no CTC kernel
(``src/models/losses.py:28,55``; blog "Challenge 1"). Here the loss is a
log-semiring forward (α) recursion expressed as a ``jax.lax.scan`` over time,
so it runs fused on TPU inside the jitted train step and differentiates by
autodiff through the scan.

Numerics match ``torch.nn.CTCLoss`` (see ``tests/test_ctc_loss.py`` goldens):

* extended label sequence ``blank t1 blank t2 … blank`` (2S+1 states)
* self-loop + advance + skip (skip only between distinct non-blank labels)
* ``zero_infinity=True``: impossible alignments (T < S + repeats) produce 0
  loss and 0 gradient instead of inf
* ``reduction='mean'``: per-sample loss divided by ``target_length`` (clamped
  to 1), then averaged over the batch.

Shapes are static: targets are padded to ``S_max`` and sequences to ``T_max``;
per-sample ``logit_lengths`` / ``target_lengths`` select the live region, so
one compiled executable serves a whole length bucket.

Gradient note: torch's CTC backward returns ``exp(log_probs) − γ`` — it bakes
the log-softmax backward into the loss gradient (its row sums are 0). Autodiff
here returns the *true* gradient w.r.t. the log-probs (``−γ``, row sums −1),
verified against finite differences. Composed through an actual log-softmax
the two yield **identical logits gradients**, so training dynamics match the
reference exactly (tested in ``tests/test_ctc_loss.py``).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssd_tpu.utils.platform import is_tpu_backend, pallas_interpret

NEG_INF = -1.0e30  # safe -inf surrogate: logaddexp stays finite


def _resolve_impl(impl: str) -> str:
    """``auto`` → Mosaic kernels on real TPU, XLA scans elsewhere.

    ``SSD_CTC_IMPL={scan,pallas}`` overrides ``auto`` (profiling/rollback
    escape hatch). The per-iteration work of the α/β recursions is a handful
    of (B, 2S+1) element-wise ops — latency-bound, so the XLA scan pays loop
    dispatch every (unrolled) iteration; a single Mosaic kernel that carries
    α in VMEM across a sequential time grid removes that overhead entirely
    (measured: see docs/PERF.md "Pallas CTC").
    """
    if impl == "auto":
        env = os.environ.get("SSD_CTC_IMPL")
        if env in ("scan", "pallas"):
            return env
        return "pallas" if is_tpu_backend() else "scan"
    return impl


def _extend_targets(targets: jnp.ndarray, blank_id: int) -> jnp.ndarray:
    """(B, S) → (B, 2S+1) interleaved with blanks: b t1 b t2 … b."""
    B, S = targets.shape
    ext = jnp.full((B, 2 * S + 1), blank_id, dtype=targets.dtype)
    return ext.at[:, 1::2].set(targets)


def _topology(targets: jnp.ndarray, blank_id: int, V: int):
    """Extended labels, skip mask, and the one-hot selector matrix."""
    ext = _extend_targets(targets.astype(jnp.int32), blank_id)  # (B, S2)
    S2 = ext.shape[1]
    is_label = (jnp.arange(S2) % 2 == 1)[None, :]
    prev2_label = jnp.pad(ext[:, :-2], ((0, 0), (2, 0)), constant_values=-1)
    allow_skip = is_label & (ext != prev2_label)  # skip INTO state s
    onehot = jax.nn.one_hot(ext, V, dtype=jnp.float32)  # (B, S2, V)
    return ext, allow_skip, onehot


def _emissions(log_probs: jnp.ndarray, onehot: jnp.ndarray) -> jnp.ndarray:
    """(B,T,V) × (B,S2,V) → (T,B,S2) per-state emission log-probs.

    Expressed as a one-hot matmul, not a gather — on TPU the equivalent
    take_along_axis gather lowers to a ~40 ms scalar loop at training shapes
    while the MXU einsum takes ~1 ms. HIGHEST precision keeps it exact
    (each one-hot row selects a single fp32 value).
    """
    lp_ext = jnp.einsum(
        "btv,bsv->bts", log_probs, onehot, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.moveaxis(lp_ext, 1, 0)


def _forward_alphas(lp_ext: jnp.ndarray, allow_skip: jnp.ndarray):
    """α recursion; returns all alphas (T, B, S2)."""
    T, B, S2 = lp_ext.shape
    alpha0 = jnp.full((B, S2), NEG_INF)
    alpha0 = alpha0.at[:, 0].set(lp_ext[0, :, 0])
    if S2 > 1:
        alpha0 = alpha0.at[:, 1].set(lp_ext[0, :, 1])

    def step(alpha, lp_t):
        advance = jnp.pad(alpha[:, :-1], ((0, 0), (1, 0)), constant_values=NEG_INF)
        skip = jnp.pad(alpha[:, :-2], ((0, 0), (2, 0)), constant_values=NEG_INF)
        skip = jnp.where(allow_skip, skip, NEG_INF)
        merged = jnp.logaddexp(jnp.logaddexp(alpha, advance), skip)
        new_alpha = jnp.maximum(lp_t + merged, NEG_INF)
        return new_alpha, new_alpha

    # unroll: each scan iteration is a handful of (B, S2) elementwise ops —
    # latency-bound on TPU; unrolling amortizes per-iteration loop overhead
    _, alphas = jax.lax.scan(step, alpha0, lp_ext[1:], unroll=8)
    return jnp.concatenate([alpha0[None], alphas], axis=0)


# --------------------------------------------------------------------------
# Pallas (Mosaic) α/β recursions: the whole time loop inside ONE kernel.
#
# The scans above are latency-bound — per (unrolled) iteration XLA pays loop
# dispatch for ~6 tiny (B, 2S+1) VPU ops. Here the time axis is the Pallas
# grid (sequential on TPU), α/β live in a VMEM scratch across grid steps, and
# the per-step lp_ext block streams HBM→VMEM through the automatic pipeline,
# so the recursion runs at its DMA floor. Same numerics as the scans
# (identical op order; parity pinned in tests/test_ctc_loss.py and on-chip in
# tests/tpu).
# --------------------------------------------------------------------------


def _alpha_kernel(lp_ref, skipf_ref, out_ref, alpha_ref):
    t = pl.program_id(0)
    lp_t = lp_ref[0]  # (B, S2)
    B, S2 = lp_t.shape
    neg = jnp.full((B, 1), NEG_INF, jnp.float32)

    @pl.when(t == 0)
    def _():
        s_idx = jax.lax.broadcasted_iota(jnp.int32, (B, S2), 1)
        alpha0 = jnp.where(s_idx <= 1, lp_t, NEG_INF)
        alpha_ref[...] = alpha0
        out_ref[0] = alpha0

    @pl.when(t > 0)
    def _():
        alpha = alpha_ref[...]
        advance = jnp.concatenate([neg, alpha[:, :-1]], axis=1)
        skip = jnp.concatenate([neg, neg, alpha[:, :-2]], axis=1)
        skip = jnp.where(skipf_ref[...] > 0, skip, NEG_INF)
        merged = jnp.logaddexp(jnp.logaddexp(alpha, advance), skip)
        new_alpha = jnp.maximum(lp_t + merged, NEG_INF)
        alpha_ref[...] = new_alpha
        out_ref[0] = new_alpha


def _forward_alphas_pallas(lp_ext: jnp.ndarray, allow_skip: jnp.ndarray):
    """α recursion as one Mosaic kernel; returns all alphas (T, B, S2)."""
    T, B, S2 = lp_ext.shape
    return pl.pallas_call(
        _alpha_kernel,
        out_shape=jax.ShapeDtypeStruct((T, B, S2), jnp.float32),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, S2), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, S2), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, B, S2), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((B, S2), jnp.float32)],
        interpret=pallas_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=10 * T * B * S2,
            bytes_accessed=4 * 2 * T * B * S2,
            transcendentals=2 * T * B * S2,
        ),
    )(lp_ext, allow_skip.astype(jnp.float32))


def _beta_kernel(lp_ref, skipf_ref, bfinal_ref, len_ref, out_ref, beta_ref):
    i = pl.program_id(0)
    t = pl.num_programs(0) - 1 - i  # time runs T−1 → 0
    bfinal = bfinal_ref[...]  # (B, S2)
    B, S2 = bfinal.shape
    is_last = len_ref[...] - 1 == t  # (B, 1), broadcasts over states
    neg = jnp.full((B, 1), NEG_INF, jnp.float32)

    @pl.when(i == 0)
    def _():
        beta = jnp.where(is_last, bfinal, jnp.full((B, S2), NEG_INF, jnp.float32))
        beta_ref[...] = beta
        out_ref[0] = beta

    @pl.when(i > 0)
    def _():
        u = beta_ref[...] + lp_ref[0]  # β_{t+1} + lp_{t+1}
        advance = jnp.concatenate([u[:, 1:], neg], axis=1)
        skip = jnp.concatenate([u[:, 2:], neg, neg], axis=1)
        skip = jnp.where(skipf_ref[...] > 0, skip, NEG_INF)
        merged = jnp.maximum(
            jnp.logaddexp(jnp.logaddexp(u, advance), skip), NEG_INF
        )
        beta = jnp.where(is_last, bfinal, merged)
        beta_ref[...] = beta
        out_ref[0] = beta


def _betas_pallas(lp_ext, logit_lengths, beta_final, skip_from):
    """β recursion as one Mosaic kernel; returns all betas (T, B, S2)."""
    T, B, S2 = lp_ext.shape
    return pl.pallas_call(
        _beta_kernel,
        out_shape=jax.ShapeDtypeStruct((T, B, S2), jnp.float32),
        grid=(T,),
        in_specs=[
            # lp_ext at t+1 = T−i; clamped to a valid (unused) block at i=0
            pl.BlockSpec(
                (1, B, S2),
                lambda i: (T - jnp.maximum(i, 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((B, S2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, S2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, B, S2), lambda i: (T - 1 - i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((B, S2), jnp.float32)],
        interpret=pallas_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=10 * T * B * S2,
            bytes_accessed=4 * 2 * T * B * S2,
            transcendentals=2 * T * B * S2,
        ),
    )(
        lp_ext,
        skip_from.astype(jnp.float32),
        beta_final,
        logit_lengths.astype(jnp.int32)[:, None],
    )


def _loglik(alphas, logit_lengths, target_lengths):
    """Gather log-likelihood from α at each sample's final frame/states."""
    T, B, S2 = alphas.shape
    t_last = jnp.clip(logit_lengths - 1, 0, T - 1)
    alpha_last = jnp.take_along_axis(
        jnp.moveaxis(alphas, 0, 1), t_last[:, None, None], axis=1
    )[:, 0]  # (B, S2)
    s_blank = jnp.clip(2 * target_lengths, 0, S2 - 1)
    s_label = jnp.clip(2 * target_lengths - 1, 0, S2 - 1)
    end_blank = jnp.take_along_axis(alpha_last, s_blank[:, None], axis=1)[:, 0]
    end_label = jnp.where(
        target_lengths > 0,
        jnp.take_along_axis(alpha_last, s_label[:, None], axis=1)[:, 0],
        NEG_INF,
    )
    return jnp.logaddexp(end_blank, end_label)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def ctc_loss(
    log_probs: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    targets: jnp.ndarray,
    target_lengths: jnp.ndarray,
    blank_id: int = 0,
    impl: str = "auto",
) -> jnp.ndarray:
    """Per-sample CTC negative log-likelihood.

    Args:
      log_probs: ``(B, T, V)`` log-softmax outputs.
      logit_lengths: ``(B,)`` valid frame counts.
      targets: ``(B, S)`` padded label ids (padding value irrelevant).
      target_lengths: ``(B,)`` valid label counts.
      blank_id: CTC blank index.
      impl: ``auto`` | ``scan`` | ``pallas`` — α/β recursion backend
        (``auto`` picks the Mosaic kernels on real TPU; see
        :func:`_resolve_impl`).

    Returns:
      ``(B,)`` float32 losses; impossible alignments yield 0 (zero_infinity).

    The gradient uses the analytic α–β (forward–backward) posterior
    ``∂loss/∂lp[t,v] = −Σ_{s: label(s)=v} exp(α_t(s)+β_t(s)−ll)`` via a
    custom VJP — one extra reverse scan instead of autodiff's transposed
    scan, ~2× faster and with exact posterior normalization.
    """
    loss, _ = _ctc_fwd_impl(
        log_probs, logit_lengths, targets, target_lengths, blank_id, impl
    )
    return loss


def _ctc_fwd_impl(log_probs, logit_lengths, targets, target_lengths, blank_id,
                  impl="auto"):
    log_probs = log_probs.astype(jnp.float32)
    B, T, V = log_probs.shape
    _, allow_skip, onehot = _topology(targets, blank_id, V)
    lp_ext = _emissions(log_probs, onehot)
    S2 = lp_ext.shape[2]
    if _resolve_impl(impl) == "pallas" and T >= 2 and S2 >= 3:
        alphas = _forward_alphas_pallas(lp_ext, allow_skip)
    else:
        alphas = _forward_alphas(lp_ext, allow_skip)
    ll = _loglik(alphas, logit_lengths, target_lengths)
    impossible = ll <= NEG_INF / 2
    loss = jnp.where(impossible, 0.0, -ll)
    return loss, (lp_ext, alphas, allow_skip, onehot, ll, impossible)


def _ctc_fwd(log_probs, logit_lengths, targets, target_lengths, blank_id, impl):
    loss, res = _ctc_fwd_impl(
        log_probs, logit_lengths, targets, target_lengths, blank_id, impl
    )
    return loss, (res, logit_lengths, target_lengths)


def _ctc_bwd(blank_id, impl, carry, g):
    (lp_ext, alphas, allow_skip, onehot, ll, impossible), logit_lengths, target_lengths = carry
    T, B, S2 = lp_ext.shape

    # β recursion (reverse): β_t(s) = logsumexp over successors s' ∈
    # {s, s+1, s+2·skip} of β_{t+1}(s') + lp_{t+1}(s'). Per-sample final
    # frames differ, so β is *injected* at t = len−1 with the final-state
    # indicator and stays NEG_INF for t ≥ len.
    s_idx = jnp.arange(S2)[None, :]
    final_mask = (s_idx == jnp.clip(2 * target_lengths, 0, S2 - 1)[:, None]) | (
        (s_idx == jnp.clip(2 * target_lengths - 1, 0, S2 - 1)[:, None])
        & (target_lengths > 0)[:, None]
    )
    beta_final = jnp.where(final_mask, 0.0, NEG_INF)  # (B, S2)

    # skip FROM state s jumps into s+2 — gate by allow_skip shifted left
    skip_from = jnp.pad(allow_skip[:, 2:], ((0, 0), (0, 2)), constant_values=False)

    def step(beta_next, inputs):
        lp_next, t = inputs  # lp_ext at t+1, scalar time index t
        u = beta_next + lp_next  # (B, S2)
        stay = u
        advance = jnp.pad(u[:, 1:], ((0, 0), (0, 1)), constant_values=NEG_INF)
        skip = jnp.pad(u[:, 2:], ((0, 0), (0, 2)), constant_values=NEG_INF)
        skip = jnp.where(skip_from, skip, NEG_INF)
        merged = jnp.maximum(
            jnp.logaddexp(jnp.logaddexp(stay, advance), skip), NEG_INF
        )
        # inject the final-state indicator where t is this sample's last frame
        is_last = (t == logit_lengths - 1)[:, None]
        beta_t = jnp.where(is_last, beta_final, merged)
        return beta_t, beta_t

    if _resolve_impl(impl) == "pallas" and T >= 2 and S2 >= 3:
        betas = _betas_pallas(lp_ext, logit_lengths, beta_final, skip_from)
    else:
        beta_T = jnp.where(
            (T - 1 == logit_lengths - 1)[:, None],
            beta_final,
            jnp.full((B, S2), NEG_INF),
        )
        _, betas_rev = jax.lax.scan(
            step,
            beta_T,
            (lp_ext[1:][::-1], jnp.arange(T - 1)[::-1]),
            unroll=8,
        )
        betas = jnp.concatenate([betas_rev[::-1], beta_T[None]], axis=0)  # (T, B, S2)

    t_idx = jnp.arange(T)[:, None, None]
    valid = t_idx < logit_lengths[None, :, None]
    posterior = jnp.exp(
        jnp.clip(alphas + betas - ll[None, :, None], NEG_INF, 0.0)
    )
    posterior = jnp.where(valid, posterior, 0.0)
    posterior = jnp.where(impossible[None, :, None], 0.0, posterior)

    # ∂loss/∂lp_ext = −posterior, scaled by the upstream per-sample cotangent
    grad_ext = -posterior * g[None, :, None]  # (T, B, S2)
    # scatter back to vocab via the transposed one-hot matmul
    grad_lp = jnp.einsum(
        "tbs,bsv->btv",
        grad_ext,
        onehot,
        precision=jax.lax.Precision.HIGHEST,
    )
    return grad_lp, None, None, None


ctc_loss.defvjp(_ctc_fwd, _ctc_bwd)


@functools.partial(jax.jit, static_argnames=("blank_id", "reduction", "impl"))
def _ctc_loss_reduced_jit(
    log_probs, logit_lengths, targets, target_lengths, blank_id, reduction, impl
):
    per_sample = ctc_loss(
        log_probs, logit_lengths, targets, target_lengths, blank_id, impl
    )
    if reduction == "none":
        return per_sample
    if reduction == "sum":
        return jnp.sum(per_sample)
    if reduction == "mean":
        denom = jnp.maximum(target_lengths, 1).astype(jnp.float32)
        return jnp.mean(per_sample / denom)
    raise ValueError(f"unknown reduction {reduction!r}")


def ctc_loss_reduced(
    log_probs: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    targets: jnp.ndarray,
    target_lengths: jnp.ndarray,
    blank_id: int = 0,
    reduction: str = "mean",
    impl: str = "auto",
) -> jnp.ndarray:
    """CTC loss with torch-style reduction (``mean`` | ``sum`` | ``none``).

    ``impl='auto'`` is resolved HERE, outside the jit, so flipping
    ``SSD_CTC_IMPL`` between calls takes effect (the resolved value is the
    static cache key). When :func:`ctc_loss` is traced inside a larger jit
    (the train step), the env var is read at trace time instead — set it
    before the first step, or pass ``impl=`` explicitly.
    """
    return _ctc_loss_reduced_jit(
        log_probs, logit_lengths, targets, target_lengths, blank_id,
        reduction, _resolve_impl(impl),
    )
