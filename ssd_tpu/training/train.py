"""Training CLI: jitted data-parallel train step over a TPU mesh.

Surface parity with the reference trainer (``src/training/train.py``):

  python -m ssd_tpu.training.train --config configs/tpu_fast_plus.yaml \
      [--run-dir …] [--init-checkpoint …] [--dry-run] [--overfit-batches N]

Same YAML schema, artifacts (``<run>/last``, ``<run>/best``, ``config.json``,
TensorBoard scalars under ``tb/``), per-epoch validation with best-checkpoint
selection on val total loss, early stopping, per-epoch distillation-λ warmup
(``train.py:482-489``), and strict=False warm starts.

The execution model is TPU-native: the whole per-batch body — encoder,
heads, CTC (on device), distillation MSE, backward, AdamW update — is ONE
jitted step, compiled per length bucket, with the batch sharded over the
mesh ``data`` axis and parameters replicated (XLA inserts the gradient
psum). Gradient accumulation uses optax.MultiSteps so the schedule advances
once per effective update, exactly like the reference scheduler.
"""

from __future__ import annotations

import argparse
import functools
import logging
import math
import signal
import threading
import time
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from ssd_tpu.data.augment import ChannelDropoutConfig, SpecAugmentConfig
from ssd_tpu.data.dataset import Batch, DataLoader, make_dataloader, prefetch
from ssd_tpu.data.vocab import Vocab
from ssd_tpu.models.losses import LossWeights, distillation_mse
from ssd_tpu.models.ssd_model import SSDModel, build_model
from ssd_tpu.ops.ctc_loss import ctc_loss
from ssd_tpu.parallel.mesh import mesh_from_config, pad_batch_to_multiple, shard_batch
from ssd_tpu.parallel.partition import check_tp_divisibility, shard_state
from ssd_tpu.training.checkpoint import (
    CheckpointWriter,
    load_checkpoint,
    load_params_partial,
)
from ssd_tpu.training.schedules import build_optimizer

logger = logging.getLogger(__name__)


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def set_seed(seed: int) -> jax.Array:
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


# --------------------------------------------------------------------------
# Steps
# --------------------------------------------------------------------------


def batch_to_arrays(batch: Batch, include_teacher: bool) -> Dict[str, np.ndarray]:
    arrays = {
        "emg": batch.emg,
        "emg_lengths": batch.emg_lengths,
        "tokens": batch.tokens,
        "token_lengths": batch.token_lengths,
        "weight": np.ones((batch.emg.shape[0],), np.float32),
    }
    if include_teacher and batch.teacher is not None:
        arrays["teacher"] = batch.teacher
        arrays["teacher_lengths"] = batch.teacher_lengths
    return arrays


def _losses(
    model: SSDModel,
    params,
    batch_stats,
    batch: Dict[str, jnp.ndarray],
    lambdas: jnp.ndarray,
    blank_id: int,
    normalize_distill: bool,
    train: bool,
    dropout_rng: Optional[jax.Array],
    augment: Optional[Tuple] = None,
    featurize: Optional[Tuple] = None,
) -> Tuple[jnp.ndarray, Tuple[Dict[str, jnp.ndarray], Any]]:
    emg = batch["emg"]
    emg_lengths = batch["emg_lengths"]
    if featurize is not None:
        # raw-EMG mode (data.train_from_raw): batch["emg"] is the original
        # (B, samples, channels) signal; log-mel runs ON DEVICE in the step
        # (fused Pallas on TPU). 8× fewer host→device bytes than cached
        # features at hop 10, and the featurizer rides the same executable.
        from ssd_tpu.ops.featurizer import logmel_batch

        feat_cfg, fused = featurize
        feats, emg_lengths, _, _ = logmel_batch(
            emg, emg_lengths, feat_cfg, fused=fused
        )
        B, T, C, M = feats.shape
        emg = feats.reshape(B, T, C * M)
    if train and augment is not None and dropout_rng is not None:
        spec_cfg, chan_cfg, n_mels = augment
        k_spec, k_chan = jax.random.split(jax.random.fold_in(dropout_rng, 7), 2)
        if chan_cfg is not None:
            from ssd_tpu.data.augment import channel_dropout_jax

            B, T, F = emg.shape
            emg = channel_dropout_jax(
                emg.reshape(B, T, F // n_mels, n_mels), chan_cfg, k_chan
            ).reshape(B, T, F)
        if spec_cfg is not None:
            from ssd_tpu.data.augment import spec_augment_jax

            emg = spec_augment_jax(emg, emg_lengths, spec_cfg, k_spec)

    variables = {"params": params, "batch_stats": batch_stats}
    kwargs = dict(mutable=["batch_stats"]) if train else dict(mutable=False)
    rngs = {"dropout": dropout_rng} if train else None
    out = model.apply(
        variables, emg, emg_lengths, train=train, rngs=rngs, **kwargs
    )
    if train:
        (log_probs, out_lengths, student), updates = out
        new_batch_stats = updates.get("batch_stats", batch_stats)
    else:
        log_probs, out_lengths, student = out
        new_batch_stats = batch_stats

    w = batch["weight"]
    w_sum = jnp.maximum(jnp.sum(w), 1.0)

    per_sample = ctc_loss(
        log_probs, out_lengths, batch["tokens"], batch["token_lengths"], blank_id
    )
    denom = jnp.maximum(batch["token_lengths"], 1).astype(jnp.float32)
    ctc = jnp.sum(w * per_sample / denom) / w_sum

    if "teacher" in batch:
        # zero-weight (mesh padding) rows already have valid length 0
        distill = distillation_mse(
            student,
            jnp.where(w > 0, out_lengths, 0),
            batch["teacher"],
            batch["teacher_lengths"],
            normalize=normalize_distill,
        )
    else:
        distill = jnp.zeros((), jnp.float32)

    total = lambdas[0] * ctc + lambdas[1] * distill
    losses = {"total": total, "ctc": ctc, "distill": distill}
    return total, (losses, new_batch_stats)


def make_train_step(model, tx, blank_id, normalize_distill, augment=None,
                    featurize=None):
    """``augment=(spec_cfg, chan_cfg, n_mels)`` moves SpecAugment/channel
    dropout onto the device inside the jitted step (PRNG-keyed); None keeps
    the host-side loader augmentation (reference semantics).
    ``featurize=(FeaturizerConfig, fused)`` consumes RAW-EMG batches and
    log-mels them on device (``data.train_from_raw``)."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, lambdas, dropout_rng):
        rng = jax.random.fold_in(dropout_rng, state.step)
        grad_fn = jax.value_and_grad(
            lambda p: _losses(
                model, p, state.batch_stats, batch, lambdas, blank_id,
                normalize_distill, True, rng, augment, featurize,
            ),
            has_aux=True,
        )
        (_, (losses, new_batch_stats)), grads = grad_fn(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        return new_state, losses

    return train_step


def make_flush_step(tx):
    """Zero-gradient micro-step: flushes a partial gradient accumulation.

    The reference performs a final optimizer step for leftover gradients when
    ``len(loader) % grad_accum != 0`` (reference train.py:264-266). With
    optax.MultiSteps the equivalent is topping the accumulation window up
    with zero-gradient micro-steps: MultiSteps keeps an incremental mean, so
    j real + (k−j) zero micro-steps update with (Σ grads)/k — exactly the
    reference's 1/k-scaled leftover update. No forward pass runs, so batch
    statistics are untouched.
    """

    @functools.partial(jax.jit, donate_argnums=(0,))
    def flush_step(state: TrainState):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        updates, new_opt_state = tx.update(zeros, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(
            params=new_params, opt_state=new_opt_state, step=state.step + 1
        )

    return flush_step


def flush_partial_accumulation(state: TrainState, flush_step, grad_accum: int):
    """Apply the end-of-epoch leftover-gradient update (if any)."""
    if grad_accum <= 1:
        return state
    mini = int(jax.device_get(state.opt_state.mini_step))
    for _ in range((grad_accum - mini) % grad_accum):
        state = flush_step(state)
    return state


def make_eval_step(model, blank_id, normalize_distill, featurize=None):
    @jax.jit
    def eval_step(state: TrainState, batch, lambdas):
        _, (losses, _) = _losses(
            model, state.params, state.batch_stats, batch, lambdas, blank_id,
            normalize_distill, False, None, None, featurize,
        )
        return losses

    return eval_step


# --------------------------------------------------------------------------
# Epochs
# --------------------------------------------------------------------------


class PreemptionGuard:
    """SIGTERM/SIGINT → checkpoint-and-stop instead of dying mid-step.

    Production trainers get preempted (spot/maintenance events deliver
    SIGTERM); the guard turns the signal into a flag that the epoch loop
    polls at step granularity, so the run saves a resumable ``last``
    checkpoint and exits 0. Installed only in the main thread (Python
    restricts signal handlers to it); a second signal while stopping falls
    through to the previous handler semantics on exit.
    """

    def __init__(self, signals=(signal.SIGTERM, signal.SIGINT)) -> None:
        self.requested = False
        self._signals = signals
        self._old: Dict[int, Any] = {}

    def _handler(self, signum, frame) -> None:  # pragma: no cover - signal path
        self.requested = True
        logger.warning(
            "Signal %d received: checkpointing and stopping at the next step",
            signum,
        )

    def __enter__(self) -> "PreemptionGuard":
        if threading.current_thread() is threading.main_thread():
            for s in self._signals:
                try:
                    self._old[s] = signal.signal(s, self._handler)
                except (ValueError, OSError):  # pragma: no cover - exotic envs
                    pass
        return self

    def __exit__(self, *exc) -> bool:
        for s, h in self._old.items():
            try:
                signal.signal(s, h)
            except (ValueError, OSError):  # pragma: no cover
                pass
        return False


# multi-process: how many batches between global stop-flag agreements (each
# agreement is a tiny cross-process allgather — cheap, but a host sync)
_PREEMPT_SYNC_EVERY = 32


def _stop_requested_globally(guard: Optional["PreemptionGuard"]) -> bool:
    """True iff ANY process wants to stop — every process gets the same answer.

    A preemption SIGTERM reaches processes at different times (or only some
    of them). A process that stopped unilaterally would leave the others
    blocked in the next step's gradient psum forever, so the break decision
    must be collective: max over all processes' local flags.
    """
    if guard is None:
        return False
    if jax.process_count() == 1:
        return guard.requested
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(np.int32(guard.requested))
    return bool(np.max(flags) > 0)


def run_train_epoch(
    train_step,
    state: TrainState,
    loader: DataLoader,
    mesh,
    lambdas: np.ndarray,
    dropout_rng,
    include_teacher: bool,
    writer,
    log_interval: int,
    schedule,
    grad_accum: int,
    stop_flag: Optional[PreemptionGuard] = None,
    microbatches: int = 1,
) -> Tuple[TrainState, Dict[str, float]]:
    # local row divisor: this process's slice of the data axis (× the
    # pipeline microbatch count — each data shard must split into M equal
    # microbatches inside the pipelined step)
    n_data = max(1, mesh.shape["data"] // jax.process_count()) * max(1, microbatches)
    lam = jnp.asarray(lambdas, jnp.float32)
    last_losses = None
    n_batches = 0
    n_utterances = 0
    host_step = 0
    epoch_start = time.time()
    single_process = jax.process_count() == 1
    for batch in prefetch(loader):
        # single process: poll the local flag every batch (free). Multi
        # process: agree globally every _PREEMPT_SYNC_EVERY batches — all
        # processes run identical batch counts (loader contract), so the
        # allgather is collective-consistent and everyone breaks together.
        if stop_flag is not None:
            if single_process:
                if stop_flag.requested:
                    break
            elif n_batches % _PREEMPT_SYNC_EVERY == 0 and _stop_requested_globally(
                stop_flag
            ):
                break
        arrays = batch_to_arrays(batch, include_teacher)
        arrays, _ = pad_batch_to_multiple(arrays, n_data)
        arrays["weight"][batch.size :] = 0.0
        device_batch = shard_batch(mesh, arrays)
        state, losses = train_step(state, device_batch, lam, dropout_rng)
        last_losses = losses
        n_batches += 1
        n_utterances += batch.size
        host_step += 1  # host-side counter: no device sync in the hot loop
        # float(...) below is a device sync; gated strictly behind
        # log_interval so the steady-state loop stays async-dispatched
        if writer is not None and host_step % (log_interval * grad_accum) == 0:
            update = host_step // grad_accum
            writer.add_scalar("train/total_loss", float(losses["total"]), update)
            writer.add_scalar("train/ctc_loss", float(losses["ctc"]), update)
            writer.add_scalar("train/distill_loss", float(losses["distill"]), update)
            writer.add_scalar("train/lr", float(schedule(update)), update)
    final = {k: float(v) for k, v in (last_losses or {}).items()}
    # the float() above is a device→host readback, a true completion fence
    wall = max(time.time() - epoch_start, 1e-9)
    final["batches"] = n_batches
    final["utterances_per_sec_per_chip"] = n_utterances / wall / max(mesh.size, 1)
    return state, final


def run_eval_epoch(
    eval_step, state: TrainState, loader: DataLoader, mesh, lambdas,
    include_teacher, microbatches: int = 1,
) -> Dict[str, float]:
    n_data = max(1, mesh.shape["data"] // jax.process_count()) * max(1, microbatches)
    lam = jnp.asarray(lambdas, jnp.float32)
    totals, ctcs, distills = [], [], []
    for batch in prefetch(loader):
        arrays = batch_to_arrays(batch, include_teacher)
        arrays, _ = pad_batch_to_multiple(arrays, n_data)
        arrays["weight"][batch.size :] = 0.0
        losses = eval_step(state, shard_batch(mesh, arrays), lam)
        totals.append(float(losses["total"]))
        ctcs.append(float(losses["ctc"]))
        distills.append(float(losses["distill"]))
    return {
        "total": float(np.mean(totals)) if totals else 0.0,
        "ctc": float(np.mean(ctcs)) if ctcs else 0.0,
        "distill": float(np.mean(distills)) if distills else 0.0,
    }


# --------------------------------------------------------------------------
# Main
# --------------------------------------------------------------------------


def _augment_cfgs(cfg: Dict[str, Any]):
    spec_cfg = None
    spec = cfg.get("augmentation", {}).get("specaugment")
    if spec and spec.get("p", 0) > 0:
        spec_cfg = SpecAugmentConfig(
            time_masks=spec.get("time_masks", 2),
            time_mask_width=spec.get("time_mask_width", 0.05),
            freq_masks=spec.get("freq_masks", 2),
            freq_mask_width=spec.get("freq_mask_width", 8),
            p=spec.get("p", 0.0),
        )
    chan_cfg = None
    chan = cfg.get("augmentation", {}).get("channel_dropout")
    if chan and chan.get("p", 0) > 0:
        chan_cfg = ChannelDropoutConfig(
            p=chan.get("p", 0.0), max_channels=chan.get("max_channels", 1)
        )
    return spec_cfg, chan_cfg


def init_state(model: SSDModel, tx, input_dim: int, rng) -> TrainState:
    dummy = jnp.zeros((1, 256, input_dim), jnp.float32)
    variables = model.init(rng, dummy, jnp.array([256]), train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def train_from_config(
    cfg: Dict[str, Any],
    run_dir: Path,
    init_checkpoint: Optional[Path] = None,
    dry_run: bool = False,
    overfit_batches: int = 0,
    writer=None,
    resume: bool = False,
) -> Dict[str, Any]:
    """Programmatic entry; returns summary (best epoch/val).

    ``resume=True`` continues a run mid-training from ``<run_dir>/last``
    (params + optimizer state + epoch counter) — an opt-in extension beyond
    the reference, which always restarts at epoch 1 (docs/PARITY.md);
    best-checkpoint tracking restarts from the resume point.
    """
    ckpt_writer = None  # created once run config validates; finalized in finally
    if cfg["model"]["encoder"].get("quantize") == "int8_prequant":
        # fail before data loading: the prequant tree holds int8 kernels
        # (quantize: int8 trains float — its forward gates on train=False)
        raise ValueError(
            "model.encoder.quantize: int8_prequant is inference-only; "
            "train with quantize: none (or int8, which trains float)"
        )
    rng = set_seed(cfg["logging"].get("seed", 42))
    vocab = Vocab.from_json(Path(cfg["data"]["vocab"]))
    spec_cfg, chan_cfg = _augment_cfgs(cfg)
    # `data.train_from_raw: true` feeds the ORIGINAL (samples, channels) EMG
    # and log-mels ON DEVICE inside the step (fused Pallas on TPU) — ~8×
    # fewer host/transfer bytes than cached features; augmentation moves on
    # device automatically (host augments need the feature layout)
    train_from_raw = bool(cfg["data"].get("train_from_raw", False))
    # `augmentation.on_device: true` fuses SpecAugment/channel-dropout into
    # the jitted step (PRNG-keyed) instead of the host loader
    on_device_augment = train_from_raw or bool(
        cfg.get("augmentation", {}).get("on_device", False)
    )
    loader_spec_cfg, loader_chan_cfg = (
        (None, None) if on_device_augment else (spec_cfg, chan_cfg)
    )
    featurize = None
    if train_from_raw:
        from ssd_tpu.ops.featurizer import FeaturizerConfig
        from ssd_tpu.utils.platform import is_tpu_backend

        femg = cfg.get("features", {}).get("emg", {}) or {}
        feat_cfg = FeaturizerConfig(
            sample_rate=int(femg.get("sample_rate", 1000)),
            n_fft=int(femg.get("n_fft", 320)),
            hop_length=int(femg.get("hop_length", 10)),
            n_mels=int(femg.get("n_mels", 80)),
            normalize=femg.get("normalize", "per_file"),
        )
        featurize = (feat_cfg, is_tpu_backend())

    include_teacher = bool(cfg["data"].get("include_teacher", True))
    teacher_strict = bool(cfg["data"].get("teacher_strict", True))

    train_limit = val_limit = None
    shuffle_train = True
    if overfit_batches > 0:
        train_limit = val_limit = overfit_batches * cfg["optim"]["batch_size"]
        shuffle_train = False
        logger.info("Overfitting on %d batches (~%d items)", overfit_batches, train_limit)

    seed = cfg["logging"].get("seed", 42)
    # data.teacher_dtype / data.emg_dtype: bfloat16 halves the host-copy and
    # host→device bytes of the respective arrays. Teacher: the distill loss
    # upcasts to fp32. EMG features: only sound when the encoder computes in
    # bf16 anyway (the first op would cast identically); rejected otherwise.
    def _transfer_dtype(key: str):
        name = str(cfg["data"].get(key, "float32"))
        if name == "bfloat16":
            import ml_dtypes

            return ml_dtypes.bfloat16
        if name == "float32":
            return np.float32
        raise ValueError(f"data.{key} must be float32|bfloat16, got {name}")

    teacher_dtype = _transfer_dtype("teacher_dtype")
    emg_dtype = _transfer_dtype("emg_dtype")
    if emg_dtype != np.float32:
        if cfg["model"]["encoder"].get("compute_dtype", "float32") != "bfloat16":
            raise ValueError(
                "data.emg_dtype: bfloat16 requires model.encoder.compute_dtype: "
                "bfloat16 (otherwise it silently changes training numerics)"
            )

    common = dict(
        index_path=Path(cfg["data"]["index"]),
        features_root=Path(cfg["data"]["features_root"]),
        vocab=vocab,
        include_teacher=include_teacher,
        strict=teacher_strict,
        raw=train_from_raw,
        raw_hop_length=(featurize[0].hop_length if featurize else 10),
        teacher_dtype=teacher_dtype,
        emg_dtype=emg_dtype,
        # Collate worker processes (the torch DataLoader num_workers
        # analog, reference train.py:396). Reference key: optim.num_workers;
        # data.num_workers overrides. 0 = in-process + prefetch thread.
        # Batches are bit-identical either way (per-batch derived
        # augmentation RNG).
        num_workers=int(
            cfg["data"].get("num_workers", cfg["optim"].get("num_workers", 0))
        ),
    )
    train_loader = make_dataloader(
        splits=cfg["data"]["train_splits"],
        subsets=cfg["data"].get("train_subsets"),
        batch_size=cfg["optim"]["batch_size"],
        shuffle=shuffle_train,
        seed=seed,
        spec_augment_cfg=loader_spec_cfg,
        channel_dropout_cfg=loader_chan_cfg,
        max_items=train_limit,
        # multi-host: each process loads its own shard of every epoch
        num_shards=jax.process_count(),
        shard_index=jax.process_index(),
        **common,
    )
    val_loader = make_dataloader(
        splits=cfg["data"]["val_splits"],
        subsets=cfg["data"].get("val_subsets"),
        batch_size=max(1, cfg["optim"]["batch_size"] // 2),
        shuffle=False,
        seed=seed,
        max_items=val_limit,
        num_shards=jax.process_count(),
        shard_index=jax.process_index(),
        **common,
    )
    try:
        logger.info(
            "Train batches: %d | Val batches: %d | batch %d | accum %d",
            len(train_loader),
            len(val_loader),
            cfg["optim"]["batch_size"],
            cfg["optim"].get("grad_accum", 1),
        )

        # infer input dim from the first cached feature (reference: first batch);
        # raw mode: channels from the first raw file × configured n_mels
        if len(train_loader.dataset) == 0:
            raise ValueError("Empty training dataset after filtering.")
        first = train_loader.dataset.get(0)
        if train_from_raw:
            input_dim = first["emg"].shape[1] * featurize[0].n_mels
        else:
            input_dim = first["emg"].shape[1]

        # stamp the inferred input dim into the config that gets embedded next to
        # checkpoints: eval re-infers it like the reference, but serving needs a
        # self-describing checkpoint (engine featurizes raw EMG, no cache to probe)
        cfg.setdefault("model", {}).setdefault("encoder", {})["input_dim"] = int(input_dim)

        grad_accum = int(cfg["optim"].get("grad_accum", 1))
        max_epochs = 1 if dry_run else int(cfg["optim"].get("max_epochs", 1))
        updates_per_epoch = max(1, math.ceil(len(train_loader) / grad_accum))
        total_updates = max_epochs * updates_per_epoch

        mesh = mesh_from_config(cfg)
        model_par = mesh.shape["model"]
        # GPipe pipeline parallelism: parallel.pipeline_microbatches > 0
        # repurposes the `model` axis as pipeline stages (parallel/pipeline.py)
        pp_micro = int((cfg.get("parallel") or {}).get("pipeline_microbatches", 0))
        if pp_micro > 0:
            cfg["model"]["encoder"]["pipeline_microbatches"] = pp_micro
        pp_micro = int(cfg["model"]["encoder"].get("pipeline_microbatches", 0))
        pipeline = pp_micro > 0
        if model_par > 1 and not pipeline and not check_tp_divisibility(
            cfg["model"], model_par
        ):
            raise ValueError(
                f"parallel.model={model_par} must divide ffn_dim and num_heads "
                f"({cfg['model']['encoder']['ffn_dim']}, {cfg['model']['encoder']['num_heads']})"
            )
        # FSDP (ZeRO-style): shard params/moments/accumulated grads over `data`
        # too — per-chip state memory scales down with the data degree
        fsdp = bool((cfg.get("parallel") or {}).get("fsdp", False))
        # Sequence parallelism (Megatron-SP): activation sharding constraints
        # in the encoder shard the per-position regions on T over `model`.
        # Written into the model config so the checkpoint records it; the
        # constraints are no-ops outside a model-parallel mesh (conformer._sp)
        seq_par = bool((cfg.get("parallel") or {}).get("sequence", False))
        if seq_par:
            if model_par <= 1:
                logger.warning(
                    "parallel.sequence=true has no effect with parallel.model=1"
                )
            cfg["model"]["encoder"]["sequence_parallel"] = True
        logger.info(
            "Mesh: %s over %d device(s)%s%s%s",
            dict(mesh.shape), mesh.size, " (fsdp)" if fsdp else "",
            " (seq-parallel)" if seq_par and model_par > 1 else "",
            f" (pipeline ×{model_par}, {pp_micro} microbatches)"
            if pipeline and model_par > 1 else "",
        )

        model = build_model(cfg, input_dim=input_dim, vocab_size=vocab.size)
        tx, schedule = build_optimizer(cfg, total_updates)
        init_rng, _ = jax.random.split(rng)
        state = init_state(model, tx, input_dim, init_rng)
        # dropout uses the hardware RBG generator: threefry mask generation costs
        # ~15 ms/step at production shapes vs ~2 ms for rbg (measured on v5e)
        seed = int(cfg["logging"].get("seed", 42))
        dropout_rng = jax.random.key(seed + 1, impl="rbg")

        if init_checkpoint is not None:
            logger.info("Warm start from %s", init_checkpoint)
            payload = load_checkpoint(Path(init_checkpoint))
            state = state.replace(
                params=load_params_partial(state.params, payload["params"]),
                batch_stats=load_params_partial(state.batch_stats, payload["batch_stats"]),
            )

        start_epoch = 1
        if resume and (run_dir / "last").exists():
            # topology-checked restore: the abstract target mirrors the save
            # payload (train state + epoch/step counters)
            abstract = jax.tree_util.tree_map(
                # read shape/dtype from the leaf directly — np.asarray on device
                # arrays would copy the whole train state to host just for dtypes
                lambda x: jax.ShapeDtypeStruct(
                    np.shape(x), getattr(x, "dtype", None) or np.asarray(x).dtype
                ),
                {
                    "params": state.params,
                    "batch_stats": state.batch_stats,
                    "opt_state": state.opt_state,
                    "epoch": np.asarray(0),
                    "step": np.asarray(state.step),
                },
            )
            restored = load_checkpoint(run_dir / "last", target=abstract)
            state = state.replace(
                params=restored["params"],
                batch_stats=restored["batch_stats"],
                opt_state=restored["opt_state"],
                step=jnp.asarray(restored["step"]),
            )
            start_epoch = int(restored["epoch"]) + 1
            train_loader.epoch = start_epoch - 1  # keep per-epoch shuffles distinct
            logger.info("Resuming %s at epoch %d", run_dir, start_epoch)

        # place the whole TrainState per the partition rules: tensor-parallel
        # shards over `model` (ffn + attention heads, optimizer moments included),
        # optional FSDP shards over `data`, everything else replicated — same
        # rules the driver dryrun exercises
        state = shard_state(mesh, state, fsdp=fsdp, pipeline=pipeline)

        base_weights = LossWeights(
            lambda_distill=float(cfg["loss"]["lambda_distill"]),
            lambda_ctc=float(cfg["loss"]["lambda_ctc"]),
        )
        normalize_distill = bool(cfg["loss"].get("distill_normalize", False))
        distill_warmup_epochs = int(cfg["loss"].get("distill_warmup_epochs") or 0)
        blank_id = vocab.blank_id

        augment = None
        if on_device_augment and (spec_cfg is not None or chan_cfg is not None):
            n_mels = cfg.get("features", {}).get("emg", {}).get("n_mels", 80)
            augment = (spec_cfg, chan_cfg, int(n_mels))
        train_step = make_train_step(
            model, tx, blank_id, normalize_distill, augment, featurize
        )
        eval_step = make_eval_step(model, blank_id, normalize_distill, featurize)
        flush_step = make_flush_step(tx) if grad_accum > 1 else None

        early = cfg["optim"].get("early_stopping", {}) or {}
        patience = int(early.get("patience", 0))
        min_delta = float(early.get("min_delta", 0.0))

        # logging.async_checkpoints: true overlaps orbax checkpoint IO with
        # the next epoch (CheckpointWriter docstring); default is the
        # reference's synchronous save
        ckpt_writer = CheckpointWriter(
            async_saves=bool(cfg["logging"].get("async_checkpoints", False))
        )
        best_val = float("inf")
        best_epoch = 0
        patience_counter = 0

        epoch = start_epoch - 1
        preempted = False
        with mesh, PreemptionGuard() as guard:
            for epoch in range(start_epoch, max_epochs + 1):
                warmup_scale = 1.0
                if distill_warmup_epochs > 0:
                    warmup_scale = min(1.0, epoch / float(distill_warmup_epochs))
                lambdas = np.asarray(
                    [base_weights.lambda_ctc, base_weights.lambda_distill * warmup_scale],
                    np.float32,
                )
                start = time.time()
                state, train_losses = run_train_epoch(
                    train_step,
                    state,
                    train_loader,
                    mesh,
                    lambdas,
                    dropout_rng,
                    include_teacher,
                    writer,
                    cfg["logging"].get("log_interval", 10),
                    schedule,
                    grad_accum,
                    stop_flag=guard,
                    microbatches=pp_micro if pipeline else 1,
                )
                if _stop_requested_globally(guard):
                    # Preemption: save a resumable `last` labeled with the LAST
                    # COMPLETED epoch — `--resume` re-runs the interrupted epoch
                    # (its per-epoch shuffle is deterministic). Partial-epoch
                    # optimizer updates are kept; state.step stays accurate, so
                    # the LR schedule is unaffected.
                    ckpt_writer.save(
                        run_dir,
                        {
                            "params": state.params,
                            "batch_stats": state.batch_stats,
                            "opt_state": state.opt_state,
                            "epoch": np.asarray(epoch - 1),
                            "step": np.asarray(state.step),
                        },
                        cfg,
                        is_best=False,
                        wait=True,  # preemption: the write must land before exit
                    )
                    logger.warning(
                        "Preempted during epoch %d: saved resumable 'last' "
                        "(resume with --resume; the epoch re-runs)",
                        epoch,
                    )
                    preempted = True
                    break
                if flush_step is not None:
                    state = flush_partial_accumulation(state, flush_step, grad_accum)
                train_time = time.time() - start
                val_losses = run_eval_epoch(
                    eval_step, state, val_loader, mesh, lambdas, include_teacher,
                    microbatches=pp_micro if pipeline else 1,
                )
                logger.info(
                    "Epoch %d done in %.1fs | val total %.4f (ctc %.4f, distill %.4f) | λ_ctc %.2f λ_distill %.2f",
                    epoch,
                    train_time,
                    val_losses["total"],
                    val_losses["ctc"],
                    val_losses["distill"],
                    lambdas[0],
                    lambdas[1],
                )
                if writer is not None:
                    writer.add_scalar("val/total_loss", val_losses["total"], epoch)
                    writer.add_scalar("val/ctc_loss", val_losses["ctc"], epoch)
                    writer.add_scalar("val/distill_loss", val_losses["distill"], epoch)
                    writer.add_scalar("train/lambda_ctc", float(lambdas[0]), epoch)
                    writer.add_scalar("train/lambda_distill", float(lambdas[1]), epoch)

                is_best = val_losses["total"] < (best_val - min_delta)
                if is_best:
                    best_val = val_losses["total"]
                    best_epoch = epoch
                    patience_counter = 0
                else:
                    patience_counter += 1

                ckpt_writer.save(
                    run_dir,
                    {
                        "params": state.params,
                        "batch_stats": state.batch_stats,
                        # optimizer state saved for payload parity with the
                        # reference (train.py:151-160); like the reference, warm
                        # starts restore weights only
                        "opt_state": state.opt_state,
                        "epoch": np.asarray(epoch),
                        "step": np.asarray(state.step),
                    },
                    cfg,
                    is_best=is_best,
                )

                if dry_run:
                    break
                if patience and patience_counter >= patience:
                    logger.info(
                        "Early stopping at epoch %d (best %d, val %.4f)",
                        epoch,
                        best_epoch,
                        best_val,
                    )
                    break

        return {
            "best_epoch": best_epoch,
            "best_val": best_val,
            "epochs": epoch,
            "preempted": preempted,
        }
    finally:
        # reap data.num_workers worker processes even when training
        # raises (checkpoint IO errors, preemption, non-finite loss)
        train_loader.close()
        val_loader.close()
        if ckpt_writer is not None:
            ckpt_writer.finalize()  # async saves must land before return


def _parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description="Train the EMG-to-text model on TPU.")
    p.add_argument("--config", type=Path, required=True)
    p.add_argument("--run-dir", type=Path)
    p.add_argument("--init-checkpoint", type=Path)
    p.add_argument("--dry-run", action="store_true")
    p.add_argument("--overfit-batches", type=int, default=0)
    p.add_argument(
        "--resume",
        action="store_true",
        help="Continue mid-run from <run-dir>/last (params + optimizer state "
        "+ epoch); an opt-in extension beyond the reference's restart-only "
        "warm starts.",
    )
    p.add_argument(
        "--profile-dir",
        type=Path,
        help="Capture a jax.profiler trace of the first epoch into this dir.",
    )
    p.add_argument(
        "--compile-cache",
        type=Path,
        help="Persistent XLA compilation cache dir (default: env "
        "SSD_COMPILE_CACHE) — preemption restarts skip recompiles.",
    )
    return p.parse_args()


def main() -> None:
    from ssd_tpu.utils.config import setup_cli_logging

    setup_cli_logging()
    args = _parse_args()
    from ssd_tpu.parallel.mesh import maybe_initialize_distributed
    from ssd_tpu.utils.config import load_config

    maybe_initialize_distributed()
    from ssd_tpu.utils.platform import enable_compile_cache

    enable_compile_cache(str(args.compile_cache) if args.compile_cache else None)

    cfg = load_config(args.config)
    run_name = cfg["logging"].get("run_name", "run")
    run_dir = args.run_dir or Path("results/checkpoints") / run_name

    from tensorboardX import SummaryWriter

    writer = SummaryWriter(log_dir=str(run_dir / "tb"))
    if args.profile_dir:
        jax.profiler.start_trace(str(args.profile_dir))
    try:
        train_from_config(
            cfg,
            run_dir,
            init_checkpoint=args.init_checkpoint,
            dry_run=args.dry_run,
            overfit_batches=args.overfit_batches,
            resume=args.resume,
            writer=writer,
        )
    finally:
        if args.profile_dir:
            jax.profiler.stop_trace()
        writer.close()


if __name__ == "__main__":
    main()
