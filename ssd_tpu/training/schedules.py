"""Learning-rate schedules with reference parity.

Reference ``build_scheduler`` (``src/training/train.py:86-135``) supports
``cosine`` (torch CosineAnnealingLR), ``linear`` (warmup → linear decay via
LambdaLR) and ``warmup_hold``. These are reproduced as optax schedules over
the *update* count (the reference steps its scheduler once per optimizer
update, so gradient accumulation advances the schedule once per accumulated
step — optax.MultiSteps gives the same semantics).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import optax


def build_schedule(cfg: Dict[str, Any], base_lr: float, total_updates: int) -> optax.Schedule:
    """Schedule factory over the reference's ``optim.scheduler`` block."""
    sched_cfg = cfg.get("optim", {}).get("scheduler")
    if not sched_cfg:
        return optax.constant_schedule(base_lr)

    if isinstance(sched_cfg, str):
        name, params = sched_cfg, {}
    else:
        params = dict(sched_cfg)
        name = params.get("name", params.get("type", ""))
    name = str(name).lower()
    total_updates = max(1, total_updates)

    if name in {"cosine", "cosineannealing", "cosine_annealing"}:
        t_max = int(params.get("t_max", total_updates))
        eta_min = float(params.get("eta_min", 0.0))

        def cosine(step):
            frac = jnp.minimum(step, t_max) / t_max
            return eta_min + (base_lr - eta_min) * 0.5 * (1 + jnp.cos(jnp.pi * frac))

        return cosine

    if name in {"linear", "linear_warmup", "warmup"}:
        warmup = int(params.get("warmup_steps", 0))
        decay = int(params.get("total_steps", total_updates))

        def linear(step):
            wf = (step + 1) / max(1, warmup)
            progress = (step - warmup) / max(1, decay - warmup)
            factor = jnp.where(step < warmup, wf, jnp.maximum(0.0, 1.0 - progress))
            return base_lr * factor

        return linear

    if name in {"warmup_hold", "warmup_constant", "warmup_const"}:
        warmup = int(params.get("warmup_steps", 0))

        def warmup_hold(step):
            if warmup <= 0:
                return jnp.asarray(base_lr)
            factor = jnp.minimum((step + 1) / warmup, 1.0)
            return base_lr * factor

        return warmup_hold

    raise ValueError(f"Unknown scheduler {name!r}")


def build_optimizer(
    cfg: Dict[str, Any], total_updates: int
) -> tuple[optax.GradientTransformation, optax.Schedule]:
    """AdamW + clip + schedule + grad accumulation (reference semantics)."""
    optim_cfg = cfg["optim"]
    lr = float(optim_cfg["lr"])
    weight_decay = float(optim_cfg.get("weight_decay", 0.0))
    clip = float(optim_cfg.get("clip_grad_norm", 0.0))
    grad_accum = int(optim_cfg.get("grad_accum", 1))

    schedule = build_schedule(cfg, lr, total_updates)
    chain = []
    if clip > 0:
        chain.append(optax.clip_by_global_norm(clip))
    chain.append(
        optax.adamw(
            learning_rate=schedule,
            b1=0.9,
            b2=0.999,
            eps=1e-8,
            weight_decay=weight_decay,
        )
    )
    tx: optax.GradientTransformation = optax.chain(*chain)
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    return tx, schedule
