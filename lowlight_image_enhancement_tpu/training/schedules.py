"""LR schedules as optax-compatible schedule functions.

Rebuild of reference ``models/lr_scheduler.py:12-189`` + the stock-cosine
option (``base_model.py:97-101``):

- ``TrueCosineAnnealingLR``  -> cosine decay lr -> eta_min over T_max.
- ``CosineAnnealingRestartLR`` -> cosine with restart periods and
  per-cycle weights.
- ``MultiStepRestartLR`` -> step decay (gamma at milestones) with restarts.
- ``LinearLR`` -> linear decay to 0 over total_iter.
- ``VibrateLR`` -> the reference's piecewise-triangular schedule.

Plus linear warmup composition (reference ``update_learning_rate``
warmup_iter semantics).
"""

from __future__ import annotations

from typing import Any, Mapping, Optional, Sequence

import jax.numpy as jnp
import optax


def true_cosine_annealing(base_lr: float, T_max: int,
                          eta_min: float = 0.0) -> optax.Schedule:
    def schedule(step):
        t = jnp.minimum(step, T_max)
        return eta_min + 0.5 * (base_lr - eta_min) * (
            1.0 + jnp.cos(jnp.pi * t / T_max)
        )

    return schedule


def cosine_annealing_restart(
    base_lr: float,
    periods: Sequence[int],
    restart_weights: Optional[Sequence[float]] = None,
    eta_min: float = 0.0,
) -> optax.Schedule:
    restart_weights = list(restart_weights or [1.0] * len(periods))
    if len(periods) != len(restart_weights):
        raise ValueError("periods and restart_weights must match")
    starts = [0]
    for p in periods[:-1]:
        starts.append(starts[-1] + p)
    starts_arr = jnp.asarray(starts)
    periods_arr = jnp.asarray(periods)
    weights_arr = jnp.asarray(restart_weights)

    def schedule(step):
        idx = jnp.sum(step >= starts_arr) - 1
        idx = jnp.clip(idx, 0, len(periods) - 1)
        t = step - starts_arr[idx]
        period = periods_arr[idx]
        w = weights_arr[idx]
        return eta_min + 0.5 * w * (base_lr - eta_min) * (
            1.0 + jnp.cos(jnp.pi * jnp.minimum(t, period) / period)
        )

    return schedule


def multistep_restart(
    base_lr: float,
    milestones: Sequence[int],
    gamma: float = 0.1,
    restarts: Sequence[int] = (0,),
    restart_weights: Sequence[float] = (1.0,),
) -> optax.Schedule:
    milestones_arr = jnp.asarray(sorted(milestones))
    restarts_arr = jnp.asarray(restarts)
    rw = jnp.asarray(restart_weights)

    def schedule(step):
        # weight from the most recent restart (1.0 before any)
        ridx = jnp.sum(step >= restarts_arr) - 1
        w = jnp.where(ridx >= 0, rw[jnp.clip(ridx, 0, len(restart_weights) - 1)], 1.0)
        n_decays = jnp.sum(step >= milestones_arr)
        return base_lr * w * (gamma ** n_decays)

    return schedule


def linear_decay(base_lr: float, total_iter: int) -> optax.Schedule:
    def schedule(step):
        frac = 1.0 - jnp.minimum(step, total_iter) / total_iter
        return base_lr * frac

    return schedule


def vibrate(base_lr: float, total_iter: int) -> optax.Schedule:
    """Reference ``VibrateLR``: a triangular oscillation with period
    ``total_iter/80`` whose envelope decays linearly early in training
    (0.1 - 0.25*progress) and floors at 0.01."""
    period = max(total_iter // 80, 2)
    half = max(period // 2, 1)

    def schedule(step):
        frac = step / total_iter
        envelope = jnp.maximum(0.1 - 0.25 * frac, 0.01)
        th = step % period
        tri = jnp.where(th < half, th / half, 2.0 - th / half)
        return base_lr * envelope * tri

    return schedule


def with_warmup(schedule: optax.Schedule, warmup_iter: int) -> optax.Schedule:
    """Linear warmup from 0 over ``warmup_iter`` steps, then ``schedule``
    (reference ``base_model.py:164-186``). ``warmup_iter<=0`` disables."""
    if warmup_iter is None or warmup_iter <= 0:
        return schedule

    def warmed(step):
        ramp = jnp.minimum(step / warmup_iter, 1.0)
        return schedule(step) * ramp

    return warmed


def make_schedule(opt: Mapping[str, Any], base_lr: float,
                  warmup_iter: int = -1) -> optax.Schedule:
    """Build a schedule from a reference-style config dict
    (``train.scheduler`` block: ``type`` + kwargs)."""
    opt = dict(opt)
    stype = opt.pop("type")
    if stype in ("TrueCosineAnnealingLR", "CosineAnnealingLR"):
        sched = true_cosine_annealing(
            base_lr, T_max=opt["T_max"], eta_min=opt.get("eta_min", 0.0)
        )
    elif stype == "CosineAnnealingRestartLR":
        sched = cosine_annealing_restart(
            base_lr,
            periods=opt["periods"],
            restart_weights=opt.get("restart_weights"),
            eta_min=opt.get("eta_min", 0.0),
        )
    elif stype == "MultiStepLR":
        sched = multistep_restart(
            base_lr, milestones=opt["milestones"], gamma=opt.get("gamma", 0.1)
        )
    elif stype == "MultiStepRestartLR":
        sched = multistep_restart(
            base_lr,
            milestones=opt["milestones"],
            gamma=opt.get("gamma", 0.1),
            restarts=opt.get("restarts", (0,)),
            restart_weights=opt.get("restart_weights", (1.0,)),
        )
    elif stype == "LinearLR":
        sched = linear_decay(base_lr, total_iter=opt["total_iter"])
    elif stype == "VibrateLR":
        sched = vibrate(base_lr, total_iter=opt["total_iter"])
    else:
        raise ValueError(f"unknown scheduler type {stype!r}")
    return with_warmup(sched, warmup_iter)
