"""LR schedules beyond the active MultiStepLR: restart variants from the
reference's latent distributed module (`opt/deep_learning.py:246-358`),
expressed as pure step->lr functions for optax."""
from __future__ import annotations

import math
from typing import Callable, Sequence

import jax.numpy as jnp
import numpy as np


def multi_step_restart_lr(base_lr: float, milestones: Sequence[int],
                          gamma: float = 0.1,
                          restarts: Sequence[int] = (0,),
                          restart_weights: Sequence[float] = (1.0,)) -> Callable:
    """MultiStepRestartLR (`opt/deep_learning.py:246-286`): lr decays by
    gamma at each milestone and resets to base*weight at each restart."""
    assert len(restarts) == len(restart_weights)
    milestones = sorted(milestones)
    restarts = list(restarts)

    def schedule(step):
        step = jnp.asarray(step)
        # factor from milestones since the most recent restart
        lr = jnp.full_like(jnp.asarray(step, jnp.float32), base_lr)
        last_restart = jnp.zeros_like(step)
        weight = jnp.ones_like(lr)
        for r, w in zip(restarts, restart_weights):
            hit = step >= r
            last_restart = jnp.where(hit, r, last_restart)
            weight = jnp.where(hit, w, weight)
        decays = jnp.zeros_like(step)
        for m in milestones:
            decays = decays + ((step >= m) & (m > last_restart)).astype(step.dtype)
        return base_lr * weight * (gamma ** decays)

    return schedule


def cosine_annealing_restart_lr(base_lr: float, periods: Sequence[int],
                                restart_weights: Sequence[float] = (1.0,),
                                eta_min: float = 0.0) -> Callable:
    """CosineAnnealingRestartLR (`opt/deep_learning.py:310-358`)."""
    assert len(periods) == len(restart_weights)
    cumulative = np.cumsum(periods)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        lr = jnp.zeros_like(step) + eta_min
        prev_end = 0.0
        for ci, (period, weight, end) in enumerate(
                zip(periods, restart_weights, cumulative)):
            # reference picks the right-closest period end (iteration == end
            # belongs to the *earlier* cycle — `opt/deep_learning.py:289-307`)
            lo_ok = (step >= 0) if ci == 0 else (step > prev_end)
            in_cycle = lo_ok & (step <= end)
            cyc_lr = eta_min + weight * 0.5 * (base_lr - eta_min) * (
                1 + jnp.cos(jnp.pi * ((step - prev_end) / period)))
            lr = jnp.where(in_cycle, cyc_lr, lr)
            prev_end = float(end)
        return lr

    return schedule
