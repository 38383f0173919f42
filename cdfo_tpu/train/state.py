"""Training state, optimizer, and the jittable train step.

Reference recipe (`train_LD_37.py:323-325,377`): Adam(lr=1e-4, wd=1e-5)
— torch-style *coupled* weight decay (added to the gradient before the Adam
moments, not AdamW) — MultiStepLR(milestones=[2000] epochs, gamma=0.5),
Charbonnier(sum) on the center frame.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import TrainConfig
from ..losses import charbonnier_loss
from ..metrics.psnr_ssim import psnr_jax


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state)


def make_schedule(cfg: TrainConfig, steps_per_epoch: int) -> Callable:
    """MultiStepLR over *epochs*, evaluated per step."""

    boundaries = {m * steps_per_epoch: cfg.gamma for m in cfg.milestones}
    return optax.piecewise_constant_schedule(cfg.lr, boundaries)


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int = 1):
    sched = make_schedule(cfg, steps_per_epoch)
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),   # torch-Adam coupled wd
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(sched),
    )


def create_train_state(model, cfg: TrainConfig, sample_batch,
                       steps_per_epoch: int = 1, rng=None) -> TrainState:
    rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed)
    init_rngs = {"params": rng, "gumbel": jax.random.fold_in(rng, 1)}
    params = jax.jit(model.init)(init_rngs, *_model_inputs(sample_batch))
    tx = make_optimizer(cfg, steps_per_epoch)
    opt_state = tx.init(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=opt_state, tx=tx, apply_fn=model.apply)


def _model_inputs(batch) -> Tuple:
    return (batch["lrs"], batch["mvs0"], batch["mvs1"], batch["pms"],
            batch["rms"], batch["ufs"])


def train_step(state: TrainState, batch, rng) -> Tuple[TrainState, jnp.ndarray]:
    """One optimization step. ``batch['hr']`` is the center-frame GT
    (B, 4H, 4W, 1).

    Failure containment (the reference has none — SURVEY §5): a non-finite
    loss skips the update entirely instead of corrupting params/opt-state,
    so one bad batch cannot kill a long run.
    """

    def loss_fn(params):
        sr, _ = state.apply_fn(params, *_model_inputs(batch),
                               rngs={"gumbel": rng})
        return charbonnier_loss(sr, batch["hr"])

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    new_state = state.apply_gradients(grads)
    ok = jnp.isfinite(loss)
    state = jax.tree.map(lambda n, o: jnp.where(ok, n, o), new_state, state)
    return state, loss


def eval_step(state: TrainState, batch, rng) -> jnp.ndarray:
    sr, _ = state.apply_fn(state.params, *_model_inputs(batch),
                           rngs={"gumbel": rng})
    return psnr_jax(sr, batch["hr"])
