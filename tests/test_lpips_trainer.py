"""LPIPS trainer / 2AFC / JND machinery tests.

2AFC & JND scorers are checked against the reference implementations
(`trainer.py:206-279`, fed identical precomputed distances); the head
trainer is checked to (a) decrease the ranking loss, (b) keep head
weights non-negative (the reference clamp), (c) leave the trunk frozen.
"""
import importlib
import sys

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from cdfo_tpu.metrics.lpips import LPIPS
from cdfo_tpu.metrics.lpips_train import (LPIPSHeadTrainer, score_2afc,
                                          score_jnd, voc_ap)


def test_2afc_matches_reference_formula(rng):
    d0s = rng.rand(64)
    d1s = rng.rand(64)
    d1s[:8] = d0s[:8]  # exercise the tie branch
    gts = rng.rand(64)
    ours, detail = score_2afc(d0s, d1s, gts)
    ref_scores = (d0s < d1s) * (1 - gts) + (d1s < d0s) * gts \
        + (d1s == d0s) * 0.5
    np.testing.assert_allclose(ours, ref_scores.mean())
    np.testing.assert_allclose(detail["scores"], ref_scores)


def test_jnd_matches_reference_formula(rng):
    ds = rng.rand(128)
    sames = (rng.rand(128) < 0.4).astype(np.float64)
    ours, _ = score_jnd(ds, sames)
    # independent re-derivation (`trainer.py:262-276`)
    order = np.argsort(ds)
    ss = sames[order]
    tps = np.cumsum(ss)
    fps = np.cumsum(1 - ss)
    fns = ss.sum() - tps
    ref = voc_ap(tps / (tps + fns), tps / (tps + fps))
    np.testing.assert_allclose(ours, ref)


def test_head_trainer_learns_and_clamps(rng):
    model = LPIPS(net="alex")
    x = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1)
    params = model.init(jax.random.PRNGKey(0), x, x)
    trainer = LPIPSHeadTrainer(model, params, lr=1e-3)

    ref = rng.rand(4, 32, 32, 3).astype(np.float32) * 2 - 1
    p0 = np.clip(ref + rng.randn(*ref.shape).astype(np.float32) * 0.02, -1, 1)
    p1 = np.clip(ref + rng.randn(*ref.shape).astype(np.float32) * 0.4, -1, 1)
    judge = -np.ones((4,), np.float32)  # humans prefer p0 (less distorted)

    losses = [trainer.train_step(ref, p0, p1, judge) for _ in range(12)]
    assert losses[-1] < losses[0]
    for leaf in jax.tree.leaves(trainer.trainable["heads"]):
        assert float(jnp.min(leaf)) >= 0.0
    # trunk untouched
    t0 = jax.tree.leaves(params["params"]["net"])[0]
    t1 = jax.tree.leaves(trainer.current_params()["params"]["net"])[0]
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
