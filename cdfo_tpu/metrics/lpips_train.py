"""LPIPS perceptual-calibration training + 2AFC / JND evaluation.

Ports the vendored richzhang trainer machinery
(`/root/reference/opt/lpips/trainer.py`, `loss.py:160-198`):

* :func:`score_2afc` / :func:`score_jnd` — dataset-level scoring
  (`trainer.py:206-279`), as pure numpy functions over precomputed
  distances (the data loaders are the caller's business);
* :class:`Dist2LogitLayer` / :class:`BCERankingLoss` — the ranking head
  used to fit the linear calibration (`loss.py:170-197`);
* :class:`LPIPSHeadTrainer` — optax Adam(beta1=0.5) over the linear heads
  + ranking net with the reference's weight clamp (`trainer.py:102-105`),
  trunk frozen (the 'lpips' training mode of `trainer.py:17-82`).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from .lpips import LPIPS


# ---------------------------------------------------------------------------
# dataset-level scoring (`trainer.py:206-279`)
# ---------------------------------------------------------------------------


def score_2afc(d0s: np.ndarray, d1s: np.ndarray,
               judges: np.ndarray) -> Tuple[float, Dict[str, np.ndarray]]:
    """Fraction of triplets where the metric agrees with human 2AFC votes.

    judges in [0, 1]: fraction of humans preferring patch p1.
    """
    d0s, d1s, gts = (np.asarray(a, np.float64).reshape(-1)
                     for a in (d0s, d1s, judges))
    scores = ((d0s < d1s) * (1.0 - gts) + (d1s < d0s) * gts
              + (d1s == d0s) * 0.5)
    return float(scores.mean()), dict(d0s=d0s, d1s=d1s, gts=gts,
                                      scores=scores)


def voc_ap(rec: np.ndarray, prec: np.ndarray) -> float:
    """PASCAL-VOC average precision (the `lpips.voc_ap` the reference's
    JND scorer calls)."""
    mrec = np.concatenate(([0.0], rec, [1.0]))
    mpre = np.concatenate(([0.0], prec, [0.0]))
    for i in range(mpre.size - 1, 0, -1):
        mpre[i - 1] = max(mpre[i - 1], mpre[i])
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))


def score_jnd(ds: np.ndarray, sames: np.ndarray) -> Tuple[float, Dict]:
    """JND mAP: area under the precision-recall curve when thresholding
    distances against human 'same' votes."""
    ds = np.asarray(ds, np.float64).reshape(-1)
    sames = np.asarray(sames, np.float64).reshape(-1)
    order = np.argsort(ds)
    sames_sorted = sames[order]
    tps = np.cumsum(sames_sorted)
    fps = np.cumsum(1 - sames_sorted)
    fns = sames_sorted.sum() - tps
    precs = tps / (tps + fps)
    recs = tps / (tps + fns)
    return voc_ap(recs, precs), dict(ds=ds, sames=sames)


# ---------------------------------------------------------------------------
# ranking head (`loss.py:170-197`)
# ---------------------------------------------------------------------------


class Dist2LogitLayer(nn.Module):
    """(d0, d1) -> probability that p1 is closer; 1x1 conv MLP on the
    5-channel stack (d0, d1, d0-d1, d0/(d1+eps), d1/(d0+eps))."""

    chn_mid: int = 32

    @nn.compact
    def __call__(self, d0, d1, eps: float = 0.1):
        x = jnp.concatenate(
            [d0, d1, d0 - d1, d0 / (d1 + eps), d1 / (d0 + eps)], axis=-1)
        x = nn.Conv(self.chn_mid, (1, 1), name="conv0")(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(self.chn_mid, (1, 1), name="conv1")(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(1, (1, 1), name="conv2")(x)
        return jax.nn.sigmoid(x)


def bce_ranking_loss(logit, judge, eps: float = 1e-7):
    """BCE of the ranking probability vs the human vote in [-1, 1]
    (`loss.py:194-197` maps judge -> (judge+1)/2)."""
    per = (judge + 1.0) / 2.0
    logit = jnp.clip(logit, eps, 1.0 - eps)
    return -jnp.mean(per * jnp.log(logit) + (1 - per) * jnp.log(1 - logit))


# ---------------------------------------------------------------------------
# head trainer
# ---------------------------------------------------------------------------


class LPIPSHeadTrainer:
    """Fits the LPIPS linear heads on 2AFC triplets, trunk frozen.

    Reference recipe: Adam(lr=1e-4, betas=(0.5, 0.999)) over heads +
    ranking net (`trainer.py:75-80`), post-step clamp of head weights to
    >= 0 (`trainer.py:102-105`).
    """

    def __init__(self, model: LPIPS, params, lr: float = 1e-4,
                 beta1: float = 0.5, seed: int = 0):
        import optax

        self.model = model
        self.rank = Dist2LogitLayer()
        d = jnp.zeros((1, 1, 1, 1))
        self.rank_params = self.rank.init(jax.random.PRNGKey(seed), d, d)
        self.params = params
        head_names = [k for k in params["params"] if k.startswith("lin")]

        self.tx = optax.adam(lr, b1=beta1, b2=0.999)
        trainable = {"heads": {k: params["params"][k] for k in head_names},
                     "rank": self.rank_params}
        self.opt_state = self.tx.init(trainable)
        self.trainable = trainable
        self._head_names = head_names

        def loss_fn(trainable, ref, p0, p1, judge):
            full = jax.tree.map(lambda a: a, self.params)
            full["params"] = dict(full["params"])
            for k in head_names:
                full["params"][k] = trainable["heads"][k]
            d0 = self.model.apply(full, ref, p0).reshape(-1, 1, 1, 1)
            d1 = self.model.apply(full, ref, p1).reshape(-1, 1, 1, 1)
            logit = self.rank.apply(trainable["rank"], d0, d1)
            return bce_ranking_loss(logit, judge.reshape(-1, 1, 1, 1))

        def step(trainable, opt_state, ref, p0, p1, judge):
            loss, grads = jax.value_and_grad(loss_fn)(
                trainable, ref, p0, p1, judge)
            updates, opt_state = self.tx.update(grads, opt_state, trainable)
            trainable = optax.apply_updates(trainable, updates)
            # reference clamp: linear-head weights stay non-negative
            trainable["heads"] = jax.tree.map(
                lambda a: jnp.maximum(a, 0.0), trainable["heads"])
            return trainable, opt_state, loss

        self._step = jax.jit(step)

    def train_step(self, ref, p0, p1, judge) -> float:
        self.trainable, self.opt_state, loss = self._step(
            self.trainable, self.opt_state, jnp.asarray(ref),
            jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(judge))
        return float(loss)

    def current_params(self):
        full = jax.tree.map(lambda a: a, self.params)
        full["params"] = dict(full["params"])
        for k in self._head_names:
            full["params"][k] = self.trainable["heads"][k]
        return full
