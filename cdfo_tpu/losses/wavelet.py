"""Multi-wavelet contrastive perceptual losses
(reference `opt/loss.py:59-241`).

Haar DWT (J=1, reflect padding — the pytorch_wavelets DWTForward the
reference uses at `:145`) splits SR/HR/bicubic-LR into high bands
(HH/HL/LH, rescaled x0.5+0.5) + low band; LPIPS(vgg) distances form
positives vs HR bands and negatives vs LR bands (incl. ``neg`` batch
shuffles), combined as pos/(neg + 3e-7) (`:231-241`).

Needs an LPIPS apply function: ``lpips_fn(a, b) -> (B,) distances`` with
NHWC [0,1]-ish inputs (see :mod:`cdfo_tpu.metrics.lpips`). Single-channel
inputs are tiled to 3 channels for the trunk.
"""
from __future__ import annotations

from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp

from .losses import charbonnier_loss


def haar_dwt(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """J=1 Haar DWT of NHWC x (even dims; reflect pad for odd).

    Returns (LL, LH, HL, HH) at half resolution, pytorch_wavelets
    normalisation (orthonormal: /2 total per 2x2 block).
    """
    if x.shape[1] % 2 == 1:
        x = jnp.concatenate([x, x[:, -2:-1]], axis=1)
    if x.shape[2] % 2 == 1:
        x = jnp.concatenate([x, x[:, :, -2:-1]], axis=2)
    a = x[:, 0::2, 0::2]
    b = x[:, 0::2, 1::2]
    c = x[:, 1::2, 0::2]
    d = x[:, 1::2, 1::2]
    ll = (a + b + c + d) * 0.5
    lh = (-a - b + c + d) * 0.5   # vertical detail (pywt 'LH' = rows high)
    hl = (-a + b - c + d) * 0.5   # horizontal detail
    hh = (a - b - c + d) * 0.5
    return ll, lh, hl, hh


def wave_decompose(x: jnp.ndarray, norm: bool = True):
    ll, lh, hl, hh = haar_dwt(x)
    if norm:
        lh, hl, hh = lh * 0.5 + 0.5, hl * 0.5 + 0.5, hh * 0.5 + 0.5
    return [hh, hl, lh], [ll]


def multiwave_contrastive_loss(sr, lr_up, hr, lpips_fn: Callable,
                               neg: int = 3, rng=None) -> jnp.ndarray:
    """sr/lr_up/hr: (B, H, W, C) center frames. ``rng`` drives the shuffled
    negatives (the reference uses python random at each call)."""
    def to3(t):
        return jnp.tile(t, (1, 1, 1, 3)) if t.shape[-1] == 1 else t

    sr_h, sr_l = wave_decompose(sr)
    hr_h, hr_l = wave_decompose(hr)
    lr_h, lr_l = wave_decompose(lr_up)
    sr_h.append(sr)
    hr_h.append(hr)
    lr_h.append(lr_up)
    l_list = hr_l + lr_l

    def mean_lpips(a, b):
        return jnp.mean(lpips_fn(to3(a), to3(b)))

    pos1 = sum(mean_lpips(a, b) for a, b in zip(sr_h, hr_h)) / len(hr_h)
    pos2 = sum(mean_lpips(sr_l[0], t) for t in l_list) / len(l_list)

    bsz = sr.shape[0]
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    def neg_term():
        total = 0.0
        r = rng
        for a, b in zip(sr_h, lr_h):
            total = total + mean_lpips(a, b)
            for _ in range(neg):
                r, sub = jax.random.split(r)
                perm = jax.random.permutation(sub, bsz)
                total = total + mean_lpips(a[perm], b[perm])
        return total / ((neg + 1) * len(lr_h))

    n = neg_term()
    # reference computes pos/neg under no_grad (`:177-181`) then combines;
    # gradients flow only through the combination — reproduce with
    # stop_gradient for exactness
    pos1 = jax.lax.stop_gradient(pos1)
    pos2 = jax.lax.stop_gradient(pos2)
    n = jax.lax.stop_gradient(n)
    return pos1 / (n + 3e-7) + pos2 / (n + 3e-7)


def charbonnier_fcl_loss(sr, hr, lr_up, lpips_fn, rng=None):
    """Charbonnier(sum) + multiwave contrastive (`opt/loss.py:59-71`)."""
    return charbonnier_loss(sr, hr) + multiwave_contrastive_loss(
        sr, lr_up, hr, lpips_fn, rng=rng)
