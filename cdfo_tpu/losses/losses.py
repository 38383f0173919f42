"""Training losses (reference `opt/loss.py`).

The active training loss is Charbonnier with **sum** reduction and eps=1e-4
added *inside* the sqrt (`opt/loss.py:20-31`, used `train_LD_37.py:377`).
"""
from __future__ import annotations

import jax.numpy as jnp


def charbonnier_loss(x: jnp.ndarray, y: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """sum(sqrt((x-y)^2 + eps)) — note eps is not squared (`opt/loss.py:24`)."""
    diff = x - y
    return jnp.sum(jnp.sqrt(diff * diff + eps))


def charbonnier_loss_masked(x, y, mask, eps: float = 1e-4):
    """CharbonnierLoss_g (`opt/loss.py:245-254`): masked charbonnier."""
    diff = (x - y) * mask
    return jnp.sum(jnp.sqrt(diff * diff + eps))


def mse_loss(x, y):
    return jnp.mean(jnp.square(x - y))


def total_variation(x, reduction: str = "sum"):
    """Anisotropic TV (`opt/loss.py:7-17`): x is (..., H, W)."""
    hor = x[..., :-1, :] - x[..., 1:, :]
    ver = x[..., :-1] - x[..., 1:]
    return jnp.sum(jnp.abs(hor)) + jnp.sum(jnp.abs(ver))


def sobel_loss(x, y, eps: float = 1e-4):
    """4-direction Sobel edge charbonnier (`opt/loss.py:257-281`).

    x, y: (B, H, W, C) NHWC.
    """
    import numpy as np

    k = np.zeros((3, 3, 1, 4), np.float32)
    k[..., 0, 0] = [[1, 2, 1], [0, 0, 0], [-1, -2, -1]]
    k[..., 0, 1] = [[1, 0, -1], [2, 0, -2], [1, 0, -1]]
    k[..., 0, 2] = [[2, 1, 0], [1, 0, -1], [0, -1, -2]]
    k[..., 0, 3] = [[0, 1, 2], [-1, 0, 1], [-2, -1, 0]]
    import jax

    def edges(t):
        c = t.shape[-1]
        kk = jnp.tile(jnp.asarray(k), (1, 1, 1, 1))
        outs = []
        for ci in range(c):
            outs.append(jax.lax.conv_general_dilated(
                t[..., ci:ci + 1], kk, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")))
        return jnp.concatenate(outs, axis=-1)

    dx, dy = edges(x), edges(y)
    diff = dx - dy
    return jnp.sum(jnp.sqrt(diff * diff + eps))


def charbonnier_etc_loss(x, y, eps: float = 1e-4):
    """Charbonnier + 0.1x temporal FFT-energy consistency
    (`opt/loss.py:34-56`). x, y: (B, N, H, W, C) frame sequences."""
    diff = x - y
    loss_spa = jnp.sum(jnp.sqrt(diff * diff + eps))
    xe = jnp.real(jnp.fft.rfft2(x, axes=(2, 3)))
    ye = jnp.real(jnp.fft.rfft2(y, axes=(2, 3)))
    n = x.shape[1]
    sr_e = 0.0
    gt_e = 0.0
    for i in range(n - 1):
        # replicating the reference's accumulation (incl. its reuse of the
        # GT accumulator on the SR side — `opt/loss.py:50-51`)
        sr_e = gt_e + (jnp.abs(xe[:, i + 1]) - jnp.abs(xe[:, i]))
        gt_e = gt_e + (jnp.abs(ye[:, i + 1]) - jnp.abs(ye[:, i]))
    loss_energy = jnp.sum(gt_e) - jnp.sum(sr_e)
    return loss_spa + 0.1 * loss_energy
