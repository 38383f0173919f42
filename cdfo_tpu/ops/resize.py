"""Bilinear resize matching ``torch.nn.functional.interpolate`` semantics.

The reference model uses three interpolation call sites with distinct
conventions (SURVEY §7.3):
  * ``Interpolate(scale)`` modules inside the trunk — bilinear,
    align_corners=False, no antialiasing (`arch/SIDECVSR_our.py:324-333`).
  * the final ×4 bilinear base (`arch/SIDECVSR_our.py:4479`) — same.
  * EGLA's 1×1→HxW upsample (`arch/SIDECVSR_our.py:2186`) — same (degenerate:
    broadcasts the single pixel).

``jax.image.resize`` antialiases on downscale (torch does not), so we
implement the exact torch formula: src = (dst + 0.5) * (in/out) - 0.5,
clamped at 0, two taps, border-replicated.

Separable: resize H then W, each a small dense matmul (out_size × in_size
sparse-banded matrix) — this maps onto the MXU and fuses well under XLA,
and is exact for both up- and down-scaling.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=64)
def _linear_matrix(in_size: int, out_size: int, scale: float) -> np.ndarray:
    """(out_size, in_size) row-stochastic bilinear interpolation matrix,
    matching torch interpolate(mode='bilinear', align_corners=False).

    ``scale`` is the *source-step* torch uses: ``1/scale_factor`` when a
    scale_factor was given (recompute_scale_factor=False default),
    ``in/out`` when an explicit size was given.
    """
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if out_size == in_size and abs(scale - 1.0) < 1e-9:
        np.fill_diagonal(m, 1.0)
        return m
    for d in range(out_size):
        src = (d + 0.5) * scale - 0.5
        src = max(src, 0.0)
        x0 = int(np.floor(src))
        x0 = min(x0, in_size - 1)
        x1 = min(x0 + 1, in_size - 1)
        lam = src - x0
        m[d, x0] += 1.0 - lam
        m[d, x1] += lam
    return m


def interpolate_bilinear(
    x: jnp.ndarray, scale_factor: float | None = None,
    size: tuple[int, int] | None = None,
) -> jnp.ndarray:
    """Bilinear resize of NHWC ``x`` with torch align_corners=False semantics.

    Exactly one of ``scale_factor`` / ``size`` must be given. Output spatial
    dims follow torch: ``floor(in * scale_factor)``.
    """
    b, h, w, c = x.shape
    if size is not None:
        oh, ow = size
        sh, sw = h / oh, w / ow
    else:
        oh, ow = int(np.floor(h * scale_factor)), int(np.floor(w * scale_factor))
        sh = sw = 1.0 / scale_factor
    if (oh, ow) == (h, w):
        return x
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mh = jnp.asarray(_linear_matrix(h, oh, sh))
    mw = jnp.asarray(_linear_matrix(w, ow, sw))
    # (B,H,W,C): contract H then W.
    y = jnp.einsum("oh,bhwc->bowc", mh, xf, precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("pw,bowc->bopc", mw, y, precision=jax.lax.Precision.HIGHEST)
    return y.astype(dtype)


def pixel_shuffle(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """NHWC pixel shuffle with torch channel ordering.

    torch ``PixelShuffle(r)`` on NCHW maps input channel ``c*r*r + dy*r + dx``
    to output channel ``c`` at offset (dy, dx) (`arch/SIDECVSR_our.py:4392`
    usage). In NHWC the channel axis keeps the same (c, dy, dx) ordering, so
    a reshape + transpose reproduces it bit-exactly.
    """
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, dy, w, dx, c
    return x.reshape(b, h * r, w * r, c)
