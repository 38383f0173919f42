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


def _resize_axis_up_int(x: jnp.ndarray, axis: int, s: int) -> jnp.ndarray:
    """Integer-factor bilinear upscale along one axis, half-pixel centers.

    For phase r in [0, s): src = (s*i + r + 0.5)/s - 0.5 = i + (r+0.5)/s - 0.5
    — every output needs at most two neighbouring inputs with fixed weights,
    so the whole resize is s shifted weighted sums + an interleave (VPU work,
    no matmul). Exactly matches the torch formula incl. the src>=0 clamp.
    """
    n = x.shape[axis]
    phases = []
    for r in range(s):
        src = (r + 0.5) / s - 0.5  # offset from i, in (-0.5, 0.5)
        if src < 0:
            # x0 = i-1 (clamped at 0), lam = 1 + src
            lam = 1.0 + src
            left = jnp.concatenate(
                [jax.lax.slice_in_dim(x, 0, 1, axis=axis),
                 jax.lax.slice_in_dim(x, 0, n - 1, axis=axis)], axis=axis)
            phases.append(left * (1.0 - lam) + x * lam)
        else:
            lam = src
            right = jnp.concatenate(
                [jax.lax.slice_in_dim(x, 1, n, axis=axis),
                 jax.lax.slice_in_dim(x, n - 1, n, axis=axis)], axis=axis)
            phases.append(x * (1.0 - lam) + right * lam)
    stacked = jnp.stack(phases, axis=axis + 1)  # (..., n, s, ...)
    new_shape = list(x.shape)
    new_shape[axis] = n * s
    return stacked.reshape(new_shape)


def _resize_axis_down_half(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Exact 0.5x bilinear downscale: src = 2i + 0.5 -> mean of each
    adjacent pair (even length) / pair-mean with a trailing clamp (odd)."""
    n = x.shape[axis]
    o = n // 2
    even = jax.lax.slice_in_dim(x, 0, 2 * o, axis=axis)
    shape = list(x.shape)
    shape[axis:axis + 1] = [o, 2]
    pair = even.reshape(shape)
    return jnp.mean(pair, axis=axis + 1)


def interpolate_bilinear(
    x: jnp.ndarray, scale_factor: float | None = None,
    size: tuple[int, int] | None = None,
) -> jnp.ndarray:
    """Bilinear resize of NHWC ``x`` with torch align_corners=False semantics.

    Exactly one of ``scale_factor`` / ``size`` must be given. Output spatial
    dims follow torch: ``floor(in * scale_factor)``. Integer upscales and
    exact 0.5x downscale take a stencil fast path (shifted adds instead of
    the sparse interpolation-matrix matmul).
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
    if size is None and scale_factor is not None:
        # stencil weights for x2/x4/x0.5 are exact in bf16; stay in the
        # input dtype to halve HBM traffic at the large scales
        s = scale_factor
        cdt = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
        if s >= 2.0 and float(s).is_integer():
            si = int(s)
            y = _resize_axis_up_int(x.astype(cdt), 1, si)
            y = _resize_axis_up_int(y, 2, si)
            return y.astype(x.dtype)
        if s == 0.5:
            y = _resize_axis_down_half(x.astype(cdt), 1)
            y = _resize_axis_down_half(y, 2)
            return y.astype(x.dtype)
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
