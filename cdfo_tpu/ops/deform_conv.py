"""Deformable convolution v1/v2 for TPU.

The reference ships a CUDA im2col extension (`ops/dcn/src/deform_conv_cuda.cpp`,
`deform_conv_cuda_kernel.cu` — bilinear-offset im2col then GEMM). The
TPU-native design keeps the same math but maps it to XLA primitives the
hardware likes:

  per kernel tap k: one bilinear gather of the input at
      (y*stride - pad + i*dil + dy_k, x*stride - pad + j*dil + dx_k)
  (VPU gathers), optionally modulated by a sigmoid mask (v2), then ONE
  fused matmul over the concatenated taps: (B,H,W,K*Cin) @ (K*Cin, Cout)
  — the GEMM lands on the MXU with K*Cin contraction depth.

Offset channel layout matches the CUDA op (`ops/dcn/deform_conv.py:14-148`):
(B, 2*G*K, H, W) with [dy, dx] interleaved per tap, deformable group major;
mask (B, G*K, H, W). Autodiff falls out of the gather formulation — no
custom VJP needed (the backward gathers/scatters are XLA-generated).

Golden values from `ops/dcn/simple_check.py:11-22` are pinned in
tests/test_deform_conv.py; randomized parity vs torchvision.ops.deform_conv2d.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _bilinear_gather(img: jnp.ndarray, sy: jnp.ndarray, sx: jnp.ndarray) -> jnp.ndarray:
    """img (H, W, C); sy/sx (..., Ho, Wo) float sample coords; zeros outside.

    Matches the CUDA tap semantics (`deform_conv_cuda_kernel.cu:84-114`):
    each of the four corners contributes only if inside the image. The four
    corners are quad-packed into one gather (a one-pixel zero border covers
    the boundary band; samples fully outside are masked afterwards).
    """
    h, w, _ = img.shape
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy = sy - y0
    wx = sx - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    xp = jnp.pad(img, ((1, 2), (1, 2), (0, 0)))
    hp, wp = h + 2, w + 2  # addressable base positions: y0 in [-1, h]
    quad = jnp.concatenate([
        xp[:hp, :wp], xp[:hp, 1:wp + 1],
        xp[1:hp + 1, :wp], xp[1:hp + 1, 1:wp + 1]], axis=-1)
    py = jnp.clip(y0i + 1, 0, hp - 1)
    px = jnp.clip(x0i + 1, 0, wp - 1)
    flat = quad.reshape(hp * wp, -1)
    q = jnp.take(flat, (py * wp + px).reshape(-1), axis=0)
    q = q.reshape(*sy.shape, -1)
    v00, v01, v10, v11 = jnp.split(q, 4, axis=-1)
    outside = ((y0i < -1) | (y0i > h - 1) | (x0i < -1) | (x0i > w - 1))
    keep = (~outside)[..., None]
    return ((jnp.where(keep, v00, 0) * ((1 - wy) * (1 - wx))[..., None])
            + (jnp.where(keep, v01, 0) * ((1 - wy) * wx)[..., None])
            + (jnp.where(keep, v10, 0) * (wy * (1 - wx))[..., None])
            + (jnp.where(keep, v11, 0) * (wy * wx)[..., None]))


def deform_conv2d(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """NHWC deformable conv.

    Args:
      x: (B, H, W, Cin).
      offset: (B, Ho, Wo, 2*G*K) — [dy, dx] per tap, deformable-group major
        (same channel order as the CUDA op, moved to channels-last).
      weight: (kh, kw, Cin // groups, Cout).
      mask: optional (B, Ho, Wo, G*K) modulation (applied as-is; apply
        sigmoid at the caller as the reference packs do).
      groups: weight groups (conv groups, not deformable groups).

    Returns (B, Ho, Wo, Cout).
    """
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    k = kh * kw
    ho = (h + 2 * padding - (dilation * (kh - 1) + 1)) // stride + 1
    wo = (w + 2 * padding - (dilation * (kw - 1) + 1)) // stride + 1
    two_gk = offset.shape[-1]
    g = two_gk // (2 * k)
    assert cin % g == 0, f"Cin={cin} not divisible by deformable_groups={g}"
    cpg = cin // g

    base_y = jax.lax.broadcasted_iota(jnp.float32, (ho, wo), 0) * stride - padding
    base_x = jax.lax.broadcasted_iota(jnp.float32, (ho, wo), 1) * stride - padding

    off = offset.astype(jnp.float32).reshape(b, ho, wo, g, k, 2)

    # ONE gather for all (group, tap) pairs: fold G and K into the gather
    # batch dimension. Keeps the emitted op count constant in K*G, which
    # is what makes the 25-tap SKConv branches and the V7 pyramid
    # compile in seconds instead of minutes.
    tap_dy = (jnp.arange(kh, dtype=jnp.float32) * dilation)[:, None]
    tap_dx = (jnp.arange(kw, dtype=jnp.float32) * dilation)[None, :]
    tap_dy = jnp.broadcast_to(tap_dy, (kh, kw)).reshape(k)
    tap_dx = jnp.broadcast_to(tap_dx, (kh, kw)).reshape(k)
    # (B, G, K, Ho, Wo)
    sy = (off[..., 0].transpose(0, 3, 4, 1, 2)
          + tap_dy[None, None, :, None, None] + base_y[None, None, None])
    sx = (off[..., 1].transpose(0, 3, 4, 1, 2)
          + tap_dx[None, None, :, None, None] + base_x[None, None, None])
    xg = x.reshape(b, h, w, g, cpg).transpose(0, 3, 1, 2, 4)
    xg = xg.reshape(b * g, h, w, cpg)
    v = jax.vmap(_bilinear_gather)(
        xg, sy.reshape(b * g, k, ho, wo), sx.reshape(b * g, k, ho, wo))
    v = v.astype(x.dtype).reshape(b, g, k, ho, wo, cpg)
    if mask is not None:
        m = mask.astype(x.dtype).reshape(b, ho, wo, g, k)
        v = v * m.transpose(0, 3, 4, 1, 2)[..., None]
    # -> (B, Ho, Wo, K, G*cpg = Cin)
    cols = v.transpose(0, 3, 4, 2, 1, 5).reshape(b, ho, wo, k, cin)

    # one MXU matmul per weight group over the (K*Cin/g) contraction
    if groups == 1:
        wmat = weight.transpose(0, 1, 2, 3).reshape(k, cin, cout)
        out = jnp.einsum("bhwkc,kco->bhwo", cols, wmat)
    else:
        cpg_w = cin // groups
        opg = cout // groups
        outs = []
        for gi in range(groups):
            c = cols[..., gi * cpg_w:(gi + 1) * cpg_w]
            wg = weight[..., gi * opg:(gi + 1) * opg].reshape(k, cpg_w, opg)
            outs.append(jnp.einsum("bhwkc,kco->bhwo", c, wg))
        out = jnp.concatenate(outs, axis=-1)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
