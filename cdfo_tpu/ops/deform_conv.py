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
    """img (H, W, C); sy/sx (Ho, Wo) float sample coords; zeros outside.

    Matches the CUDA tap semantics (`deform_conv_cuda_kernel.cu:84-114`):
    each of the four corners contributes only if inside the image.
    """
    h, w, _ = img.shape
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy = sy - y0
    wx = sx - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    flat = img.reshape(h * w, -1)

    def corner(iy, ix):
        valid = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
        iyc = jnp.clip(iy, 0, h - 1)
        ixc = jnp.clip(ix, 0, w - 1)
        v = jnp.take(flat, (iyc * w + ixc).reshape(-1), axis=0)
        v = v.reshape(*iy.shape, -1)
        return jnp.where(valid[..., None], v, 0)

    v00 = corner(y0i, x0i)
    v01 = corner(y0i, x0i + 1)
    v10 = corner(y0i + 1, x0i)
    v11 = corner(y0i + 1, x0i + 1)
    return (v00 * ((1 - wy) * (1 - wx))[..., None]
            + v01 * ((1 - wy) * wx)[..., None]
            + v10 * (wy * (1 - wx))[..., None]
            + v11 * (wy * wx)[..., None])


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
    if mask is not None:
        m = mask.astype(x.dtype).reshape(b, ho, wo, g, k)

    # gather per tap, vectorised over deformable groups (g folds into the
    # gather batch so per-channel groups like STDF's G=Cin stay one gather
    # per tap instead of K*G separate ones)
    if g > 1:
        xg = x.reshape(b, h, w, g, cpg).transpose(0, 3, 1, 2, 4)
        xg = xg.reshape(b * g, h, w, cpg)
    cols = []
    for ki in range(kh):
        for kj in range(kw):
            tap = ki * kw + kj
            if g == 1:
                sy = base_y[None] + ki * dilation + off[:, :, :, 0, tap, 0]
                sx = base_x[None] + kj * dilation + off[:, :, :, 0, tap, 1]
                v = jax.vmap(_bilinear_gather)(x, sy, sx).astype(x.dtype)
            else:
                sy = (base_y[None, None] + ki * dilation
                      + off[:, :, :, :, tap, 0].transpose(0, 3, 1, 2))
                sx = (base_x[None, None] + kj * dilation
                      + off[:, :, :, :, tap, 1].transpose(0, 3, 1, 2))
                v = jax.vmap(_bilinear_gather)(
                    xg, sy.reshape(b * g, ho, wo), sx.reshape(b * g, ho, wo))
                v = v.reshape(b, g, ho, wo, cpg).transpose(0, 2, 3, 1, 4)
                v = v.reshape(b, ho, wo, cin).astype(x.dtype)
            if mask is not None:
                mt = m[:, :, :, :, tap]  # (B, Ho, Wo, G)
                v = v * jnp.repeat(mt, cpg, axis=-1)
            cols.append(v)
    cols = jnp.stack(cols, axis=3)  # (B, Ho, Wo, K, Cin)

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
