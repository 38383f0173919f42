"""Differentiable wrappers for the fused inference kernels.

The Pallas kernels in ``fused_block2`` / ``fused_groupconv`` / ``fused_head``
have no transpose rules, so until round 3 ``fused_trunk=True`` was
inference-only and training fell back to the XLA trunk. Each wrapper here is
a ``jax.custom_vjp`` whose

* **forward** runs the fused Pallas kernel unchanged (padding/weight
  packing included), and whose
* **backward** recomputes through an XLA twin of the exact reference math
  (the same formulas the kernel parity tests pin — reference ``Block_``
  `/root/reference/arch/SIDECVSR_our.py:378-406`, SCGroup tail `:430-444`,
  upsample head `:4390-4393,4473-4480`) and differentiates that.

The twins are mathematically identical to the kernels (bit-equal in fp32),
so gradients are exact. Cost: the backward pays one XLA forward recompute —
the same rematerialisation trade ``jax.checkpoint`` makes — in exchange for
the fused forward and no saved intermediates (the 2x-branch activations at
production scale would otherwise dominate HBM).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .resize import interpolate_bilinear


def _lrelu(x):
    return jnp.where(x >= 0, x, 0.1 * x)


def _conv3x3(x, k, b):
    return jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b.astype(x.dtype)


def _conv1x1(x, k, b):
    return jnp.einsum("bhwc,co->bhwo", x, k[0, 0].astype(x.dtype)) \
        + b.astype(x.dtype)


# ---------------------------------------------------------------------------
# full Block_ (all three scale branches)
# ---------------------------------------------------------------------------

def _block_twin(x_hcw, k1, b1, k2, b2, kd, bd, ku, bu):
    """XLA twin of the fused Block_ kernel (BlockS semantics, HCW in/out)."""
    x = jnp.transpose(x_hcw, (0, 1, 3, 2))

    def body(t):
        return _conv3x3(_lrelu(_conv3x3(t, k1, b1)), k2, b2)

    def down(t):
        return interpolate_bilinear(_conv1x1(t, kd, bd), scale_factor=0.5)

    def up(t):
        return interpolate_bilinear(_conv1x1(t, ku, bu), scale_factor=2.0)

    out = x + body(x) + up(body(down(x))) + down(body(up(x)))
    return jnp.transpose(out, (0, 1, 3, 2))


def _block_fwd_impl(x, k1, b1, k2, b2, kd, bd, ku, bu):
    from .fused_block import dual_weights
    from .fused_block2 import fold_down_conv2, scale_block_hcw
    from ..models.trunk_fast import _pick_tiles

    dt = x.dtype
    _, h, _, w = x.shape
    wt, wp = _pick_tiles(w)
    rows = 16
    rpad = (-h) % rows
    tp = jnp.pad(x, ((0, 0), (6, 6), (0, 0), (6, 6)), mode="edge")
    tp = jnp.pad(tp, ((0, 0), (0, rpad), (0, 0), (0, 116 + wp - w)))
    out = scale_block_hcw(
        tp, dual_weights(k1).astype(dt), b1.reshape(-1, 1).astype(dt),
        dual_weights(k2).astype(dt), b2.reshape(-1, 1).astype(dt),
        fold_down_conv2(k2).astype(dt),
        ku[0, 0].astype(dt), bu.reshape(-1, 1).astype(dt),
        kd[0, 0].astype(dt), bd.reshape(-1, 1).astype(dt),
        img_h=h, img_w=w, rows=rows, wt=wt)
    return out[:, :h, :, :w]


@jax.custom_vjp
def block_fused(x_hcw, k1, b1, k2, b2, kd, bd, ku, bu):
    """Fused Block_ forward with an exact recompute backward.

    x_hcw: (B, H, cin, W) row-major features, H and W even.
    k1/b1: body_0 conv (3,3,cin,cmid); k2/b2: body_2 (3,3,cmid,cin);
    kd/bd, ku/bu: down_0/up_0 1x1 convs (1,1,cin,cin).
    """
    return _block_fwd_impl(x_hcw, k1, b1, k2, b2, kd, bd, ku, bu)


def _block_fwd(x, k1, b1, k2, b2, kd, bd, ku, bu):
    out = _block_fwd_impl(x, k1, b1, k2, b2, kd, bd, ku, bu)
    return out, (x, k1, b1, k2, b2, kd, bd, ku, bu)


def _block_bwd(res, g):
    _, vjp = jax.vjp(_block_twin, *res)
    return vjp(g)


block_fused.defvjp(_block_fwd, _block_bwd)


# ---------------------------------------------------------------------------
# SCGroup tail: 3x3 conv + residual skip
# ---------------------------------------------------------------------------

def _grouptail_twin(x_hcw, skip_hcw, kg, bg):
    x = jnp.transpose(x_hcw, (0, 1, 3, 2))
    out = _conv3x3(x, kg, bg)
    return jnp.transpose(out, (0, 1, 3, 2)) + skip_hcw


def _grouptail_fwd_impl(x, skip, kg, bg):
    from .fused_block import dual_weights
    from .fused_groupconv import conv3x3_residual_hcw
    from ..models.trunk_fast import _pick_tiles

    dt = x.dtype
    _, h, _, w = x.shape
    wt, wp = _pick_tiles(w)
    rows = 16
    rpad = (-h) % rows
    gp = jnp.pad(x, ((0, 0), (1, 1 + rpad), (0, 0), (2, 126 + wp - w)))
    sk = jnp.pad(skip, ((0, 0), (0, rpad), (0, 0), (0, wp - w)))
    out = conv3x3_residual_hcw(
        gp, sk, dual_weights(kg).astype(dt), bg.reshape(-1, 1).astype(dt),
        img_h=h, img_w=w, rows=rows, wt=wt)
    return out[:, :h, :, :w]


@jax.custom_vjp
def grouptail_fused(x_hcw, skip_hcw, kg, bg):
    """out = skip + conv3x3(x) on (B, H, cin, W), fused forward."""
    return _grouptail_fwd_impl(x_hcw, skip_hcw, kg, bg)


def _grouptail_fwd(x, skip, kg, bg):
    return _grouptail_fwd_impl(x, skip, kg, bg), (x, skip, kg, bg)


def _grouptail_bwd(res, g):
    _, vjp = jax.vjp(_grouptail_twin, *res)
    return vjp(g)


grouptail_fused.defvjp(_grouptail_fwd, _grouptail_bwd)


# ---------------------------------------------------------------------------
# upsample head: 2x subpixel stages + conv_last + bilinear x4 base
# ---------------------------------------------------------------------------

def _subpixel2(x, k, b):
    """1x1 conv to 4nf + PixelShuffle(2), NHWC (torch order c*4+dy*2+dx)."""
    y = _conv1x1(x, k, b)
    bsz, h, w, c4 = y.shape
    nf = c4 // 4
    y = y.reshape(bsz, h, w, nf, 2, 2)                # c, dy, dx
    y = jnp.transpose(y, (0, 1, 4, 2, 5, 3))          # b h dy w dx c
    return y.reshape(bsz, 2 * h, 2 * w, nf)


def _head_twin(t_hcw, center_lr, k1, b1, k2, b2, kl, bl):
    dt = t_hcw.dtype
    x = jnp.transpose(t_hcw, (0, 1, 3, 2))
    x = _lrelu(_subpixel2(x, k1, b1))
    x = _lrelu(_subpixel2(x, k2, b2))
    x = _conv3x3(x, kl, bl)
    base = interpolate_bilinear(center_lr.astype(dt), scale_factor=4.0)
    return (x + base).astype(jnp.float32)


def _head_fwd_impl(t_hcw, center_lr, k1, b1, k2, b2, kl, bl):
    from .fused_head import fused_head

    return fused_head(t_hcw, center_lr.astype(t_hcw.dtype),
                      k1, b1, k2, b2, kl, bl)


@jax.custom_vjp
def head_fused(t_hcw, center_lr, k1, b1, k2, b2, kl, bl):
    """Fused upsample head with an exact recompute backward.

    t_hcw: (B, H, nf, W) trunk output; center_lr (B, H, W, 1).
    k1/b1, k2/b2: upconv1/2 (1,1,nf,4nf); kl/bl: conv_last (3,3,nf,1).
    Returns (B, 4H, 4W, 1) fp32.
    """
    return _head_fwd_impl(t_hcw, center_lr, k1, b1, k2, b2, kl, bl)


def _head_fwd(*args):
    return _head_fwd_impl(*args), args


def _head_bwd(res, g):
    _, vjp = jax.vjp(_head_twin, *res)
    return vjp(g)


head_fused.defvjp(_head_fwd, _head_bwd)
