"""Fast CSSR trunk: SCNetS computed in row-major (H, C, W) layout with the
fused Pallas Block_ body kernel (`cdfo_tpu/ops/fused_block.py`).

Numerically identical to :class:`cdfo_tpu.models.trunk.SCNetS` (same math,
same params) and **param-tree identical** (every conv is declared under the
same `body_i/body_j/{body_0,body_2,down_0,up_0}/conv/...` paths), so the
checkpoint converter and all parity machinery work unchanged; the only
difference is execution strategy:

* one NHWC->HCW transpose at trunk entry/exit instead of per-op layout
  churn (C=64 NHWC convs half-fill the 128-wide lanes; see fused_block.py);
* the conv-lrelu-conv body pair runs as one fused Pallas kernel per scale;
* 1x1 convs are channel-contraction einsums; bilinear 0.5x/2x resizes are
  exact stencil shifts applied on the (H, W) axes of the HCW array;
* the 3x3 group conv runs in dual form: three per-dx einsums over
  H-stacked row triples with output-shifted accumulation.

Reference semantics: `arch/SIDECVSR_our.py:378-406,430-444,468-480`.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.fused_block import block_body_hcw, dual_weights
from ..ops.fused_block2 import fold_down_conv2
from ..ops.resize import _resize_axis_down_half, _resize_axis_up_int
from .layers import scaled_kaiming_normal, torch_bias_init, torch_conv_kernel_init

Dtype = Any


class _ConvParams(nn.Module):
    """Bare conv params under a 'conv' scope — tree-path identical to
    :class:`cdfo_tpu.models.layers.Conv2d` without binding the compute."""

    kh: int
    kw: int
    cin: int
    cout: int
    scaled_init: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        init = scaled_kaiming_normal(0.1) if self.scaled_init \
            else torch_conv_kernel_init

        class _Raw(nn.Module):
            kh: int
            kw: int
            cin: int
            cout: int
            kernel_init: Any
            use_bias: bool

            @nn.compact
            def __call__(inner):
                kernel = inner.param(
                    "kernel", inner.kernel_init,
                    (inner.kh, inner.kw, inner.cin, inner.cout))
                if not inner.use_bias:
                    return kernel, None
                bias = inner.param(
                    "bias", torch_bias_init(inner.kh * inner.kw * inner.cin),
                    (inner.cout,))
                return kernel, bias

        return _Raw(self.kh, self.kw, self.cin, self.cout, init,
                    self.use_bias, name="conv")()


def _pick_tiles(w: int) -> tuple[int, int]:
    """Choose (wt, wp): lane-tile width and padded width for the kernel.
    Single tile up to 1024 lanes; beyond that split into equal 128-aligned
    tiles (VMEM scratch at wt=1024 is ~13 MB)."""
    wp = -(-w // 128) * 128
    ntiles = -(-wp // 1024)
    wt = -(-wp // (ntiles * 128)) * 128
    return wt, wt * ntiles


def _body(t, w1d, b1, w2d, b2, residual=False):
    """Pad + fused body kernel + crop, on (B, H, C, W)."""
    _, h, _, w = t.shape
    wt, wp = _pick_tiles(w)
    # wider row blocks amortise the 2-row conv1 halo and per-step costs
    # (measured best at 16 across geometries with unrolled row loops)
    rows = 16
    rpad = (-h) % rows
    tp = jnp.pad(t, ((0, 0), (2, 2 + rpad), (0, 0), (2, 126 + wp - w)))
    out = block_body_hcw(tp, w1d, b1, w2d, b2, rows=rows, wt=wt,
                         img_h=h, img_w=w, add_residual=residual,
                         unroll_rows=True)
    return out[:, :h, :, :w]


def _conv1x1(t, kernel, bias, dt):
    k = kernel[0, 0].astype(dt)  # (cin, cout)
    return (jnp.einsum("bhcw,co->bhow", t, k)
            + bias.astype(dt)[None, None, :, None])


def _conv3x3_hcw(t, kernel, bias, dt):
    """3x3 conv in dual form on (B, H, C, W): H taps stacked into the
    contraction, W taps as output-shifted accumulation."""
    b, h, c, w = t.shape
    cout = kernel.shape[-1]
    wd = dual_weights(kernel).astype(dt)          # (cout, 9c): dx,dy,ci
    tp = jnp.pad(t, ((0, 0), (1, 1), (0, 0), (1, 1)))
    x3 = jnp.concatenate([tp[:, d:d + h] for d in range(3)], axis=2)
    # x3 (B, H, 3c, W+2): row triple per output row
    zs = [jnp.einsum("ok,bhkw->bhow", wd[:, d * 3 * c:(d + 1) * 3 * c], x3)
          for d in range(3)]
    out = zs[0][..., 0:w] + zs[1][..., 1:w + 1] + zs[2][..., 2:w + 2]
    return out + bias.astype(dt)[None, None, :, None]


def _down(t):
    y = _resize_axis_down_half(t, 1)
    return _resize_axis_down_half(y, 3)


def _up(t):
    y = _resize_axis_up_int(t, 1, 2)
    return _resize_axis_up_int(y, 3, 2)


class _BlockFast(nn.Module):
    """Block_ with ALL THREE branches in ONE fused Pallas kernel
    (``ops/fused_block2.py``): the 2x and 0.5x intermediates never touch
    HBM and ``down . conv2`` on the 2x branch is algebraically folded to
    4/9 the FLOPs. One HBM read + one write per block. ``use_int8``
    switches to the int8-turbo twin (approximate — config.trunk_int8)."""

    nf: int = 64
    dtype: Dtype = jnp.float32
    use_int8: bool = False

    @nn.compact
    def __call__(self, x):
        nf, dt = self.nf, self.dtype
        k0, b0 = _ConvParams(3, 3, nf, nf * 4, name="body_0")()
        k2, b2 = _ConvParams(3, 3, nf * 4, nf, name="body_2")()
        kd, bd = _ConvParams(1, 1, nf, nf, name="down_0")()
        ku, bu = _ConvParams(1, 1, nf, nf, name="up_0")()

        if not self.use_int8:
            # differentiable wrapper (fused forward + exact recompute VJP)
            from ..ops.fused_vjp import block_fused
            return block_fused(x, k0, b0, k2, b2, kd, bd, ku, bu)

        from ..ops.fused_block2_q import scale_block_hcw_q as _sb
        _, h, _, w = x.shape
        wt, wp = _pick_tiles(w)
        rows = 16
        rpad = (-h) % rows
        tp = jnp.pad(x, ((0, 0), (6, 6), (0, 0), (6, 6)), mode="edge")
        tp = jnp.pad(tp, ((0, 0), (0, rpad), (0, 0), (0, 116 + wp - w)))
        out = _sb(
            tp, dual_weights(k0).astype(dt), b0.reshape(-1, 1).astype(dt),
            dual_weights(k2).astype(dt), b2.reshape(-1, 1).astype(dt),
            fold_down_conv2(k2).astype(dt),
            ku[0, 0].astype(dt), bu.reshape(-1, 1).astype(dt),
            kd[0, 0].astype(dt), bd.reshape(-1, 1).astype(dt),
            img_h=h, img_w=w, rows=rows, wt=wt)
        return out[:, :h, :, :w]


class _GroupFast(nn.Module):
    nf: int = 64
    dtype: Dtype = jnp.float32

    use_int8: bool = False

    @nn.compact
    def __call__(self, t):
        from ..ops.fused_vjp import grouptail_fused

        g = t
        for j in range(3):
            g = _BlockFast(self.nf, dtype=self.dtype,
                           use_int8=self.use_int8,
                           name=f"body_{j}")(g)
        kg, bg = _ConvParams(3, 3, self.nf, self.nf,
                             scaled_init=False, name="conv")()
        return grouptail_fused(g, t, kg, bg)


class SCNetFast(nn.Module):
    """SCNetS on the fused-kernel HCW path. Input/output NHWC."""

    nf: int = 64
    num_groups: int = 7
    dtype: Dtype = jnp.float32
    use_int8: bool = False

    @nn.compact
    def __call__(self, x_nhwc, out_layout: str = "nhwc",
                 in_layout: str = "nhwc"):
        dt = self.dtype
        if in_layout == "hcw":
            t = x_nhwc.astype(dt)
        else:
            t = jnp.transpose(x_nhwc.astype(dt), (0, 1, 3, 2))  # (B,H,C,W)
        r = t
        for i in range(self.num_groups):
            r = _GroupFast(self.nf, dt, use_int8=self.use_int8,
                           name=f"body_{i}")(r)
        out = t + r
        if out_layout == "hcw":
            return out
        return jnp.transpose(out, (0, 1, 3, 2))
