"""Cross-scale self-calibration reconstruction trunk ("CSSR").

``BlockS`` (reference ``Block_``, `/root/reference/arch/SIDECVSR_our.py:378-406`):
runs a conv-lrelu-conv body at 1x, at 0.5x (down -> body -> up) and at 2x
(up -> body -> down), summing all three with the identity. ``SCGroupS``
(`:430-444`) stacks 3 of them + 3x3 conv + skip; ``SCNetS`` (`:468-480`)
stacks N groups + skip (CVSR_V8 uses N=7 regardless of the ``SCGs`` ctor
arg — `:4388`).

The pyramid (list-valued) variants used by CVSR_V7/SIDECVSR (`:337-373,
409-426, 448-463`) exchange residuals across pyramid levels.

All resizes are bilinear align_corners=False (torch ``Interpolate`` wrapper,
`:324-333`), reproduced by :func:`cdfo_tpu.ops.resize.interpolate_bilinear`.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import Conv2d, lrelu, scaled_kaiming_normal
from ..ops.resize import interpolate_bilinear

Dtype = Any


class BlockS(nn.Module):
    nf: int = 64
    kernel_size: int = 3
    width_multiplier: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size

        body0 = Conv2d(self.nf * self.width_multiplier, k, 1, k // 2,
                       kernel_init=scaled_kaiming_normal(0.1),
                       dtype=self.dtype, name="body_0")
        body2 = Conv2d(self.nf, k, 1, k // 2,
                       kernel_init=scaled_kaiming_normal(0.1),
                       dtype=self.dtype, name="body_2")
        down_conv = Conv2d(self.nf, 1, 1, 0,
                           kernel_init=scaled_kaiming_normal(0.1),
                           dtype=self.dtype, name="down_0")
        up_conv = Conv2d(self.nf, 1, 1, 0,
                         kernel_init=scaled_kaiming_normal(0.1),
                         dtype=self.dtype, name="up_0")

        def body(t):
            return body2(lrelu(body0(t)))

        def down(t):
            return interpolate_bilinear(down_conv(t), scale_factor=0.5)

        def up(t):
            return interpolate_bilinear(up_conv(t), scale_factor=2.0)

        r = body(x)
        down_res = up(body(down(x)))
        up_res = down(body(up(x)))
        return x + r + down_res + up_res


class SCGroupS(nn.Module):
    nf: int = 64
    back_rbs: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        r = x
        for i in range(self.back_rbs):
            r = BlockS(self.nf, dtype=self.dtype, name=f"body_{i}")(r)
        r = Conv2d(self.nf, 3, 1, 1, dtype=self.dtype, name="conv")(r)
        return x + r


class SCNetS(nn.Module):
    nf: int = 64
    num_groups: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        r = x
        for i in range(self.num_groups):
            r = SCGroupS(self.nf, dtype=self.dtype, name=f"body_{i}")(r)
        return x + r


class _ScanGroupS(nn.Module):
    nf: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, _):
        return SCGroupS(self.nf, dtype=self.dtype, name="g")(x), None


class SCNetSScan(nn.Module):
    """Compile-time-bounded twin of :class:`SCNetS`: ONE traced
    ``SCGroupS`` body, ``lax.scan`` over per-group params stacked on a
    leading axis (flax ``nn.scan``). Same math, same execution order —
    the XLA program contains one group instead of ``num_groups`` copies,
    which is what made the unrolled pyramid models cost minutes of
    compile per geometry (ROUND3_NOTES: V7 exceeded 24 min cold through
    the remote-compile tunnel).

    Param layout: ``groups/g/<SCGroupS tree>`` with leading dim
    ``num_groups``; :func:`cdfo_tpu.compat.to_scan_trunk` converts the
    unrolled ``body_{i}`` layout (and therefore any converted reference
    checkpoint) into it.
    """

    nf: int = 64
    num_groups: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # remat inside the scan: without it the backward pass stacks every
        # group's Block_ intermediates over the scan axis ((G, B, 2H, 2W,
        # 4nf) bf16 buffers — OOMs a 16 GB chip at the reference batch 20
        # where the unrolled trunk fits); with it only the (B, H, W, nf)
        # carries are saved and the group body recomputes in backward —
        # the standard scan-over-layers memory/FLOP trade.
        scan = nn.scan(nn.remat(_ScanGroupS, prevent_cse=False),
                       variable_axes={"params": 0},
                       split_rngs={"params": True},
                       length=self.num_groups)
        r, _ = scan(self.nf, dtype=self.dtype, name="groups")(x, None)
        return x + r


class BlockPyr(nn.Module):
    """List-valued pyramid block (reference ``Block``): each level runs the
    shared body; level 0 additionally receives its own down-projected
    residual and the last level its own up-projected one, with cross-level
    exchange in between (`arch/SIDECVSR_our.py:365-373`)."""

    nf: int = 64
    kernel_size: int = 3
    width_multiplier: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_list: Sequence[jnp.ndarray]):
        k = self.kernel_size
        body0 = Conv2d(self.nf * self.width_multiplier, k, 1, k // 2,
                       kernel_init=scaled_kaiming_normal(0.1),
                       dtype=self.dtype, name="body_0")
        body2 = Conv2d(self.nf, k, 1, k // 2,
                       kernel_init=scaled_kaiming_normal(0.1),
                       dtype=self.dtype, name="body_2")
        down_conv = Conv2d(self.nf, 1, 1, 0,
                           kernel_init=scaled_kaiming_normal(0.1),
                           dtype=self.dtype, name="down_0")
        up_conv = Conv2d(self.nf, 1, 1, 0,
                         kernel_init=scaled_kaiming_normal(0.1),
                         dtype=self.dtype, name="up_0")

        def body(t):
            return body2(lrelu(body0(t)))

        def down(t):
            return interpolate_bilinear(down_conv(t), scale_factor=0.5)

        def up(t):
            return interpolate_bilinear(up_conv(t), scale_factor=2.0)

        res_list = [body(t) for t in x_list]
        down_res_list = [res_list[0]] + [down(t) for t in res_list[:-1]]
        up_res_list = [up(t) for t in res_list[1:]] + [res_list[-1]]
        return [x + r + d + u for x, r, d, u in
                zip(x_list, res_list, down_res_list, up_res_list)]


class SCGroupPyr(nn.Module):
    nf: int = 64
    back_rbs: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_list):
        r = list(x_list)
        for i in range(self.back_rbs):
            r = BlockPyr(self.nf, dtype=self.dtype, name=f"body_{i}")(r)
        conv = Conv2d(self.nf, 3, 1, 1, dtype=self.dtype, name="conv")
        r = [conv(t) for t in r]
        return [x + t for x, t in zip(x_list, r)]


class SCNetPyr(nn.Module):
    nf: int = 64
    num_groups: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_list):
        r = list(x_list)
        for i in range(self.num_groups):
            r = SCGroupPyr(self.nf, dtype=self.dtype, name=f"body_{i}")(r)
        return [x + t for x, t in zip(x_list, r)]


class _ScanGroupPyr(nn.Module):
    nf: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, _):
        out = SCGroupPyr(self.nf, dtype=self.dtype, name="g")(list(carry))
        return tuple(out), None


class SCNetPyrScan(nn.Module):
    """Scan twin of :class:`SCNetPyr` (see :class:`SCNetSScan`): the
    3-level pyramid rides the scan carry as a tuple of arrays."""

    nf: int = 64
    num_groups: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_list):
        scan = nn.scan(nn.remat(_ScanGroupPyr, prevent_cse=False),
                       variable_axes={"params": 0},
                       split_rngs={"params": True},
                       length=self.num_groups)
        r, _ = scan(self.nf, dtype=self.dtype, name="groups")(
            tuple(x_list), None)
        return [x + t for x, t in zip(x_list, r)]
