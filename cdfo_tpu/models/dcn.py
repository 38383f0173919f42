"""Flax modules wrapping the TPU deformable conv
(reference binding layer `ops/dcn/deform_conv.py:190-337`).

Param layouts mirror the reference (weight uniform(+-1/sqrt(Cin*k*k)),
offset/mask convs zero-initialised so the op starts as a plain conv).
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.deform_conv import deform_conv2d
from .layers import Conv2d

Dtype = Any


def _ref_weight_init(in_channels: int):
    def init(key, shape, dtype=jnp.float32):
        kh, kw, _, _ = shape
        stdv = 1.0 / math.sqrt(in_channels * kh * kw)
        return jax.random.uniform(key, shape, dtype, -stdv, stdv)

    return init


class DeformConv(nn.Module):
    """v1: forward(x, offset). No bias (`deform_conv.py:204`)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    deformable_groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, offset):
        k = self.kernel_size
        in_ch = x.shape[-1]
        weight = self.param("weight", _ref_weight_init(in_ch),
                            (k, k, in_ch // self.groups, self.features))
        return deform_conv2d(
            x.astype(self.dtype), offset, weight.astype(self.dtype),
            stride=self.stride, padding=self.padding, dilation=self.dilation,
            groups=self.groups)


class DeformConvPack(nn.Module):
    """v1 pack: offsets predicted by a zero-init conv on x."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    deformable_groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        offset = Conv2d(self.deformable_groups * 2 * k * k, k, self.stride,
                        self.padding, kernel_init=nn.initializers.zeros,
                        dtype=self.dtype, name="conv_offset")(x)
        return DeformConv(self.features, k, self.stride, self.padding,
                          self.dilation, self.groups, self.deformable_groups,
                          dtype=self.dtype, name="dc")(x, offset)


class ModulatedDeformConv(nn.Module):
    """v2: forward(x, offset, mask) — mask already sigmoided by caller."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    deformable_groups: int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, offset, mask):
        k = self.kernel_size
        in_ch = x.shape[-1]
        weight = self.param("weight", _ref_weight_init(in_ch),
                            (k, k, in_ch // self.groups, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        return deform_conv2d(
            x.astype(self.dtype), offset, weight.astype(self.dtype),
            bias=bias, mask=mask, stride=self.stride, padding=self.padding,
            dilation=self.dilation, groups=self.groups)


def split_offset_mask(out: jnp.ndarray):
    """Pack head output (…, 3*G*K) -> offset (…, 2*G*K), sigmoid mask.

    The torch pack chunks channels into (o1, o2, m) and concatenates
    (o1, o2) (`deform_conv.py:331-334`); the kernel then interprets those
    channels interleaved ([dy, dx] per tap, group-major). The layout is
    arbitrary-but-learned, so parity requires reproducing exactly this
    composition: plain concat here, interleaved read in deform_conv2d.
    """
    gk3 = out.shape[-1]
    gk = gk3 // 3
    o1, o2, m = out[..., :gk], out[..., gk:2 * gk], out[..., 2 * gk:]
    return jnp.concatenate([o1, o2], axis=-1), jax.nn.sigmoid(m)


class ModulatedDeformConvPack(nn.Module):
    """v2 pack (`deform_conv.py:311-337`)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    deformable_groups: int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, extra_offset_input=None):
        k = self.kernel_size
        src = extra_offset_input if extra_offset_input is not None else x
        out = Conv2d(self.deformable_groups * 3 * k * k, k, self.stride,
                     self.padding, kernel_init=nn.initializers.zeros,
                     dtype=self.dtype, name="conv_offset_mask")(src)
        offset, mask = split_offset_mask(out)
        return ModulatedDeformConv(
            self.features, k, self.stride, self.padding, self.dilation,
            self.groups, self.deformable_groups, self.use_bias,
            dtype=self.dtype, name="mdc")(x, offset, mask)
