"""Basic NHWC building blocks shared across the model zoo.

Everything is flax.linen, channels-last, fp32 params with a configurable
compute dtype. Initialisers reproduce torch defaults (kaiming-uniform with
a=sqrt(5)) so from-scratch training matches the reference recipe
statistically; residual blocks use the reference's scaled kaiming-normal
(`/root/reference/arch/SIDECVSR_our.py:275-293`).
"""
from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """torch Conv2d default: kaiming_uniform_(a=sqrt(5)) on (out,in,kh,kw).

    flax kernel shape is (kh, kw, in_per_group, out); fan_in = kh*kw*in_per_group.
    """
    kh, kw, in_pg, _ = shape
    fan_in = kh * kw * in_pg
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int) -> Callable:
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def scaled_kaiming_normal(scale: float = 0.1) -> Callable:
    """Reference residual-block init: kaiming_normal(fan_in) * scale."""

    def init(key, shape, dtype=jnp.float32):
        kh, kw, in_pg, _ = shape
        fan_in = kh * kw * in_pg
        std = math.sqrt(2.0 / fan_in)
        return jax.random.normal(key, shape, dtype) * (std * scale)

    return init


class Conv2d(nn.Module):
    """NHWC conv with torch-style int padding and torch default init."""

    features: int
    kernel_size: tuple[int, int] | int = 3
    stride: int | tuple[int, int] = 1
    padding: int | tuple[int, int] = 0
    groups: int = 1
    use_bias: bool = True
    kernel_init: Callable | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ks = self.kernel_size
        if isinstance(ks, int):
            ks = (ks, ks)
        st = self.stride
        if isinstance(st, int):
            st = (st, st)
        pd = self.padding
        if isinstance(pd, int):
            pd = (pd, pd)
        in_ch = x.shape[-1]
        fan_in = ks[0] * ks[1] * (in_ch // self.groups)
        y = nn.Conv(
            features=self.features,
            kernel_size=ks,
            strides=st,
            padding=[(pd[0], pd[0]), (pd[1], pd[1])],
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init or torch_conv_kernel_init,
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        return y


class ConvTranspose2d(nn.Module):
    """Exact ``torch.nn.ConvTranspose2d`` semantics in NHWC.

    Implemented as an input-dilated forward conv with a spatially flipped
    kernel: output size = (H-1)*s - 2p + k + output_padding, matching the
    reference's stride-2 decoder stages (`arch/SIDECVSR_our.py:1828-1831`).

    The kernel param is stored as (kh, kw, in, out) — the torch weight
    (in, out, kh, kw) transposed by (2, 3, 0, 1) — and flipped at call time.
    """

    features: int
    kernel_size: int = 3
    stride: int = 2
    padding: int = 2
    output_padding: int = 0
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, s, p, op = self.kernel_size, self.stride, self.padding, self.output_padding
        in_ch = x.shape[-1]
        # torch ConvTranspose2d init: kaiming_uniform(a=sqrt(5)) with
        # fan_in computed on the (in, out, kh, kw) weight = out*k*k... torch's
        # _calculate_fan_in treats dim1 as "out": fan_in = in_ch? For parity of
        # *training* statistics we follow torch: fan_in = out_ch/groups * k * k
        fan_in = self.features * k * k
        bound = 1.0 / math.sqrt(fan_in)
        kernel = self.param(
            "kernel",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -bound, bound),
            (k, k, in_ch, self.features),
        )
        pad_lo = k - 1 - p
        pad_hi = k - 1 - p + op
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel[::-1, ::-1].astype(self.dtype),
            window_strides=(1, 1),
            padding=((pad_lo, pad_hi), (pad_lo, pad_hi)),
            lhs_dilation=(s, s),
            rhs_dilation=(1, 1),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param(
                "bias",
                lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -bound, bound),
                (self.features,),
            )
            y = y + bias.astype(self.dtype)
        return y


def lrelu(x, slope: float = 0.1):
    return jax.nn.leaky_relu(x, negative_slope=slope)


class ResidualBlockNoBN(nn.Module):
    """conv-ReLU-conv + identity (`arch/SIDECVSR_our.py:254-271`), 0.1-scaled
    kaiming init (`:275-293`)."""

    nf: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        out = Conv2d(self.nf, 3, 1, 1, kernel_init=scaled_kaiming_normal(0.1),
                     dtype=self.dtype, name="conv1")(x)
        out = jax.nn.relu(out)
        out = Conv2d(self.nf, 3, 1, 1, kernel_init=scaled_kaiming_normal(0.1),
                     dtype=self.dtype, name="conv2")(out)
        return identity + out


class CALayer(nn.Module):
    """Channel attention: GAP -> 1x1 conv -> ReLU -> 1x1 conv -> sigmoid
    (`arch/SIDECVSR_our.py:2027-2043`; note both convs are full-width)."""

    channel: int = 64
    dtype: Dtype = jnp.float32

    def setup(self):
        self._du0 = Conv2d(self.channel, 1, 1, 0, dtype=self.dtype,
                           name="conv_du_0")
        self._du2 = Conv2d(self.channel, 1, 1, 0, dtype=self.dtype,
                           name="conv_du_2")

    def scale(self, x):
        """The (B, 1, 1, C) sigmoid gate alone (for fused callers that
        apply it inside a kernel)."""
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        return jax.nn.sigmoid(self._du2(jax.nn.relu(self._du0(y))))

    def __call__(self, x):
        return x * self.scale(x)


class SpatialAttention(nn.Module):
    """max/mean channel pool -> 7x7 conv -> sigmoid gate
    (`arch/SIDECVSR_our.py:1883-1899`)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pooled = jnp.concatenate(
            [jnp.max(x, axis=-1, keepdims=True), jnp.mean(x, axis=-1, keepdims=True)],
            axis=-1,
        )
        gate = Conv2d(1, 7, 1, 3, dtype=self.dtype, name="spatial")(pooled)
        return x * jax.nn.sigmoid(gate)


class DPConv(nn.Module):
    """Depthwise (k, stride, groups=C) + pointwise 1x1
    (`arch/SIDECVSR_our.py:37-59`)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        pad = (self.kernel_size - 1) // 2
        y = Conv2d(in_ch, self.kernel_size, self.stride, pad, groups=in_ch,
                   dtype=self.dtype, name="depth_conv")(x)
        y = Conv2d(self.features, 1, 1, 0, dtype=self.dtype, name="point_conv")(y)
        return y
