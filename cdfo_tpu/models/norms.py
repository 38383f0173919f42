"""Channel LayerNorm variants used by the Restormer-style blocks.

Reference: WithBias_LayerNorm / BiasFree_LayerNorm normalise over the channel
axis after a b c h w -> b (h w) c rearrange (`arch/SIDECVSR_our.py:1169-1223`).
In NHWC the channel axis is already last, so this is a plain last-axis norm
(biased variance, eps=1e-5 added under the sqrt).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


class ChannelLayerNorm(nn.Module):
    dim: int
    use_bias: bool = True  # WithBias_LayerNorm
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.dim,))
        xf = x.astype(jnp.float32)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.dim,))
            mu = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.var(xf, axis=-1, keepdims=True)
            y = (xf - mu) / jnp.sqrt(var + 1e-5) * weight + bias
        else:
            var = jnp.var(xf, axis=-1, keepdims=True)
            y = xf / jnp.sqrt(var + 1e-5) * weight
        return y.astype(x.dtype)
