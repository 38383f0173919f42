"""SFT (spatial feature transform) conditioning stack used by SIDECVSR
(`/root/reference/arch/SIDECVSR_our.py:608-637, 1117-1140`)."""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Conv2d, lrelu

Dtype = Any


class SFTLayer(nn.Module):
    """scale/shift predicted from concat(features, side-features)
    (`:608-620`); side features carry nf//2 channels."""

    nf: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feas, side_feas):
        x_in = jnp.concatenate([feas, side_feas], axis=-1)
        scale = Conv2d(self.nf, 1, 1, 0, dtype=self.dtype, name="SFT_scale_conv0")(x_in)
        scale = Conv2d(self.nf, 1, 1, 0, dtype=self.dtype, name="SFT_scale_conv1")(lrelu(scale))
        shift = Conv2d(self.nf, 1, 1, 0, dtype=self.dtype, name="SFT_shift_conv0")(x_in)
        shift = Conv2d(self.nf, 1, 1, 0, dtype=self.dtype, name="SFT_shift_conv1")(lrelu(shift))
        return feas * (scale + 1.0) + shift


class ResBlockSFT(nn.Module):
    """SFT -> conv-relu -> SFT -> conv + skip (`:624-637`)."""

    nf: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feas, side_feas):
        fea = SFTLayer(self.nf, dtype=self.dtype, name="sft0")(feas, side_feas)
        fea = jax.nn.relu(Conv2d(self.nf, 3, 1, 1, dtype=self.dtype, name="conv0")(fea))
        fea = SFTLayer(self.nf, dtype=self.dtype, name="sft1")(fea, side_feas)
        fea = Conv2d(self.nf, 3, 1, 1, dtype=self.dtype, name="conv1")(fea)
        return feas + fea


class SideEmbeddedFeatureExtractBlock(nn.Module):
    """7 stacked SFT residual blocks (`:1117-1139`)."""

    nf: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img_feas, side_feas):
        fea = img_feas
        for i in range(1, 8):
            fea = ResBlockSFT(self.nf, dtype=self.dtype,
                              name=f"RB_wSide_{i}")(fea, side_feas)
        return fea
