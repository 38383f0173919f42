"""Coding-prior (partition-map) feature extraction — the "GCPI" stage.

* ``SideToFeaUDSA2``: stride-2 U-shaped side-info encoder with a spatial
  attention bottleneck (`/root/reference/arch/SIDECVSR_our.py:1815-1875`);
  plus the simpler family members used by other variants (`:1696-1809`).
* ``PartitionTransformerSA2``: three rounds of {side-branch injection, MDTA
  self-attention, 3x3 conv} with a *shared* side encoder and shared
  attn/norm/conv weights across rounds (`:1441-1475` — the same submodules
  are reused, which we reproduce by calling the same bound module 3x).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .attention import MDTA
from .layers import Conv2d, ConvTranspose2d, SpatialAttention, lrelu
from .norms import ChannelLayerNorm

Dtype = Any


class SideToFeaUDSA2(nn.Module):
    """conv s1 -> conv s2p2 -> conv s2p2 -> SpatialAttention ->
    convT s2p2 -> convT s2p2(op1) -> conv -> in_f channels, all lrelu(0.1)."""

    in_f: int
    nf: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, side):
        x = lrelu(Conv2d(self.nf, 3, 1, 1, dtype=self.dtype, name="body_0")(side))
        x = lrelu(Conv2d(self.nf, 3, 2, 2, dtype=self.dtype, name="body_2")(x))
        x = lrelu(Conv2d(self.nf, 3, 2, 2, dtype=self.dtype, name="body_4")(x))
        x = SpatialAttention(dtype=self.dtype, name="body_6")(x)
        x = lrelu(ConvTranspose2d(self.nf, 3, 2, 2, 0, dtype=self.dtype, name="body_7")(x))
        x = lrelu(ConvTranspose2d(self.nf, 3, 2, 2, 1, dtype=self.dtype, name="body_9")(x))
        x = lrelu(Conv2d(self.in_f, 3, 1, 1, dtype=self.dtype, name="body_11")(x))
        return x


class SideToFeaOne(nn.Module):
    """Two 3x3 convs + lrelu (`arch/SIDECVSR_our.py:1716-1732`)."""

    nf: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, side):
        x = lrelu(Conv2d(self.nf, 3, 1, 1, dtype=self.dtype, name="body_0")(side))
        x = lrelu(Conv2d(self.nf, 3, 1, 1, dtype=self.dtype, name="body_2")(x))
        return x


class SideToFea(nn.Module):
    """Four 3x3 convs + lrelu, 3-channel input (`arch/SIDECVSR_our.py:1696-1712`)."""

    nf: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, side):
        x = side
        for i in range(4):
            x = lrelu(Conv2d(self.nf, 3, 1, 1, dtype=self.dtype, name=f"body_{2*i}")(x))
        return x


class PartitionTransformerSA2(nn.Module):
    """Partition-prior-injected MDTA feature extractor (shared weights /round).

    forward(x1=image features, x2=partition features) — three rounds of:
        x2 = side(x2) + (x1 if round 0 else x2)
        x1 = x1 + attn(norm1(x1))
        x1 = x1 + conv(norm2(x1)) + x2
    """

    dim: int = 64
    num_heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2):
        norm1 = ChannelLayerNorm(self.dim, dtype=self.dtype, name="norm1")
        norm2 = ChannelLayerNorm(self.dim, dtype=self.dtype, name="norm2")
        attn = MDTA(self.dim, self.num_heads, use_bias=False, dtype=self.dtype,
                    name="attn")
        conv = Conv2d(self.dim, 3, 1, 1, dtype=self.dtype, name="conv")
        side = SideToFeaUDSA2(self.dim, nf=16, dtype=self.dtype,
                              name="side_to_feaoneUDSA")

        x2 = side(x2) + x1
        x1 = x1 + attn(norm1(x1))
        x1 = x1 + conv(norm2(x1)) + x2
        x2 = side(x2) + x2
        x1 = x1 + attn(norm1(x1))
        x1 = x1 + conv(norm2(x1)) + x2
        x2 = side(x2) + x2
        x1 = x1 + attn(norm1(x1))
        x1 = x1 + conv(norm2(x1)) + x2
        return x1


class _LNParams(nn.Module):
    """Raw ChannelLayerNorm params (same tree paths: weight, bias)."""

    dim: int

    @nn.compact
    def __call__(self):
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        return w, b


class _MDTAParams(nn.Module):
    """Raw MDTA params, tree-path identical to :class:`MDTA` (bias-free
    convs): temperature, qkv/conv/kernel, qkv_dwconv/conv/kernel,
    project_out/conv/kernel."""

    dim: int
    num_heads: int

    @nn.compact
    def __call__(self):
        from .layers import torch_conv_kernel_init

        class _K(nn.Module):
            shape: tuple

            @nn.compact
            def __call__(inner):
                class _Raw(nn.Module):
                    shape: tuple

                    @nn.compact
                    def __call__(r):
                        return r.param("kernel", torch_conv_kernel_init,
                                       r.shape)

                return _Raw(inner.shape, name="conv")()

        temp = self.param("temperature", nn.initializers.ones,
                          (self.num_heads, 1, 1))
        kqkv = _K((1, 1, self.dim, self.dim * 3), name="qkv")()
        kdw = _K((3, 3, 1, self.dim * 3), name="qkv_dwconv")()
        kproj = _K((1, 1, self.dim, self.dim), name="project_out")()
        return temp, kqkv, kdw, kproj


class PartitionTransformerSA2Fast(nn.Module):
    """PartitionTransformerSA2 on the fused-kernel HCW path
    (`ops/fused_mdta.py`): numerically identical math, param-tree
    identical (same norm1/norm2/attn/conv/side_to_feaoneUDSA paths), but
    each round runs as two Pallas passes + an (8, 8)-per-head XLA softmax
    instead of ~15 XLA HBM passes. The side branch (16-channel U-Net)
    stays on the XLA path — it is cheap and stride-2 shaped."""

    dim: int = 64
    num_heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2):
        from ..ops.fused_mdta import (attention_matrix, mdta_stage1,
                                      mdta_stage2)
        from .trunk_fast import _ConvParams
        from ..ops.fused_block import dual_weights

        n1w, n1b = _LNParams(self.dim, name="norm1")()
        n2w, n2b = _LNParams(self.dim, name="norm2")()
        temp, kqkv, kdw, kproj = _MDTAParams(self.dim, self.num_heads,
                                             name="attn")()
        kconv, bconv = _ConvParams(3, 3, self.dim, self.dim,
                                   scaled_init=False, name="conv")()
        side = SideToFeaUDSA2(self.dim, nf=16, dtype=self.dtype,
                              name="side_to_feaoneUDSA")

        dt = self.dtype
        m, h, w, c = x1.shape
        rows = 16
        hp = h + (-h) % rows
        wt = -(-w // 128) * 128
        rpad = hp - h

        def to_hcw(t_nhwc):  # -> (M, hp, C, wt), data at lane 0
            t = jnp.transpose(t_nhwc.astype(dt), (0, 1, 3, 2))
            return jnp.pad(t, ((0, 0), (0, rpad), (0, 0), (0, wt - w)))

        def pad_hcw(t_hcw):  # -> (M, hp+2, C, wt+128) stage input
            return jnp.pad(t_hcw, ((0, 0), (1, 1), (0, 0), (2, 126)))

        # packed weights (shared across the three rounds)
        wqkv_t = kqkv[0, 0].T.astype(dt)                     # (3c, c)
        dwk = jnp.transpose(kdw[:, :, 0, :], (2, 0, 1)).reshape(
            3 * c, 9).astype(jnp.float32)                    # (3c, 9)
        wproj_t = kproj[0, 0].T.astype(dt)                   # (c, c)
        wconv_d = dual_weights(kconv).astype(dt)             # (c, 9c)
        n1w_ = n1w.reshape(-1, 1).astype(jnp.float32)
        n1b_ = n1b.reshape(-1, 1).astype(jnp.float32)
        n2w_ = n2w.reshape(-1, 1).astype(jnp.float32)
        n2b_ = n2b.reshape(-1, 1).astype(jnp.float32)
        bconv_ = bconv.reshape(-1, 1).astype(jnp.float32)

        x1h = to_hcw(x1)
        x2n = x2
        for r in range(3):
            x2n = side(x2n) + (x1 if r == 0 else x2n)
            x2h = to_hcw(x2n)
            v, stats = mdta_stage1(pad_hcw(x1h), n1w_, n1b_, wqkv_t, dwk,
                                   img_h=h, img_w=w, rows=rows, wt=wt)
            amat = attention_matrix(stats, temp, self.num_heads).astype(dt)
            x1h = mdta_stage2(pad_hcw(x1h), pad_hcw(v), x2h, amat,
                              wproj_t, n2w_, n2b_, wconv_d, bconv_,
                              img_h=h, img_w=w, rows=rows, wt=wt)
        out = x1h[:, :h, :, :w]
        return jnp.transpose(out, (0, 1, 3, 2))


class SideToFeaUD(nn.Module):
    """Stride-2 U encoder without spatial attention
    (`arch/SIDECVSR_our.py:1736-1756`); 1-channel in/out."""

    nf: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, side):
        x = lrelu(Conv2d(self.nf, 3, 2, 2, dtype=self.dtype, name="body_0")(side))
        x = lrelu(Conv2d(self.nf, 3, 2, 2, dtype=self.dtype, name="body_2")(x))
        x = lrelu(Conv2d(self.nf, 3, 1, 1, dtype=self.dtype, name="body_4")(x))
        x = lrelu(ConvTranspose2d(self.nf, 3, 2, 2, 0, dtype=self.dtype, name="body_6")(x))
        x = lrelu(ConvTranspose2d(self.nf, 3, 2, 2, 1, dtype=self.dtype, name="body_8")(x))
        x = lrelu(Conv2d(1, 3, 1, 1, dtype=self.dtype, name="body_10")(x))
        return x


class SideToFeaUDK(nn.Module):
    """Like SideToFeaUD but in_f-channel in/out (`:1760-1780`)."""

    in_f: int
    nf: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, side):
        x = lrelu(Conv2d(self.nf, 3, 2, 2, dtype=self.dtype, name="body_0")(side))
        x = lrelu(Conv2d(self.nf, 3, 2, 2, dtype=self.dtype, name="body_2")(x))
        x = lrelu(Conv2d(self.nf, 3, 1, 1, dtype=self.dtype, name="body_4")(x))
        x = lrelu(ConvTranspose2d(self.nf, 3, 2, 2, 0, dtype=self.dtype, name="body_6")(x))
        x = lrelu(ConvTranspose2d(self.nf, 3, 2, 2, 1, dtype=self.dtype, name="body_8")(x))
        x = lrelu(Conv2d(self.in_f, 3, 1, 1, dtype=self.dtype, name="body_10")(x))
        return x


# SideToFeaUDSA (non-_2) has the identical layer stack to UDSA_2
# (`:1786-1809` vs `:1815-1834`); alias for inventory clarity.
SideToFeaUDSA = SideToFeaUDSA2


class TransformerBlockSimple(nn.Module):
    """TransformerBlock (`:1317-1336`): a single norm+MDTA residual (the
    ffn/conv branches are commented out in the reference)."""

    dim: int = 64
    num_heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x + MDTA(self.dim, self.num_heads, dtype=self.dtype, name="attn")(
            ChannelLayerNorm(self.dim, dtype=self.dtype, name="norm1")(x))
        return x


class PartitionTransformerSA(nn.Module):
    """`:1371-1398`: four rounds of {fresh side encode (NOT accumulated),
    attn + side add, conv} with shared weights."""

    dim: int = 64
    num_heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2):
        norm1 = ChannelLayerNorm(self.dim, dtype=self.dtype, name="norm1")
        norm2 = ChannelLayerNorm(self.dim, dtype=self.dtype, name="norm2")
        attn = MDTA(self.dim, self.num_heads, dtype=self.dtype, name="attn")
        conv = Conv2d(self.dim, 3, 1, 1, dtype=self.dtype, name="conv")
        side = SideToFeaUDSA2(self.dim, nf=16, dtype=self.dtype,
                              name="side_to_feaoneUDSA")
        for _ in range(4):
            x2 = side(x2)
            x1 = x1 + attn(norm1(x1)) + x2
            x1 = x1 + conv(norm2(x1))
        return x1


class PartitionTransformerSA1(nn.Module):
    """`:1403-1436`: the 3-round variant of PartitionTransformerSA."""

    dim: int = 64
    num_heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2):
        norm1 = ChannelLayerNorm(self.dim, dtype=self.dtype, name="norm1")
        norm2 = ChannelLayerNorm(self.dim, dtype=self.dtype, name="norm2")
        attn = MDTA(self.dim, self.num_heads, dtype=self.dtype, name="attn")
        conv = Conv2d(self.dim, 3, 1, 1, dtype=self.dtype, name="conv")
        side = SideToFeaUDSA2(self.dim, nf=16, dtype=self.dtype,
                              name="side_to_feaoneUDSA")
        for _ in range(3):
            x2 = side(x2)
            x1 = x1 + attn(norm1(x1)) + x2
            x1 = x1 + conv(norm2(x1))
        return x1


class PartitionTransformerSAWoPAB(nn.Module):
    """Ablation: no partition branch (`arch/SIDECVSR_our.py:1480-1514`)."""

    dim: int = 64
    num_heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x1):
        norm1 = ChannelLayerNorm(self.dim, dtype=self.dtype, name="norm1")
        norm2 = ChannelLayerNorm(self.dim, dtype=self.dtype, name="norm2")
        attn = MDTA(self.dim, self.num_heads, use_bias=False, dtype=self.dtype,
                    name="attn")
        conv = Conv2d(self.dim, 3, 1, 1, dtype=self.dtype, name="conv")
        for _ in range(3):
            x1 = x1 + attn(norm1(x1))
            x1 = x1 + conv(norm2(x1))
        return x1
