"""Swin-IR style transformer stack (reference `arch/SIDECVSR_our.py:641-1115`
— WindowAttention, Mlp, window partition/reverse, SwinTransformerBlock,
BasicLayer, RSTB, PatchEmbed/UnEmbed; present in the reference as unused
library weight, rebuilt here NHWC for inventory parity).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn

Dtype = Any


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nW, ws, ws, C) (`:747-758`)."""
    return rearrange(x, "b (h wh) (w ww) c -> (b h w) wh ww c", wh=ws, ww=ws)


def window_reverse(windows: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    """inverse of :func:`window_partition` (`:762-775`)."""
    return rearrange(windows, "(b h w) wh ww c -> b (h wh) (w ww) c",
                     h=h // ws, w=w // ws)


def _relative_position_index(ws: tuple[int, int]) -> np.ndarray:
    ch = np.arange(ws[0])
    cw = np.arange(ws[1])
    coords = np.stack(np.meshgrid(ch, cw, indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws[0] - 1
    rel[:, :, 1] += ws[1] - 1
    rel[:, :, 0] *= 2 * ws[1] - 1
    return rel.sum(-1)


class WindowAttention(nn.Module):
    """W-MSA with relative position bias (`:641-720`)."""

    dim: int
    window_size: tuple = (8, 8)
    num_heads: int = 8
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        b_, n, c = x.shape
        heads = self.num_heads
        head_dim = c // heads
        scale = head_dim ** -0.5
        ws = self.window_size
        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws[0] - 1) * (2 * ws[1] - 1), heads))
        rel_idx = jnp.asarray(_relative_position_index(ws))

        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                       param_dtype=jnp.float32, name="qkv")(x)
        qkv = qkv.reshape(b_, n, 3, heads, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k)
        rpb = bias_table[rel_idx.reshape(-1)].reshape(n, n, heads)
        attn = attn + rpb.transpose(2, 0, 1)[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, heads, n, n) + mask[None, :, None]
            attn = attn.reshape(b_, heads, n, n)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="proj")(out)


class Mlp(nn.Module):
    """fc-GELU-fc (`:727-743`)."""

    hidden: int
    out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc1")(x)
        x = jax.nn.gelu(x, approximate=False)
        return nn.Dense(self.out, dtype=self.dtype, param_dtype=jnp.float32,
                        name="fc2")(x)


def _shift_attn_mask(h: int, w: int, ws: int, shift: int) -> jnp.ndarray:
    img_mask = np.zeros((1, h, w, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[:, hs, wsl, :] = cnt
            cnt += 1
    mw = np.asarray(window_partition(jnp.asarray(img_mask), ws)).reshape(-1, ws * ws)
    attn_mask = mw[:, None, :] - mw[:, :, None]
    return jnp.asarray(np.where(attn_mask != 0, -100.0, 0.0))


class SwinTransformerBlock(nn.Module):
    """(shifted-)window MSA + MLP block (`:803-900` region)."""

    dim: int
    num_heads: int = 8
    window_size: int = 8
    shift_size: int = 0
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_size):
        h, w = x_size
        b, l, c = x.shape
        ws, shift = self.window_size, self.shift_size
        shortcut = x
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x.reshape(b, h, w, c)
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = _shift_attn_mask(h, w, ws, shift)
        else:
            mask = None
        xw = window_partition(x, ws).reshape(-1, ws * ws, c)
        attn = WindowAttention(self.dim, (ws, ws), self.num_heads,
                               dtype=self.dtype, name="attn")(xw, mask)
        x = window_reverse(attn.reshape(-1, ws, ws, c), ws, h, w)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = shortcut + x.reshape(b, l, c)
        x = x + Mlp(int(self.dim * self.mlp_ratio), self.dim,
                    dtype=self.dtype, name="mlp")(
            nn.LayerNorm(dtype=self.dtype, name="norm2")(x))
        return x


class BasicLayer(nn.Module):
    """stack of Swin blocks with alternating shift (`:905-1000` region)."""

    dim: int
    depth: int = 6
    num_heads: int = 8
    window_size: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_size):
        for i in range(self.depth):
            x = SwinTransformerBlock(
                self.dim, self.num_heads, self.window_size,
                0 if i % 2 == 0 else self.window_size // 2,
                dtype=self.dtype, name=f"blocks_{i}")(x, x_size)
        return x


class RSTB(nn.Module):
    """Residual Swin Transformer Block: BasicLayer + 3x3 conv + skip
    (`:1030-1115` region)."""

    dim: int
    depth: int = 6
    num_heads: int = 8
    window_size: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_size):
        from .layers import Conv2d

        h, w = x_size
        res = BasicLayer(self.dim, self.depth, self.num_heads,
                         self.window_size, dtype=self.dtype,
                         name="residual_group")(x, x_size)
        b, l, c = res.shape
        img = res.reshape(b, h, w, c)
        img = Conv2d(self.dim, 3, 1, 1, dtype=self.dtype, name="conv")(img)
        return img.reshape(b, l, c) + x


class PatchEmbed(nn.Module):
    """(B, H, W, C) -> (B, H*W, C) tokens with optional norm (`:779-820`)."""

    use_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        t = x.reshape(b, h * w, c)
        if self.use_norm:
            t = nn.LayerNorm(dtype=self.dtype, name="norm")(t)
        return t


class PatchUnEmbed(nn.Module):
    """(B, H*W, C) -> (B, H, W, C)."""

    @nn.compact
    def __call__(self, x, x_size):
        b, l, c = x.shape
        return x.reshape(b, x_size[0], x_size[1], c)
