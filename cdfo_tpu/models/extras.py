"""Remaining library modules from the reference inventory (SURVEY §2.2):
alternative trunks (AGG*/RiR*), flow-guided window MSA, GDN/EMVNet motion
autoencoder, temporal correlation blocks, ghost conv, DSTA.

All NHWC flax. Reference lines in `/root/reference/arch/SIDECVSR_our.py`
unless noted.
"""
from __future__ import annotations

import math
from typing import Any, List, Sequence

import jax
import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn

from ..ops.deform_conv import deform_conv2d
from ..ops.resize import interpolate_bilinear
from ..ops.warp import flow_warp
from .dcn import _ref_weight_init
from .layers import Conv2d, ConvTranspose2d, lrelu
from .trunk import BlockPyr, SCGroupPyr

Dtype = Any


class AGGSCGroup(nn.Module):
    """AGG trunk group (`:528-546`) — AGGBlock (`:487-524`) is numerically
    identical to the pyramid Block, so it reuses BlockPyr."""

    nf: int = 64
    back_rbs: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_list):
        r = list(x_list)
        for i in range(self.back_rbs):
            r = BlockPyr(self.nf, dtype=self.dtype, name=f"body_{i}")(r)
        conv = Conv2d(self.nf, 3, 1, 1, dtype=self.dtype, name="conv")
        return [x + conv(t) for x, t in zip(x_list, r)]


class AGGSCNet(nn.Module):
    """`:550-565` (note: the reference stacks plain SCGroups here)."""

    nf: int = 64
    num_groups: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_list):
        r = list(x_list)
        for i in range(self.num_groups):
            r = SCGroupPyr(self.nf, dtype=self.dtype, name=f"body_{i}")(r)
        return [x + t for x, t in zip(x_list, r)]


class RiRGroup(nn.Module):
    """Residual-in-residual group (`:569-587`): 3x (conv nf->4nf, lrelu,
    conv 4nf->nf, lrelu) + 3x3 conv + skip."""

    nf: int = 64
    back_rbs: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        r = x
        for i in range(self.back_rbs):
            r = lrelu(Conv2d(self.nf * 4, 3, 1, 1, dtype=self.dtype,
                             name=f"body_{4*i}")(r))
            r = lrelu(Conv2d(self.nf, 3, 1, 1, dtype=self.dtype,
                             name=f"body_{4*i+2}")(r))
        r = Conv2d(self.nf, 3, 1, 1, dtype=self.dtype, name="conv")(r)
        return x + r


class RinRNet(nn.Module):
    """`:591-604`."""

    nf: int = 64
    num_groups: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        r = x
        for i in range(self.num_groups):
            r = RiRGroup(self.nf, dtype=self.dtype, name=f"body_{i}")(r)
        return x + r


class FGSWMSA(nn.Module):
    """Flow-guided sparse window MSA (`:3740-3825`): keys from two
    neighbour frames nearest-resampled along the flow, (8x8) windows with
    a (3*8*8)-token key set."""

    dim: int = 64
    window_size: tuple = (3, 8, 8)
    dim_head: int = 32
    heads: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q_inp, k_f, k_r, flow):
        b, h, w, c = q_inp.shape
        fb, hb, wb = self.window_size
        inner = self.dim_head * self.heads
        scale = self.dim_head ** -0.5

        if flow is not None:
            k_f = flow_warp(k_f, flow, interp_mode="nearest")
            k_r = flow_warp(k_r, flow, interp_mode="nearest")

        norm_q = nn.LayerNorm(dtype=self.dtype, name="norm_q")
        norm_kv = nn.LayerNorm(dtype=self.dtype, name="norm_kv")
        q = Conv2d(inner, 3, 1, 1, use_bias=False, dtype=self.dtype,
                   name="to_q")(norm_q(q_inp))
        to_kv = Conv2d(inner * 2, 3, 1, 1, use_bias=False, dtype=self.dtype,
                       name="to_kv")
        kv_f = to_kv(norm_kv(k_f))
        kv_r = to_kv(norm_kv(k_r))
        k = jnp.stack([kv_f[..., :inner], kv_r[..., :inner]], axis=1)
        v = jnp.stack([kv_f[..., inner:], kv_r[..., inner:]], axis=1)

        def window(t, f):
            return rearrange(t, "b f (h p1) (w p2) c -> (b h w) (f p1 p2) c",
                             p1=hb, p2=wb, f=f)

        qw = window(q[:, None], 1)
        kw = window(k, 2)
        vw = window(v, 2)

        def heads_split(t):
            return rearrange(t, "t n (h d) -> t h n d", h=self.heads)

        qw, kw, vw = heads_split(qw), heads_split(kw), heads_split(vw)
        sim = jnp.einsum("thid,thjd->thij", qw * scale, kw)
        attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(vw.dtype)
        out = jnp.einsum("thij,thjd->thid", attn, vw)
        out = rearrange(out, "t h n d -> t n (h d)")
        out = rearrange(out, "(b h w) (f p1 p2) c -> (b f) (h p1) (w p2) c",
                        b=b, h=h // hb, w=w // wb, p1=hb, p2=wb)
        out = Conv2d(self.dim, 3, 1, 1, use_bias=False, dtype=self.dtype,
                     name="to_out")(out)
        return out.reshape(b, h, w, self.dim)


def lower_bound(x, bound):
    """LowerBound custom grad (`:3830-3844`): identity-through when above
    the bound or when the gradient pushes up."""

    @jax.custom_vjp
    def lb(x):
        return jnp.maximum(x, bound)

    def fwd(x):
        return jnp.maximum(x, bound), x

    def bwd(x, g):
        passthrough = (x >= bound) | (g < 0)
        return (jnp.where(passthrough, g, 0.0),)

    lb.defvjp(fwd, bwd)
    return lb(x)


class GDN(nn.Module):
    """Generalized divisive normalization (`:3848-3915`), NHWC:
    y_i = x_i / sqrt(beta_i + sum_j gamma_ji x_j^2)."""

    ch: int
    inverse: bool = False
    beta_min: float = 1e-6
    gamma_init: float = 0.1
    reparam_offset: float = 2 ** -18
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pedestal = self.reparam_offset ** 2
        beta_bound = (self.beta_min + pedestal) ** 0.5
        gamma_bound = self.reparam_offset
        beta = self.param("beta",
                          lambda k, s: jnp.sqrt(jnp.ones(s) + pedestal),
                          (self.ch,))
        gamma = self.param(
            "gamma",
            lambda k, s: jnp.sqrt(self.gamma_init * jnp.eye(self.ch) + pedestal),
            (self.ch, self.ch))
        beta = lower_bound(beta, beta_bound) ** 2 - pedestal
        gamma = lower_bound(gamma, gamma_bound) ** 2 - pedestal
        norm = jnp.einsum("bhwj,ji->bhwi", jnp.square(x), gamma) + beta
        norm = jnp.sqrt(norm)
        return x * norm if self.inverse else x / norm


class EMVNet(nn.Module):
    """MV enhancement autoencoder (`:3974-4034`). The shipped forward only
    runs conv1+gdn1 then deconv4 (the middle is commented out) — reproduced
    as such; the full encoder/decoder params exist for capability parity."""

    out_channel_n: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, flow):
        n = self.out_channel_n
        x = Conv2d(n, 3, 2, 2, dtype=self.dtype, name="conv1")(flow)
        x = GDN(n, dtype=self.dtype, name="gdn1")(x)
        return ConvTranspose2d(2, 3, 2, 2, 1, dtype=self.dtype,
                               name="deconv4")(x)


class LocalCorr(nn.Module):
    """Temporal correlation aggregation (`:3919-3951`): per-pixel cosine
    correlation between the reference feature and a 3x3 neighbourhood of
    each neighbour frame, softmax-aggregated, deviation-weighted."""

    nf: int = 64
    nbr_size: int = 3
    alpha: float = -1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, nbr_list: Sequence[jnp.ndarray], ref: jnp.ndarray):
        k = self.nbr_size
        pad = k // 2
        mean = jax.lax.stop_gradient(jnp.mean(jnp.stack(nbr_list, 1), axis=1))
        refn = jax.lax.stop_gradient(ref)
        refn = refn / jnp.maximum(
            jnp.linalg.norm(refn, axis=-1, keepdims=True), 1e-12)
        outs = []
        for nbr in nbr_list:
            wdiff = jnp.exp(self.alpha * jnp.square(nbr - mean))
            npad = jnp.pad(nbr, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                           mode="reflect")
            h, w = nbr.shape[1:3]
            patches = jnp.stack(
                [npad[:, dy:dy + h, dx:dx + w] for dy in range(k)
                 for dx in range(k)], axis=3)           # (B,H,W,9,C)
            patches = patches / jnp.maximum(
                jnp.linalg.norm(patches, axis=-1, keepdims=True), 1e-12)
            d = jnp.einsum("bhwc,bhwnc->bhwn", refn, patches)
            wt = jax.nn.softmax(d, axis=-1)
            agg = jnp.einsum("bhwn,bhwnc->bhwc", wt, patches)
            outs.append(agg * wdiff)
        return jnp.stack(outs + [ref], axis=1)


class MotionFeaFusion(nn.Module):
    """Gated m0/m1 fusion (`:3955-3970`)."""

    nf: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, m0, m1):
        weighting = jax.nn.sigmoid(Conv2d(self.nf, 3, 1, 1, dtype=self.dtype,
                                          name="scaleing_0")(
            jnp.concatenate([m0, m1], axis=-1)))
        mf = jnp.concatenate([weighting * m0, (1.0 - weighting) * m1], axis=-1)
        return lrelu(Conv2d(self.nf, 3, 1, 1, dtype=self.dtype,
                            name="conv_out")(mf))


class ConvUnit(nn.Module):
    """`:2121-2139`: conv + optional activation."""

    num_out: int
    kernel_size: int = 1
    stride: int = 1
    padding: int = 0
    groups: int = 1
    use_act: bool = True
    act_type: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = Conv2d(self.num_out, self.kernel_size, self.stride, self.padding,
                   groups=self.groups, dtype=self.dtype, name="conv")(x)
        if self.use_act:
            y = jax.nn.relu(y) if self.act_type == "relu" else lrelu(y)
        return y


class GhostModuleMul(nn.Module):
    """Ghost conv with gating (`:4038-4083`). The reference passes an
    invalid ``num_groups`` kwarg to nn.Conv2d (dead code, crashes if
    instantiated); repaired here with ``groups``."""

    num_in: int
    num_out: int
    kernel_size: int = 1
    ratio: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        init_ch = math.ceil(self.num_out / self.ratio)
        res = Conv2d(self.num_out, self.kernel_size, 1,
                     self.kernel_size // 2, dtype=self.dtype,
                     name="short_conv_0")(x)
        res = Conv2d(self.num_out, (1, 5), 1, (0, 2), groups=self.num_out,
                     dtype=self.dtype, name="short_conv_1")(res)
        res = Conv2d(self.num_out, (5, 1), 1, (2, 0), groups=self.num_out,
                     dtype=self.dtype, name="short_conv_2")(res)
        res = jax.nn.sigmoid(res)
        x1 = lrelu(Conv2d(init_ch, 3, 1, 1, dtype=self.dtype,
                          name="primary_conv_0")(x))
        x2 = lrelu(Conv2d(init_ch, 3, 1, 1, dtype=self.dtype,
                          name="cheap_operation_0")(x1))
        out = jnp.concatenate([x1, x2], axis=-1)
        return out * res


def _max_pool(x, k, s):
    return -jax.lax.reduce_window(-x, jnp.inf, jax.lax.min,
                                  (1, k, k, 1), (1, s, s, 1), "VALID")


class DSTA(nn.Module):
    """Deformable spatio-temporal attention (`ops/attentionlayer.py:12-82`,
    defined twice identically in the reference): downsampled saliency branch
    with a per-channel-group modulated DCN, channel gate, upsampled spatial
    mask."""

    n_feats: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        f = self.n_feats // 4
        c1_ = Conv2d(f, 1, 1, 0, dtype=self.dtype, name="conv1")(x)
        c1 = Conv2d(f, 3, 2, 0, dtype=self.dtype, name="conv2")(c1_)
        v_max = _max_pool(c1, 7, 3)
        v_range = jax.nn.relu(Conv2d(f, 3, 1, 1, dtype=self.dtype,
                                     name="conv_max")(v_max))
        c3 = jax.nn.relu(Conv2d(f, 3, 1, 1, dtype=self.dtype, name="conv3")(v_range))
        c3 = jax.nn.relu(Conv2d(f, 3, 1, 1, dtype=self.dtype, name="conv3_")(c3))
        dc3 = jax.nn.relu(Conv2d(f, 3, 2, 1, dtype=self.dtype,
                                 name="down_conv2_0")(c3))
        off_mask2 = Conv2d(f * 27, 3, 1, 1, dtype=self.dtype, name="mask2")(dc3)
        off_msk = Conv2d(f * 27, 3, 1, 1, dtype=self.dtype, name="mask")(c3)
        off_mask2 = interpolate_bilinear(
            off_mask2, size=(off_msk.shape[1], off_msk.shape[2]))
        off_msk = off_msk + off_mask2
        off = off_msk[..., :f * 18]
        msk = jax.nn.sigmoid(off_msk[..., f * 18:])
        weight = self.param("dcn_weight", _ref_weight_init(f), (3, 3, f, f))
        bias = self.param("dcn_bias", nn.initializers.zeros, (f,))
        c3 = deform_conv2d(v_max, off, weight.astype(self.dtype), bias=bias,
                           mask=msk, padding=1)
        c3 = jax.nn.relu(c3)
        y = jnp.mean(c3, axis=(1, 2), keepdims=True)
        y = Conv2d(2 * f, 1, 1, 0, dtype=self.dtype, name="conv_du_0")(y)
        y = jax.nn.relu(y)
        y = Conv2d(self.n_feats, 1, 1, 0, dtype=self.dtype, name="conv_du_2")(y)
        y = jax.nn.sigmoid(y)
        c3 = interpolate_bilinear(c3, size=(x.shape[1], x.shape[2]))
        cf = Conv2d(f, 1, 1, 0, dtype=self.dtype, name="conv_f")(c1_)
        c4 = Conv2d(self.n_feats, 1, 1, 0, dtype=self.dtype, name="conv4")(c3 + cf)
        m = jax.nn.sigmoid(c4)
        return x * m * y
