"""EGLA ablations, residual-guided attention blocks, and the attention
library used by the non-V8 model variants.

All NHWC. Reference line ranges cited per class (all in
`/root/reference/arch/SIDECVSR_our.py` unless noted).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn

from .attention import _conv9_along, _l2_normalize
from .layers import CALayer, Conv2d, lrelu
from ..ops.resize import interpolate_bilinear

Dtype = Any


def gumbel_softmax(key, logits, axis=-1, tau: float = 1.0):
    """Reference gumbel trick (`:2168-2177`): uniform noise, double-log."""
    u = jax.random.uniform(key, logits.shape,
                           minval=jnp.finfo(jnp.float32).tiny, maxval=1.0)
    g = -jnp.log(-jnp.log(u))
    return jax.nn.softmax((logits + g) / tau, axis=axis)


def _sample_mask(mod: nn.Module, logits):
    """Shared gumbel/expected channel-mask sampling (reads ``mod.mask_mode``)."""
    if mod.mask_mode == "sample":
        return gumbel_softmax(mod.make_rng("gumbel"), logits, axis=-1)
    return jax.nn.softmax(logits, axis=-1)


class EGLAwoLA(nn.Module):
    """LLongRangAttention_woLA (`:2255-2324`): long-range row/column
    attention only, no residual mask, no window branch. Note the row query
    is the FULL 2C-channel projection (the reference's rearrange keeps both
    halves), while v is the C-channel second half."""

    in_dim: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x_ = Conv2d(self.in_dim * 2, 1, 1, 0, dtype=self.dtype, name="input_conv")(x)
        _, v_full = jnp.split(x_, 2, axis=-1)
        w1_k = self.param("directW1_kernel", nn.initializers.normal(0.1), (9,))
        w1_b = self.param("directW1_bias", nn.initializers.zeros, ())
        h1_k = self.param("directH1_kernel", nn.initializers.normal(0.1), (9,))
        h1_b = self.param("directH1_bias", nn.initializers.zeros, ())

        q_r = rearrange(x_, "b h w c -> (b h) w c")  # 2C channels
        v_r = rearrange(v_full, "b h w c -> (b h) w c")
        sparse_q = _conv9_along(q_r, w1_k, w1_b, axis=2)
        v_r = _conv9_along(v_r, w1_k, w1_b, axis=2)
        atn = jax.nn.softmax(jnp.einsum("twc,tvc->twv", sparse_q, sparse_q)
                             .astype(jnp.float32), axis=-1).astype(x.dtype)
        v_r = jnp.einsum("twv,tvc->twc", atn, v_r)
        q_c = rearrange(sparse_q, "(b h) w c -> (b w) h c", b=b)
        q_c = _conv9_along(q_c, h1_k, h1_b, axis=1)
        v_c = rearrange(v_r, "(b h) w c -> (b w) h c", b=b)
        atn = jax.nn.softmax(jnp.einsum("thc,tgc->thg", q_c, q_c)
                             .astype(jnp.float32), axis=-1).astype(x.dtype)
        long_out = jnp.einsum("thg,tgc->thc", atn, v_c)
        long_out = rearrange(long_out, "(b w) h c -> b h w c", b=b)
        return long_out + x


class EGLAwoGA(nn.Module):
    """LLongRangAttention_woGA (`:2330-2456`): 8x8 window attention only,
    unmasked; signature keeps (res, x) for drop-in parity."""

    in_dim: int = 64
    window_size: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, res, x):
        b, h, w, c = x.shape
        x_ = Conv2d(self.in_dim * 2, 1, 1, 0, dtype=self.dtype, name="input_conv")(x)
        q_full, v_full = jnp.split(x_, 2, axis=-1)
        ws = self.window_size
        q_w = rearrange(q_full, "b (h dh) (w dw) c -> (b h w) (dh dw) c", dh=ws, dw=ws)
        v_w = rearrange(v_full, "b (h dh) (w dw) c -> (b h w) (dh dw) c", dh=ws, dw=ws)
        atn = jax.nn.softmax(jnp.einsum("tpc,tqc->tpq", q_w, q_w)
                             .astype(jnp.float32), axis=-1).astype(x.dtype)
        loc = jnp.einsum("tpq,tqc->tpc", atn, v_w)
        loc = rearrange(loc, "(b h w) (dh dw) c -> b (h dh) (w dw) c",
                        h=h // ws, w=w // ws, dh=ws, dw=ws)
        return loc + x


class EGLA1(nn.Module):
    """LLongRangAttention_1 (`:2463-2574`): full-resolution sigmoid mask
    (3x 3x3 convs, no pooling), thresholded; row conv is (9,1) along
    positions (directW_conv) and column conv (1,9) along channels
    (directH_conv) — the swap of the main EGLA; row v is NOT convolved."""

    in_dim: int = 64
    window_size: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, res, x):
        b, h, w, c = x.shape
        v = Conv2d(self.in_dim, 3, 1, 1, dtype=self.dtype, name="conv_du_re_0")(res)
        v = jax.nn.relu(v)
        v = Conv2d(self.in_dim, 3, 1, 1, dtype=self.dtype, name="conv_du_re_2")(v)
        v = jax.nn.relu(v)
        v = Conv2d(self.in_dim, 3, 1, 1, dtype=self.dtype, name="conv_du_re_4")(v)
        rm = jax.nn.sigmoid(v.astype(jnp.float32))
        res_mask = jax.lax.stop_gradient((rm >= 0.5).astype(x.dtype))
        res_mask_inv = 1.0 - res_mask

        x_ = Conv2d(self.in_dim * 2, 1, 1, 0, dtype=self.dtype, name="input_conv")(x)
        q_full, v_full = jnp.split(x_, 2, axis=-1)
        w_k = self.param("directW_kernel", nn.initializers.normal(0.1), (9,))
        w_b = self.param("directW_bias", nn.initializers.zeros, ())
        h_k = self.param("directH_kernel", nn.initializers.normal(0.1), (9,))
        h_b = self.param("directH_bias", nn.initializers.zeros, ())

        q_r = rearrange(res_mask * q_full, "b h w c -> (b h) w c")
        v_r = rearrange(v_full, "b h w c -> (b h) w c")
        # directW_conv has kernel (9,1): conv along the position axis (w)
        sparse_q = _conv9_along(q_r, w_k, w_b, axis=1)
        atn = jax.nn.softmax(jnp.einsum("twc,tvc->twv", sparse_q, sparse_q)
                             .astype(jnp.float32), axis=-1).astype(x.dtype)
        v_r = jnp.einsum("twv,tvc->twc", atn, v_r)
        q_c = rearrange(sparse_q, "(b h) w c -> (b w) h c", b=b)
        # directH_conv has kernel (1,9): conv along channels
        q_c = _conv9_along(q_c, h_k, h_b, axis=2)
        v_c = rearrange(v_r, "(b h) w c -> (b w) h c", b=b)
        atn = jax.nn.softmax(jnp.einsum("thc,tgc->thg", q_c, q_c)
                             .astype(jnp.float32), axis=-1).astype(x.dtype)
        long_out = rearrange(jnp.einsum("thg,tgc->thc", atn, v_c),
                             "(b w) h c -> b h w c", b=b)

        ws = self.window_size
        q_w = rearrange(q_full, "b (h dh) (w dw) c -> (b h w) (dh dw) c", dh=ws, dw=ws)
        v_w = rearrange(v_full, "b (h dh) (w dw) c -> (b h w) (dh dw) c", dh=ws, dw=ws)
        m_w = rearrange(res_mask_inv, "b (h dh) (w dw) c -> (b h w) (dh dw) c",
                        dh=ws, dw=ws)
        sparse_qw = m_w * q_w
        atn = jax.nn.softmax(jnp.einsum("tpc,tqc->tpq", sparse_qw, sparse_qw)
                             .astype(jnp.float32), axis=-1).astype(x.dtype)
        loc = rearrange(jnp.einsum("tpq,tqc->tpc", atn, v_w),
                        "(b h w) (dh dw) c -> b (h dh) (w dw) c",
                        h=h // ws, w=w // ws, dh=ws, dw=ws)
        out = Conv2d(self.in_dim, 1, 1, 0, dtype=self.dtype, name="fuse")(
            jnp.concatenate([long_out, loc], axis=-1))
        return out + x


class RDAB(nn.Module):
    """Residual-map-guided attention block (`:2795-2846`), CVSR_V7's
    spatial-compensate module (`:4243,4306`): gumbel channel mask (GAP
    squeeze) + spatial-attention mask, gating a 1x1-conv feature branch."""

    channel: int = 64
    mask_mode: str = "sample"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, res, x_c):
        b, h, w, c = x_c.shape
        r = Conv2d(self.channel, 1, 1, 0, dtype=self.dtype, name="conv_du_re_0")(res)
        r = jax.nn.relu(r)
        r = Conv2d(self.channel, 3, 2, 2, dtype=self.dtype, name="conv_du_re_2")(r)
        r = jax.nn.relu(r)
        v = jnp.mean(r, axis=(1, 2), keepdims=True)
        v = Conv2d(self.channel, 1, 1, 0, dtype=self.dtype, name="conv_du_re2_0")(v)
        v = jax.nn.relu(v)
        v = jnp.broadcast_to(v, (b, h, w, c)).astype(jnp.float32)
        r_m = _sample_mask(self, v).astype(x_c.dtype)

        pooled = jnp.concatenate([jnp.max(x_c, axis=-1, keepdims=True),
                                  jnp.mean(x_c, axis=-1, keepdims=True)], axis=-1)
        att_m = jax.nn.sigmoid(
            Conv2d(1, 3, 1, 1, dtype=self.dtype, name="spatial")(pooled))
        x_f = Conv2d(self.channel, 1, 1, 0, dtype=self.dtype, name="conv_dc_0")(x_c)
        x_f = lrelu(x_f)
        x_f = Conv2d(self.channel, 1, 1, 0, dtype=self.dtype, name="conv_dc_2")(x_f)
        out = x_f * (r_m + att_m)
        out = Conv2d(self.channel, 1, 1, 0, dtype=self.dtype, name="conv_df_0")(out)
        return lrelu(out)


class RDABS(nn.Module):
    """RDAB_S (`:2734-2790`): 3x3 max-pool on the residual features (note:
    stride 1, unpadded -> shrinks by 2 then bilinear-resizes back), gumbel
    mask + CALayer-style channel attention mask."""

    channel: int = 64
    reduction: int = 16
    mask_mode: str = "sample"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, res, x_c):
        r = Conv2d(self.channel, 1, 1, 0, dtype=self.dtype, name="conv_du_re_0")(res)
        r = jax.nn.relu(r)
        r = Conv2d(self.channel, 3, 2, 2, dtype=self.dtype, name="conv_du_re_2")(r)
        r = jax.nn.relu(r)
        v = -jax.lax.reduce_window(-r, jnp.inf, jax.lax.min,  # max-pool k3 s1
                                   (1, 3, 3, 1), (1, 1, 1, 1), "VALID")
        v = Conv2d(self.channel, 1, 1, 0, dtype=self.dtype, name="conv_du_re2_0")(v)
        v = jax.nn.relu(v)
        v = interpolate_bilinear(v, size=(res.shape[1], res.shape[2]))
        r_m = _sample_mask(self, v.astype(jnp.float32)).astype(x_c.dtype)

        g = jnp.mean(x_c, axis=(1, 2), keepdims=True)
        g = Conv2d(self.channel // self.reduction, 1, 1, 0, dtype=self.dtype,
                   name="conv_du_am_0")(g)
        g = jax.nn.relu(g)
        g = Conv2d(self.channel, 1, 1, 0, dtype=self.dtype, name="conv_du_am_2")(g)
        att_m = jax.nn.sigmoid(g)
        x_f = Conv2d(self.channel, 1, 1, 0, dtype=self.dtype, name="conv_dc_0")(x_c)
        x_f = lrelu(x_f)
        x_f = Conv2d(self.channel, 1, 1, 0, dtype=self.dtype, name="conv_dc_2")(x_f)
        out = x_f * (r_m + att_m)
        out = Conv2d(self.channel, 1, 1, 0, dtype=self.dtype, name="conv_df_0")(out)
        return lrelu(out)


class RDABUnderscore(nn.Module):
    """RDAB_ (`:2852-2883`): residual-squeeze channel gate on an expanded
    feature branch + concat fusion."""

    channel: int = 64
    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, res, x, x_c):
        y = jnp.mean(res, axis=(1, 2), keepdims=True)
        y = Conv2d(self.channel // self.reduction, 1, 1, 0, dtype=self.dtype,
                   name="conv_du_0")(y)
        y = jax.nn.relu(y)
        y = Conv2d(self.channel, 1, 1, 0, dtype=self.dtype, name="conv_du_2")(y)
        y = jax.nn.sigmoid(y)
        xc = Conv2d(self.channel * 4, 1, 1, 0, dtype=self.dtype, name="conv_dc_0")(x_c)
        xc = jax.nn.relu(xc)
        xc = Conv2d(self.channel, 1, 1, 0, dtype=self.dtype, name="conv_dc_2")(xc)
        xc = jax.nn.relu(xc)
        out = xc * y + x
        out = Conv2d(self.channel, 1, 1, 0, dtype=self.dtype, name="conv_df_0")(
            jnp.concatenate([out, x], axis=-1))
        return jax.nn.relu(out)


class PAM(nn.Module):
    """Position attention module, SAGAN-style (`:1902-1935`), cross-input:
    q from x1, k/v from x2, gamma-gated residual to x2."""

    in_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2):
        b, h, w, c = x1.shape
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        q = Conv2d(self.in_dim // 8, 1, 1, 0, dtype=self.dtype, name="query_conv")(x1)
        k = Conv2d(self.in_dim // 8, 1, 1, 0, dtype=self.dtype, name="key_conv")(x2)
        v = Conv2d(self.in_dim, 1, 1, 0, dtype=self.dtype, name="value_conv")(x2)
        q = q.reshape(b, h * w, -1)
        k = k.reshape(b, h * w, -1)
        v = v.reshape(b, h * w, -1)
        attn = jax.nn.softmax(jnp.einsum("bqc,bkc->bqk", q, k)
                              .astype(jnp.float32), axis=-1).astype(x1.dtype)
        out = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(b, h, w, c)
        return gamma * out + x2


class RPAB(nn.Module):
    """Residual-guided position attention block (`:2888-2920`): PAM(res, x)
    then concat-fuse with x_c. (conv_du/conv_dc exist in the reference ctor
    but are dead in its forward.)"""

    channel: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, res, x, x_c):
        y = PAM(self.channel, dtype=self.dtype, name="PAM")(res, x)
        out = Conv2d(self.channel, 1, 1, 0, dtype=self.dtype, name="conv_df_0")(
            jnp.concatenate([y, x_c], axis=-1))
        return jax.nn.relu(out)


class CAMSelf(nn.Module):
    """CAM_ (`:1939-1968`): self channel attention with max-subtracted
    energy, gamma-gated."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        flat = x.reshape(b, h * w, c)
        energy = jnp.einsum("bxc,bxd->bcd", flat, flat).astype(jnp.float32)
        energy = jnp.max(energy, axis=-1, keepdims=True) - energy
        attn = jax.nn.softmax(energy, axis=-1).astype(x.dtype)
        out = jnp.einsum("bcd,bxd->bxc", attn, flat).reshape(b, h, w, c)
        return gamma * out + x


class CAM(nn.Module):
    """CAM (`:1972-2000`): cross channel attention, q from x0+x2, k/v
    from x2."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x0, x1, x2):
        b, h, w, c = x1.shape
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        q = (x0 + x2).reshape(b, h * w, c)
        k = x2.reshape(b, h * w, c)
        energy = jnp.einsum("bxc,bxd->bcd", q, k).astype(jnp.float32)
        energy = jnp.max(energy, axis=-1, keepdims=True) - energy
        attn = jax.nn.softmax(energy, axis=-1).astype(x1.dtype)
        out = jnp.einsum("bcd,bxd->bxc", attn, k).reshape(b, h, w, c)
        return gamma * out + x2


class RCAB(nn.Module):
    """Residual channel attention block (`:2005-2023`): conv-relu-conv-conv
    + CALayer + skip. NOTE the reference CALayer ignores `reduction` (both
    1x1 convs full width) — reproduced via layers.CALayer."""

    n_feat: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        r = Conv2d(self.n_feat, 3, 1, 1, dtype=self.dtype, name="body_0")(x)
        r = jax.nn.relu(r)
        r = Conv2d(self.n_feat, 3, 1, 1, dtype=self.dtype, name="body_2")(r)
        r = Conv2d(self.n_feat, 3, 1, 1, dtype=self.dtype, name="body_3")(r)
        r = CALayer(self.n_feat, dtype=self.dtype, name="body_4")(r)
        return r + x


class NonLocalAttention(nn.Module):
    """`:2047-2069`: embedded-gaussian non-local block with PReLU embeds."""

    channel: int = 128
    reduction: int = 2
    res_scale: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape

        def prelu(name):
            a = self.param(name + "_alpha", nn.initializers.constant(0.25), (1,))
            return lambda t: jnp.where(t >= 0, t, a * t)

        e1 = prelu("m1")(Conv2d(self.channel // self.reduction, 1, 1, 0,
                                dtype=self.dtype, name="conv_match1_0")(x))
        e2 = prelu("m2")(Conv2d(self.channel // self.reduction, 1, 1, 0,
                                dtype=self.dtype, name="conv_match2_0")(x))
        asm = prelu("as")(Conv2d(self.channel, 1, 1, 0, dtype=self.dtype,
                                 name="conv_assembly_0")(x))
        e1 = e1.reshape(b, h * w, -1)
        e2 = e2.reshape(b, h * w, -1)
        asm = asm.reshape(b, h * w, -1)
        score = jax.nn.softmax(jnp.einsum("bqc,bkc->bqk", e1, e2)
                               .astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bqk,bkc->bqc", score, asm).reshape(b, h, w, c)
        return out + self.res_scale * x


class RSNLAttention(nn.Module):
    """`:2663-2716`: residual-sparse non-local attention — key embedding is
    the gumbel residual mask itself."""

    channel: int = 64
    res_scale: float = 1.0
    mask_mode: str = "sample"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, res, x_com):
        b, h, w, c = x_com.shape
        r = Conv2d(self.channel, 1, 1, 0, dtype=self.dtype, name="conv_du_re_0")(res)
        r = jax.nn.relu(r)
        r = Conv2d(self.channel, 3, 2, 2, dtype=self.dtype, name="conv_du_re_2")(r)
        r = jax.nn.relu(r)
        v = -jax.lax.reduce_window(-r, jnp.inf, jax.lax.min,
                                   (1, 3, 3, 1), (1, 1, 1, 1), "VALID")
        v = Conv2d(self.channel, 1, 1, 0, dtype=self.dtype, name="conv_du_re2_0")(v)
        v = jax.nn.relu(v)
        v = interpolate_bilinear(v, size=(h, w))
        r_m = _sample_mask(self, v.astype(jnp.float32)).astype(x_com.dtype)

        a = self.param("m1_alpha", nn.initializers.constant(0.25), (1,))
        e1 = Conv2d(self.channel, 1, 1, 0, dtype=self.dtype, name="conv_match1_0")(x_com)
        e1 = jnp.where(e1 >= 0, e1, a * e1)
        aa = self.param("as_alpha", nn.initializers.constant(0.25), (1,))
        asm = Conv2d(self.channel, 1, 1, 0, dtype=self.dtype, name="conv_assembly_0")(x_com)
        asm = jnp.where(asm >= 0, asm, aa * asm)
        e1 = e1.reshape(b, h * w, c)
        # key = mask, channel-major flatten as in the reference view(N,C,H*W)
        e2 = r_m.transpose(0, 3, 1, 2).reshape(b, c, h * w)
        score = jax.nn.softmax(jnp.einsum("bqc,bck->bqk", e1, e2)
                               .astype(jnp.float32), axis=-1).astype(x_com.dtype)
        asm = asm.reshape(b, h * w, c)
        out = jnp.einsum("bqk,bkc->bqc", score, asm).reshape(b, h, w, c)
        return out + self.res_scale * x_com


class CrissCrossAttention(nn.Module):
    """`:2078-2117`: criss-cross attention with a residual-derived binary
    key mask; -inf diagonal on the H branch (INF helper `:2073`)."""

    in_dim: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, res, x):
        b, h, w, c = x.shape
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        q = Conv2d(self.in_dim // 8, 1, 1, 0, dtype=self.dtype, name="query_conv")(x)
        res_mask = (res != 0).astype(x.dtype)
        k = Conv2d(self.in_dim // 8, 1, 1, 0, dtype=self.dtype, name="key_conv")(res_mask * x)
        v = Conv2d(self.in_dim, 1, 1, 0, dtype=self.dtype, name="value_conv")(x)

        # energies: H-branch (per column) with -inf self term, W-branch (per row)
        eh = jnp.einsum("bhwc,bgwc->bhwg", q, k).astype(jnp.float32)
        diag = jnp.eye(h, dtype=jnp.float32)[:, None, :]
        eh = eh - jnp.where(diag > 0, jnp.inf, 0.0)
        ew = jnp.einsum("bhwc,bhvc->bhwv", q, k).astype(jnp.float32)
        concat = jax.nn.softmax(jnp.concatenate([eh, ew], axis=-1), axis=-1)
        att_h = concat[..., :h].astype(x.dtype)
        att_w = concat[..., h:].astype(x.dtype)
        out_h = jnp.einsum("bhwg,bgwc->bhwc", att_h, v)
        out_w = jnp.einsum("bhwv,bhvc->bhwc", att_w, v)
        return gamma * (out_h + out_w) + x


class SKFF(nn.Module):
    """Selective kernel feature fusion (`:2925-2960`), two-branch."""

    in_channels: int
    height: int = 2
    reduction: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat1, feat2):
        d = max(int(self.in_channels / self.reduction), 4)
        feats = jnp.stack([feat1, feat2], axis=1)  # (B, height, H, W, C)
        u = jnp.sum(feats, axis=1)
        s = jnp.mean(u, axis=(1, 2), keepdims=True)
        z = Conv2d(d, 1, 1, 0, use_bias=False, dtype=self.dtype, name="conv_du_0")(s)
        z = jax.nn.leaky_relu(z, 0.2)
        att = [Conv2d(self.in_channels, 1, 1, 0, use_bias=False,
                      dtype=self.dtype, name=f"fcs_{i}")(z)
               for i in range(self.height)]
        att = jnp.stack(att, axis=1)
        att = jax.nn.softmax(att, axis=1)
        return jnp.sum(feats * att, axis=1)


class ContextBlock(nn.Module):
    """Global-context block (`:3013-3064`)."""

    n_feat: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        m = Conv2d(1, 1, 1, 0, use_bias=False, dtype=self.dtype, name="conv_mask")(x)
        m = jax.nn.softmax(m.reshape(b, h * w, 1).astype(jnp.float32), axis=1)
        ctx = jnp.einsum("bxc,bxo->boc", x.reshape(b, h * w, c),
                         m.astype(x.dtype)).reshape(b, 1, 1, c)
        add = Conv2d(self.n_feat, 1, 1, 0, use_bias=False, dtype=self.dtype,
                     name="channel_add_conv_0")(ctx)
        add = jax.nn.leaky_relu(add, 0.2)
        add = Conv2d(self.n_feat, 1, 1, 0, use_bias=False, dtype=self.dtype,
                     name="channel_add_conv_2")(add)
        return x + add


class CalibResBlock3D(nn.Module):
    """Calib_ResBlock_3d (`:2985-3009`): the feature map is re-tiled into a
    4x4 patch grid whose 16 cells become a (4-channel, 3-D) volume
    (depth = 4 grid columns, height = C, width = cell pixels), run through a
    Conv3d(4->nf->4) residual, then scattered back and residually added."""

    nf: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        p = 4
        hh, ww = h // p, w // p
        # b (h h1) (w w2) c -> b h1 w2 c (h w)   [torch layout, c-major cells]
        t = x.transpose(0, 3, 1, 2)                      # b c H W
        t = t.reshape(b, c, hh, p, ww, p)
        t = t.transpose(0, 3, 5, 1, 2, 4).reshape(b, p, p, c, hh * ww)
        # NDHWC for flax 3-D conv: channels = h1 (=4)
        v = t.transpose(0, 2, 3, 4, 1)                   # b, w2, c, hw, h1
        y = nn.Conv(self.nf, (3, 3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="dcn0")(v)
        y = lrelu(y)
        y = nn.Conv(p, (3, 3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="dcn1")(y) + v
        t = y.transpose(0, 4, 1, 2, 3)                   # b, h1, w2, c, hw
        t = t.reshape(b, p, p, c, hh, ww).transpose(0, 3, 4, 1, 5, 2)
        out = t.reshape(b, c, h, w).transpose(0, 2, 3, 1)
        return out + x


class ResBlock3D(nn.Module):
    """ResBlock_3d (`:2964-2981`): 3-D conv residual over a singleton
    'depth' axis made from channels."""

    nf: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x0 = x[..., None]  # (B, H, W, C=depth, 1 feature)
        # torch Conv3d over (C_depth, H, W); ours: NDHWC with D=channel axis
        x0 = x0.transpose(0, 3, 1, 2, 4)  # (B, D, H, W, 1)
        y = nn.Conv(self.nf, (3, 3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="dcn0")(x0)
        y = lrelu(y)
        y = nn.Conv(1, (3, 3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="dcn1")(y) + x0
        return y.transpose(0, 2, 3, 1, 4).reshape(b, h, w, c)
