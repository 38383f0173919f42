"""Attention modules for the CVSR family (NHWC, TPU-first).

* ``MDTA``: Restormer-style multi-head transposed (channel) self-attention
  (`/root/reference/arch/SIDECVSR_our.py:1545-1576`). Channel attention is
  O(C^2·HW) — cheap on MXU even at 1080p-input scale.
* ``GFeedForward``: gated depthwise FFN (`:1522-1541`).
* ``EGLA`` (LLongRangAttention): residual-prior-guided long-range (sparse
  row/column 1-D attention) + inverse-masked 8x8 window attention
  (`:2141-2249`). The residual mask is a gumbel-softmax over channels of a
  spatially-constant squeeze vector, sampled per-pixel, hard-thresholded at
  0.5 (`:2168-2195`); sampling is threaded through a flax 'gumbel' RNG
  collection, with a deterministic expectation mode for reproducible eval.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn

from .layers import Conv2d
from ..ops.fused_attention import column_self_attention, token_self_attention
from ..ops.resize import interpolate_bilinear

Dtype = Any


def _l2_normalize(x, axis=-1, eps=1e-12):
    """torch F.normalize: x / max(||x||_2, eps). The norm accumulates in
    f32; the result keeps x's dtype (no f32 materialisation of the full
    tensor — at production scale that alone was ~1.2 GB of HBM traffic
    per alignment step)."""
    n = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)),
                         axis=axis, keepdims=True))
    return (x.astype(jnp.float32) / jnp.maximum(n, eps)).astype(x.dtype)


class MDTA(nn.Module):
    """Multi-DConv-Head Transposed Attention over channels."""

    dim: int
    num_heads: int = 8
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        temperature = self.param(
            "temperature", nn.initializers.ones, (self.num_heads, 1, 1)
        )
        qkv = Conv2d(self.dim * 3, 1, 1, 0, use_bias=self.use_bias,
                     dtype=self.dtype, name="qkv")(x)
        qkv = Conv2d(self.dim * 3, 3, 1, 1, groups=self.dim * 3,
                     use_bias=self.use_bias, dtype=self.dtype,
                     name="qkv_dwconv")(qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        # channel index = head*ch + cc, identical to torch. Reshape-only
        # head split ((h w) merge + minor-dim split are layout-free) — the
        # pixel contraction rides dot_general instead of explicit (b, head,
        # c, hw) transposes, which at production scale were ~8 HBM passes.
        ch = c // self.num_heads

        def to_x(t):  # (b, h, w, c) -> (b, hw, head, ch)
            return t.reshape(b, h * w, self.num_heads, ch)

        # The reference L2-normalizes q/k over the PIXEL axis (dim=-1 of
        # the torch (b, head, c, hw) layout) before the gram product. The
        # normalization FACTORS OUT: q_hat^T k_hat = (q^T k) / (|q| |k|)
        # — so compute the raw gram and divide by the norms, skipping two
        # full normalized-tensor materialisations.
        q = to_x(q)
        k = to_x(k)
        v = to_x(v)
        nq = jnp.sqrt(jnp.sum(jnp.square(q.astype(jnp.float32)), axis=1))
        nk = jnp.sqrt(jnp.sum(jnp.square(k.astype(jnp.float32)), axis=1))
        nq = jnp.maximum(nq, 1e-12)              # (b, head, ch)... (b,n,c)
        nk = jnp.maximum(nk, 1e-12)
        g = jnp.einsum("bxnc,bxnd->bncd", q, k,
                       preferred_element_type=jnp.float32)
        attn = g / (nq[..., :, None] * nk[..., None, :]) * temperature
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bncd,bxnd->bxnc", attn.astype(v.dtype), v)
        out = out.reshape(b, h, w, c)
        return Conv2d(self.dim, 1, 1, 0, use_bias=self.use_bias,
                      dtype=self.dtype, name="project_out")(out)


class GFeedForward(nn.Module):
    """Gated-DConv feed-forward (Restormer GDFN)."""

    dim: int
    ffn_expansion_factor: float = 2.66
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = int(self.dim * self.ffn_expansion_factor)
        x = Conv2d(hidden * 2, 1, 1, 0, use_bias=self.use_bias,
                   dtype=self.dtype, name="project_in")(x)
        x = Conv2d(hidden * 2, 3, 1, 1, groups=hidden * 2,
                   use_bias=self.use_bias, dtype=self.dtype, name="dwconv")(x)
        x1, x2 = jnp.split(x, 2, axis=-1)
        x = jax.nn.gelu(x1, approximate=False) * x2
        return Conv2d(self.dim, 1, 1, 0, use_bias=self.use_bias,
                      dtype=self.dtype, name="project_out")(x)


def _band_matrix(kernel, n):
    """(n, n) banded matrix for a zero-padded 9-tap conv along an axis:
    M[s, d] = kernel[s - d + 4] for |d - s| <= 4 (eye(n, k=-o) with
    o = s - d places kernel[o + 4] on the o-th subdiagonal)."""
    m = jnp.zeros((n, n), kernel.dtype)
    for o in range(-4, 5):
        m = m + kernel[o + 4] * jnp.eye(n, k=-o, dtype=kernel.dtype)
    return m


def _conv9_along(x, kernel, bias, axis):
    """9-tap single-channel conv along one axis, zero padded — as ONE
    banded-matrix contraction on the MXU (the tap-loop version was 9
    full HBM passes over the tensor).

    Reproduces the reference's direct convs (`arch/SIDECVSR_our.py:
    2161-2162, 2216-2225`): ``directW1_conv`` has kernel (1, 9) over the
    (w, c) plane — it convolves along the *channel* axis (axis=2) — while
    ``directH1_conv`` has kernel (9, 1) over the (h, c) plane — it convolves
    along the *position* axis (axis=1). The asymmetry is the reference's.
    """
    n = x.shape[axis]
    m = _band_matrix(kernel, n).astype(x.dtype)
    if axis == x.ndim - 1:
        out = jnp.einsum("...c,co->...o", x, m)
    elif axis == 1 and x.ndim == 4:
        out = jnp.einsum("bhwc,hg->bgwc", x, m)
    elif axis == 1 and x.ndim == 3:
        out = jnp.einsum("thc,hg->tgc", x, m)
    else:
        raise NotImplementedError(axis)
    return out + bias


class EGLA(nn.Module):
    """LLongRangAttention: edge/residual-guided long + local attention.

    forward(res_prior, x) -> attended features + x (residual add).
    ``mask_mode``: 'sample' draws per-pixel gumbel noise from the 'gumbel'
    RNG collection (reference semantics, stochastic even at eval —
    `arch/SIDECVSR_our.py:2168-2177`); 'expected' uses the noise-free
    softmax (deterministic eval).
    """

    in_dim: int = 64
    window_size: int = 8
    mask_mode: str = "sample"
    fused: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, res, x):
        b, h, w, c = x.shape
        assert c == self.in_dim
        # --- residual mask generator -------------------------------------
        v = Conv2d(self.in_dim, 1, 1, 0, dtype=self.dtype, name="conv_du_re_0")(res)
        v = jax.nn.relu(v)
        v = Conv2d(self.in_dim, 3, 2, 2, dtype=self.dtype, name="conv_du_re_2")(v)
        v = jax.nn.relu(v)
        v = jnp.mean(v, axis=(1, 2), keepdims=True)  # GAP -> (B,1,1,C)
        v = Conv2d(self.in_dim, 1, 1, 0, dtype=self.dtype, name="conv_du_re2_0")(v)
        v = jax.nn.relu(v)
        if self.fused and self.mask_mode == "expected":
            # the noise-free mask is per-(frame, channel) constant, which
            # lets the mask multiply and the channel-band conv COMPOSE
            # into the q projection — the whole module runs as the two
            # kernels in ops/fused_egla.py + the existing column kernel
            rm = jax.nn.softmax(v.astype(jnp.float32), axis=-1)
            mask = (rm[:, 0, 0, :] >= 0.5).astype(jnp.float32)  # (B, C)
            return self._fused_call(mask, x)
        # bilinear 1x1 -> (h,w) is a constant broadcast; then per-pixel gumbel
        if self.mask_mode == "sample":
            v = jnp.broadcast_to(v, (b, h, w, c)).astype(jnp.float32)
            u = jax.random.uniform(
                self.make_rng("gumbel"), (b, h, w, c),
                minval=jnp.finfo(jnp.float32).tiny, maxval=1.0)
            g = -jnp.log(-jnp.log(u))
            rm = jax.nn.softmax(v + g, axis=-1)
        elif self.mask_mode == "expected":
            # the noise-free softmax input is spatially CONSTANT, so
            # softmax+threshold commute with the broadcast: compute on
            # (B, 1, 1, C) instead of a full-res f32 tensor
            rm = jnp.broadcast_to(
                jax.nn.softmax(v.astype(jnp.float32), axis=-1),
                (b, h, w, c))
        else:
            raise ValueError(self.mask_mode)
        # hard threshold; zero-grad in reference too (masked_fill)
        res_mask = jax.lax.stop_gradient((rm >= 0.5).astype(jnp.float32))
        res_mask = res_mask.astype(x.dtype)
        res_mask_inv = 1.0 - res_mask

        # --- q/v projection ----------------------------------------------
        x_ = Conv2d(self.in_dim * 2, 1, 1, 0, dtype=self.dtype, name="input_conv")(x)
        q_full, v_full = jnp.split(x_, 2, axis=-1)

        w1_k = self.param("directW1_kernel", nn.initializers.normal(0.1), (9,))
        w1_b = self.param("directW1_bias", nn.initializers.zeros, ())
        h1_k = self.param("directH1_kernel", nn.initializers.normal(0.1), (9,))
        h1_b = self.param("directH1_bias", nn.initializers.zeros, ())

        # --- long-range: row then column 1-D attention ---------------------
        # rows: tokens = (b h), positions = w
        q_r = rearrange(res_mask * q_full, "b h w c -> (b h) w c")
        v_r = rearrange(v_full, "b h w c -> (b h) w c")
        sparse_q = _conv9_along(q_r, w1_k, w1_b, axis=2)
        v_r = _conv9_along(v_r, w1_k, w1_b, axis=2)
        # fused per-token attention (Pallas on TPU): softmax(q q^T) v without
        # materialising the (T, W, W) score tensor in HBM
        v_r = token_self_attention(sparse_q, v_r)
        # columns: attention along H for each (b, w); the column kernel
        # slices columns in VMEM, avoiding three full HBM transposes
        q_c = sparse_q.reshape(b, h, w, c)
        q_c = _conv9_along(q_c, h1_k, h1_b, axis=1)  # directH1: along h
        v_c = v_r.reshape(b, h, w, c)
        long_out = column_self_attention(q_c, v_c)

        # --- local: inverse-masked window attention ------------------------
        ws = self.window_size
        q_w = rearrange(q_full, "b (h dh) (w dw) c -> (b h w) (dh dw) c", dh=ws, dw=ws)
        v_w = rearrange(v_full, "b (h dh) (w dw) c -> (b h w) (dh dw) c", dh=ws, dw=ws)
        m_w = rearrange(res_mask_inv, "b (h dh) (w dw) c -> (b h w) (dh dw) c", dh=ws, dw=ws)
        sparse_qw = m_w * q_w
        # 64-token windows: the XLA batched matmul path is already efficient
        loc_out = token_self_attention(sparse_qw, v_w, use_pallas=False)
        loc_out = rearrange(loc_out, "(b h w) (dh dw) c -> b (h dh) (w dw) c",
                            h=h // ws, w=w // ws, dh=ws, dw=ws)

        out = Conv2d(self.in_dim, 1, 1, 0, dtype=self.dtype, name="fuse")(
            jnp.concatenate([long_out, loc_out], axis=-1))
        return out + x

    def _fused_call(self, mask, x):
        """Fused EGLA (ops/fused_egla.py): eg1 (q/v projection + channel
        band + row attention + H band) -> column kernel -> eg2 (window
        attention + fusion + residual). Params share the standard tree
        paths (raw declarations)."""
        from ..ops.fused_egla import eg1_rows, eg2_local_fuse
        from .trunk_fast import _ConvParams

        c = self.in_dim
        dt = self.dtype
        b, h, w, _ = x.shape
        ki, bi = _ConvParams(1, 1, c, 2 * c, scaled_init=False,
                             name="input_conv")()
        kf, bf = _ConvParams(1, 1, 2 * c, c, scaled_init=False,
                             name="fuse")()
        w1_k = self.param("directW1_kernel", nn.initializers.normal(0.1), (9,))
        w1_b = self.param("directW1_bias", nn.initializers.zeros, ())
        h1_k = self.param("directH1_kernel", nn.initializers.normal(0.1), (9,))
        h1_b = self.param("directH1_bias", nn.initializers.zeros, ())

        f32 = jnp.float32
        kiq = ki[0, 0].astype(f32)                   # (C, 2C)
        wq, wv = kiq[:, :c], kiq[:, c:]
        bq, bv_in = bi.astype(f32)[:c], bi.astype(f32)[c:]
        mc = _band_matrix(w1_k.astype(f32), c)       # (C, C) channel band
        aq = jnp.einsum("io,bo,oc->bic", wq, mask, mc)
        cq = jnp.einsum("bo,oc->bc", mask * bq[None], mc) + w1_b
        bv_mat = wv @ mc
        cv = (bv_in @ mc + w1_b)[None]
        h9 = jnp.concatenate([h1_k.astype(f32), h1_b[None].astype(f32)])

        rows = 16
        rpad = (-h) % rows
        xp = (jnp.pad(x, ((0, 0), (0, rpad), (0, 0), (0, 0)))
              if rpad else x)
        qc, vr = eg1_rows(xp.astype(dt), aq.astype(dt), cq.astype(dt),
                          bv_mat.astype(dt), cv.astype(dt), h9,
                          img_h=h, rows=rows)
        long_out = column_self_attention(qc[:, :h], vr[:, :h])

        kfv = kf[0, 0].astype(f32)                   # (2C, C)
        out = eg2_local_fuse(
            x.astype(dt), long_out.astype(dt),
            wq.astype(dt), bq[None].astype(dt),
            wv.astype(dt), bv_in[None].astype(dt),
            (1.0 - mask).astype(dt),
            kfv[:c].astype(dt), kfv[c:].astype(dt),
            bf[None].astype(dt), img_h=h, ws=self.window_size)
        return out
