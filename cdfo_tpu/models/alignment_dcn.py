"""Deformable-conv-based alignment family (non-V8 variants).

These back SIDECVSR / CVSR_V7 and the STDF/DSTA era modules
(SURVEY §2.2). All NHWC; flows are (dx, dy) channel order; the deformable
offset convention follows :mod:`cdfo_tpu.ops.deform_conv` ([dy, dx]
interleaved per tap, deformable-group major — so the reference's
``flow.flip(1).repeat(GK)`` bias becomes a (dy, dx) tile here).

Reference lines in `/root/reference/arch/SIDECVSR_our.py`.
"""
from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn

from ..ops.deform_conv import deform_conv2d
from ..ops.warp import flow_warp
from .attention import _l2_normalize
from .layers import Conv2d, DPConv, lrelu
from .dcn import _ref_weight_init

Dtype = Any


def _tile_flow_bias(flow: jnp.ndarray, gk: int) -> jnp.ndarray:
    """flow (B,H,W,2)=[dx,dy] -> (B,H,W,2*GK) [dy,dx] per tap (the
    reference's ``flow_1.flip(1).repeat(1, GK, 1, 1)`` — `:3159`)."""
    flipped = flow[..., ::-1]
    return jnp.tile(flipped, (1, 1, 1, gk))


class _ChannelMSA(nn.Module):
    """Shared channel-MSA (q/k L2-normalised over pixels, temperature,
    1x1 projection) used across this family."""

    dim: int = 64
    num_heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q_in, k_in, v_in):
        b, h, w, c = q_in.shape

        def to_heads(t):
            return rearrange(t, "b h w (head c) -> b head c (h w)",
                             head=self.num_heads)

        temperature = self.param("temperature", nn.initializers.ones,
                                 (self.num_heads, 1, 1))
        q = _l2_normalize(to_heads(q_in).astype(jnp.float32))
        k = _l2_normalize(to_heads(k_in).astype(jnp.float32))
        v = to_heads(v_in)
        attn = jnp.einsum("bncx,bndx->bncd", q, k) * temperature
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = rearrange(jnp.einsum("bncd,bndx->bncx", attn, v),
                        "b head c (h w) -> b h w (head c)", h=h, w=w)
        return Conv2d(self.dim, 1, 1, 0, use_bias=False, dtype=self.dtype,
                      name="project_out")(out)


class MVDeformableAlignment(nn.Module):
    """`:3103-3165`: DCN alignment; offsets from conv(warped||flow||flow),
    max_residue_magnitude*tanh + tiled-flow bias. The reference's
    ``nn.Sigmoid(mask)`` (`:3162`) is a bug (constructs a module) that
    crashes at call time; we apply a functional sigmoid."""

    dim: int = 64
    kernel_size: int = 3
    padding: int = 1
    deformable_groups: int = 16
    max_residue_magnitude: float = 10.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, extra_feat, flow):
        k, g = self.kernel_size, self.deformable_groups
        warped = flow_warp(extra_feat, flow)
        feat = jnp.concatenate([warped, flow, flow], axis=-1)
        for i, nm in enumerate(["conv_offset_0", "conv_offset_2", "conv_offset_4"]):
            feat = lrelu(Conv2d(self.dim, 3, 1, 1, dtype=self.dtype, name=nm)(feat))
        out = Conv2d(27 * g, 3, 1, 1, kernel_init=nn.initializers.zeros,
                     dtype=self.dtype, name="conv_offset_6")(feat)
        gk = g * k * k
        o1, o2, mask = out[..., :gk], out[..., gk:2 * gk], out[..., 2 * gk:]
        offset = self.max_residue_magnitude * jnp.tanh(
            jnp.concatenate([o1, o2], axis=-1))
        offset = offset + _tile_flow_bias(flow, gk)
        mask = jax.nn.sigmoid(mask)
        weight = self.param("weight", _ref_weight_init(self.dim),
                            (k, k, self.dim, self.dim))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return deform_conv2d(x, offset, weight.astype(self.dtype), bias=bias,
                             mask=mask, padding=self.padding)


class MVDualAttAlignment(nn.Module):
    """`:3265-3352` (CVSR_V7's aligner, `:4242`): two channel-MSAs predict
    offset fields (shared conv_offset head), summed with the tiled flow;
    masks summed then sigmoided; modulated DCN with 16 deformable groups."""

    dim: int = 64
    kernel_size: int = 3
    padding: int = 1
    deformable_groups: int = 16
    max_residue_magnitude: float = 10.0
    num_heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, extra_feat, pred_feat, flow):
        k, g = self.kernel_size, self.deformable_groups
        gk = g * k * k
        warped = flow_warp(extra_feat, flow)
        fused = Conv2d(self.dim, 1, 1, 0, use_bias=False, dtype=self.dtype,
                       name="fusion_out")(
            jnp.concatenate([warped, pred_feat], axis=-1))

        conv_du_0 = Conv2d(self.dim // 16, 1, 1, 0, dtype=self.dtype,
                           name="conv_du_0")
        conv_du_2 = Conv2d(self.dim, 1, 1, 0, dtype=self.dtype, name="conv_du_2")

        def gate(v):
            gpool = jnp.mean(v, axis=(1, 2), keepdims=True)
            gpool = conv_du_2(jax.nn.relu(conv_du_0(gpool)))
            return v * jax.nn.sigmoid(gpool)

        msa = _ChannelMSA(self.dim, self.num_heads, dtype=self.dtype, name="msa")
        out_1 = msa(x, fused, gate(warped))
        out_2 = msa(x, fused, gate(pred_feat))

        co_0 = Conv2d(self.dim, 3, 1, 1, dtype=self.dtype, name="conv_offset_0")
        co_2 = Conv2d(27 * g, 3, 1, 1, kernel_init=nn.initializers.zeros,
                      dtype=self.dtype, name="conv_offset_2")

        def conv_offset(t):
            return co_2(lrelu(co_0(t)))

        co1 = conv_offset(out_1)
        co2 = conv_offset(out_2)
        off1 = self.max_residue_magnitude * jnp.tanh(
            jnp.concatenate([co1[..., :gk], co1[..., gk:2 * gk]], axis=-1))
        off2 = self.max_residue_magnitude * jnp.tanh(
            jnp.concatenate([co2[..., :gk], co2[..., gk:2 * gk]], axis=-1))
        offset = off1 + off2 + _tile_flow_bias(flow, gk)
        mask = jax.nn.sigmoid(co1[..., 2 * gk:] + co2[..., 2 * gk:])
        weight = self.param("weight", _ref_weight_init(self.dim),
                            (k, k, self.dim, self.dim))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return deform_conv2d(x, offset, weight.astype(self.dtype), bias=bias,
                             mask=mask, padding=self.padding)


class MVSelfAttDeformableAlignment(nn.Module):
    """`:3169-3261`: a channel-MSA computes (and discards — the reference
    overwrites ``out`` at `:3246`) an attended feature; offsets come from
    conv_offset(extra_feat). Reproduced including the dead MSA so converted
    checkpoints keep their params."""

    dim: int = 64
    kernel_size: int = 3
    padding: int = 1
    deformable_groups: int = 16
    max_residue_magnitude: float = 10.0
    num_heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, extra_feat, pred_feat, flow):
        k, g = self.kernel_size, self.deformable_groups
        gk = g * k * k
        warped = flow_warp(extra_feat, flow)
        _ = _ChannelMSA(self.dim, self.num_heads, dtype=self.dtype,
                        name="msa")(warped, extra_feat, pred_feat)
        feat = extra_feat
        for nm in ["conv_offset_0", "conv_offset_2", "conv_offset_4"]:
            feat = lrelu(Conv2d(self.dim, 3, 1, 1, dtype=self.dtype, name=nm)(feat))
        out = Conv2d(27 * g, 3, 1, 1, kernel_init=nn.initializers.zeros,
                     dtype=self.dtype, name="conv_offset_6")(feat)
        o1, o2, mask = out[..., :gk], out[..., gk:2 * gk], out[..., 2 * gk:]
        offset = self.max_residue_magnitude * jnp.tanh(
            jnp.concatenate([o1, o2], axis=-1)) + _tile_flow_bias(flow, gk)
        mask = jax.nn.sigmoid(mask)
        weight = self.param("weight", _ref_weight_init(self.dim),
                            (k, k, self.dim, self.dim))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return deform_conv2d(x, offset, weight.astype(self.dtype), bias=bias,
                             mask=mask, padding=self.padding)


class MVIterativeDeformableAlignment(nn.Module):
    """`:3653-3736`: iterative offset refinement with a carried offset
    feature; returns (aligned, offset_feature)."""

    dim: int = 64
    kernel_size: int = 3
    padding: int = 1
    deformable_groups: int = 16
    max_residue_magnitude: float = 10.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, extra_feat, flow, pre_offset_fea=None):
        k, g = self.kernel_size, self.deformable_groups
        gk = g * k * k
        warped = flow_warp(extra_feat, flow)
        if pre_offset_fea is None:
            feat = jnp.concatenate([warped, flow, flow], axis=-1)
        else:
            init = jnp.concatenate([warped, pre_offset_fea], axis=-1)
            scale = jax.nn.sigmoid(Conv2d(self.dim, 3, 1, 1, dtype=self.dtype,
                                          name="scaleing_0")(init))
            pre = jax.nn.sigmoid(Conv2d(4, 3, 1, 1, dtype=self.dtype,
                                        name="off2flow_0")(pre_offset_fea * scale))
            feat = jnp.concatenate([warped, pre], axis=-1)
        for nm in ["conv_offset_0", "conv_offset_2", "conv_offset_4"]:
            feat = lrelu(Conv2d(self.dim, 3, 1, 1, dtype=self.dtype, name=nm)(feat))
        out = Conv2d(27 * g, 3, 1, 1, kernel_init=nn.initializers.zeros,
                     dtype=self.dtype, name="conv_offset_6")(feat)
        o1, o2, mask = out[..., :gk], out[..., gk:2 * gk], out[..., 2 * gk:]
        offset_0 = self.max_residue_magnitude * jnp.tanh(
            jnp.concatenate([o1, o2], axis=-1))
        offset = offset_0 + _tile_flow_bias(flow, gk)
        offset_out = jax.nn.sigmoid(Conv2d(self.dim, 3, 1, 1, dtype=self.dtype,
                                           name="offset_oc_0")(offset_0))
        mask = jax.nn.sigmoid(mask)
        weight = self.param("weight", _ref_weight_init(self.dim),
                            (k, k, self.dim, self.dim))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        aligned = deform_conv2d(x, offset, weight.astype(self.dtype), bias=bias,
                                mask=mask, padding=self.padding)
        return aligned, offset_out


class DeformableSKConv(nn.Module):
    """deformable_SKConv (`:62-128`): 3 branches k in {1,3,5}, per-channel
    deformable groups, MV-seeded offsets, GAP branch attention."""

    in_fea: int = 64
    out_fea: int = 64
    in_nc: int = 32
    branches: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, fea, inputs, mv):
        nc = self.in_nc
        input_conv = Conv2d(nc, 1, 1, 0, dtype=self.dtype, name="input_conv_0")
        conv_attention = Conv2d(nc, 1, 1, 0, dtype=self.dtype,
                                name="conv_attention_0")
        fc = Conv2d(nc, 1, 1, 0, dtype=self.dtype, name="fc_0")
        outs, atts = [], []
        for i in range(self.branches):
            ksz = 2 * i + 1
            d = ksz * ksz
            om = DPConv(nc * 3 * d, ksz, dtype=self.dtype,
                        name=f"offset_mask_{i}")(lrelu(input_conv(fea)))
            offset = om[..., :nc * 2 * d]
            offset = offset + _tile_flow_bias(mv, nc * d)
            mask = jax.nn.sigmoid(om[..., nc * 2 * d:])
            weight = self.param(f"deform_weight_{i}", _ref_weight_init(nc),
                                (ksz, ksz, nc, nc))
            bias = self.param(f"deform_bias_{i}", nn.initializers.zeros, (nc,))
            fused = deform_conv2d(lrelu(input_conv(inputs)), offset,
                                  weight.astype(self.dtype), bias=bias,
                                  mask=mask, padding=ksz // 2)
            fused = jax.nn.relu(fused)
            # conv_attention / fc are shared across branches (`:82-88`)
            att = lrelu(conv_attention(fused))
            att = jnp.mean(att, axis=(1, 2), keepdims=True)
            att = lrelu(fc(att))
            outs.append(fused)
            atts.append(att)
        out = jnp.stack(outs, axis=1) * jnp.stack(atts, axis=1)
        b, br, h, w, c = out.shape
        out = out.transpose(0, 2, 3, 1, 4).reshape(b, h, w, br * c)
        return lrelu(Conv2d(self.out_fea, 1, 1, 0, dtype=self.dtype,
                            name="conv_0")(out))


class STDF(nn.Module):
    """Spatio-temporal deformable fusion (`:134-188`): flow-warp + channel
    MSA (q=warped, k=extra, v=pred) + multi-kernel projections feeding
    DeformableSKConv."""

    in_nc: int = 32
    out_nc: int = 64
    nf: int = 64
    num_heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, extra_feat, pred_feat, mv):
        warped = flow_warp(extra_feat, mv)
        out = _ChannelMSA(self.nf, self.num_heads, dtype=self.dtype,
                          name="msa")(warped, extra_feat, pred_feat)
        init1 = Conv2d(self.nf, 1, 1, 0, dtype=self.dtype, name="project_out_1")(out)
        init3 = Conv2d(self.nf, 3, 1, 1, dtype=self.dtype, name="project_out_3")(out)
        _ = Conv2d(self.nf, 5, 1, 2, dtype=self.dtype, name="project_out_5")(out)
        out = lrelu(Conv2d(self.nf, 3, 1, 1, dtype=self.dtype, name="out_conv_0")(init3))
        return DeformableSKConv(self.nf, self.out_nc, self.in_nc,
                                dtype=self.dtype, name="d_SKConv")(out, init1, mv)


class STN(nn.Module):
    """`:200-216`: normalised-grid warper; note the reference multiplies
    flows by 32 and clamps the grid to [-1, 1]."""

    padding_mode: str = "zeros"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, u, v):
        """inputs (B,H,W,C); u, v (B,H,W) flow components in pixels/32."""
        b, h, w, c = inputs.shape
        # normalized mesh + normalized flow, clamp, then to pixel coords
        # (align_corners=True: [-1,1] <-> [0, S-1])
        nu = (u / w * 2.0) * 32.0
        nv = (v / h * 2.0) * 32.0
        gx = jax.lax.broadcasted_iota(jnp.float32, (1, h, w), 2) / max(w - 1, 1) * 2.0 - 1.0
        gy = jax.lax.broadcasted_iota(jnp.float32, (1, h, w), 1) / max(h - 1, 1) * 2.0 - 1.0
        mx = jnp.clip(gx + nu, -1, 1)
        my = jnp.clip(gy + nv, -1, 1)
        px = (mx + 1.0) * (w - 1) / 2.0
        py = (my + 1.0) * (h - 1) / 2.0
        base_x = jax.lax.broadcasted_iota(px.dtype, (h, w), 1)[None]
        base_y = jax.lax.broadcasted_iota(py.dtype, (h, w), 0)[None]
        flow = jnp.stack([px - base_x, py - base_y], axis=-1)
        return flow_warp(inputs, flow, padding_mode=self.padding_mode)


class MVLocalAttn(nn.Module):
    """MV_LOCAL_ATTN (`:219-250`): 3x3 patch-unfolded features warped by the
    MV (border padding), 9-way softmax kernel prediction, weighted mean."""

    nf: int = 64
    p_k: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, nbh_fea, cen_fea, mv):
        b, h, w, c = cen_fea.shape
        k = self.p_k

        def unfold(t):
            # torch Unfold channel order: (C, ky, kx) fastest-last
            pads = jnp.pad(t, ((0, 0), (k // 2, k // 2), (k // 2, k // 2), (0, 0)))
            patches = [pads[:, dy:dy + h, dx:dx + w, :]
                       for dy in range(k) for dx in range(k)]
            # stack as (B, H, W, C, k*k) to mirror view(B, C, k*k, H, W)
            return jnp.stack(patches, axis=-1)

        nbh_p = unfold(nbh_fea)              # (B,H,W,C,9)
        cen_p = unfold(cen_fea)
        nbh_flat = nbh_p.reshape(b, h, w, c * k * k)
        warped = STN(padding_mode="border", dtype=self.dtype, name="warp_module")(
            nbh_flat, mv[..., 0], mv[..., 1])
        fuse = jnp.concatenate([warped, cen_p.reshape(b, h, w, c * k * k)], axis=-1)
        attn = Conv2d(2 * self.nf, 1, 1, 0, dtype=self.dtype,
                      name="kernel_pred_module_0")(fuse)
        attn = lrelu(attn)
        attn = Conv2d(k * k, 1, 1, 0, dtype=self.dtype,
                      name="kernel_pred_module_2")(attn)
        attn = jax.nn.softmax(attn, axis=-1)
        warped_p = warped.reshape(b, h, w, c, k * k)
        return jnp.mean(warped_p * attn[:, :, :, None, :], axis=-1)


class FeaFusion(nn.Module):
    """fea_fusion (`:296-320`): temporal correlation attention over the
    frame-stacked channel axis. Input (B, N*nf, ...) channel-last."""

    nf: int = 64
    n: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feas):
        b, h, w, nc = feas.shape
        n = self.n
        emb = Conv2d(self.nf, 3, 1, 1, dtype=self.dtype, name="q")(
            feas.reshape(b, h, w, n, self.nf).transpose(0, 3, 1, 2, 4)
            .reshape(b * n, h, w, self.nf))
        emb = emb.reshape(b, n, h, w, self.nf)
        emb_ref = Conv2d(self.nf, 3, 1, 1, dtype=self.dtype, name="p")(emb[:, n // 2])
        cor = jnp.sum(emb * emb_ref[:, None], axis=-1)   # (B, N, H, W)
        prob = jax.nn.sigmoid(cor)
        prob = jnp.repeat(prob[..., None], self.nf, axis=-1)  # (B,N,H,W,nf)
        prob = prob.transpose(0, 2, 3, 1, 4).reshape(b, h, w, nc)
        return feas * prob
