"""Non-flagship model variants: CVSR_V7 (bidirectional pyramid, DCN
alignment), SIDECVSR (SFT side-info + MV patch attention), CVSR_V9
(EGLA_1 spatial-compensate).

Reference: `/root/reference/arch/SIDECVSR_our.py:4215-4367` (V7),
`:4089-4211` (SIDECVSR — note the shipped SIDECVSR is DEAD: it uses
``self.mv_patch_attn`` whose construction is commented out `:4115`; we
construct it, which is the obvious repair), `:5019-5126` (V9).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import ModelConfig
from ..ops.resize import interpolate_bilinear, pixel_shuffle
from .alignment_dcn import FeaFusion, MVDualAttAlignment, MVLocalAttn
from .attention_variants import RDAB, EGLA1
from .layers import Conv2d, lrelu
from .prior_encoder import PartitionTransformerSA2
from .sft import SideEmbeddedFeatureExtractBlock
from .trunk import SCNetPyr, SCNetPyrScan, SCNetS
from .cvsr import CVSRV8
from .attention import MDTA
from .norms import ChannelLayerNorm


class PartitionTransformerBlockPTB(nn.Module):
    """PartitionTransformerBlock (`:1340-1367`): 4 rounds, side branch is a
    shared SpatialAttention; used by CVSR_V7's feature extraction
    (PAItransformer_feat_extract `:1602-1612`)."""

    dim: int = 64
    num_heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1, x2):
        from .layers import SpatialAttention

        norm1 = ChannelLayerNorm(self.dim, dtype=self.dtype, name="norm1")
        norm2 = ChannelLayerNorm(self.dim, dtype=self.dtype, name="norm2")
        attn = MDTA(self.dim, self.num_heads, dtype=self.dtype, name="attn")
        conv = Conv2d(self.dim, 3, 1, 1, dtype=self.dtype, name="conv")
        sa = SpatialAttention(dtype=self.dtype, name="SA")
        for _ in range(4):
            x2 = sa(x2)
            x1 = x1 + attn(norm1(x1)) + x2
            x1 = x1 + conv(norm2(x1))
        return x1


class CVSRV7(nn.Module):
    """3-level feature pyramid, coarse-to-fine bidirectional alignment
    (backward pass over mvs0 then forward over mvs1, fused by fb_fusion),
    pyramid SCNet trunk and pyramid-fuse upsampling head."""

    cfg: ModelConfig = ModelConfig(name="cvsr_v7")

    @nn.compact
    def __call__(self, x, mvs0, mvs1, pms, rms, ufs,
                 pre_l1: Optional[jnp.ndarray] = None):
        cfg = self.cfg
        dt = cfg.compute_dtype
        nf = cfg.nf
        b, n, h, w, _ = x.shape
        center = cfg.center
        x = x.astype(dt)
        x_center = x[:, center]

        conv_first = Conv2d(nf, 3, 1, 1, dtype=dt, name="conv_first")
        conv_second = Conv2d(nf, 3, 1, 1, dtype=dt, name="conv_second")
        feat_ext = PartitionTransformerBlockPTB(
            nf, cfg.mdta_heads, dtype=dt, name="transformer_feature_extraction")
        conv_expand_fea_r = Conv2d(nf, 3, 1, 1, dtype=dt, name="conv_expand_fea_r")
        conv_expand_ufs = Conv2d(nf, 3, 1, 1, dtype=dt, name="conv_expand_ufs")
        conv_expand_rms = Conv2d(nf, 3, 1, 1, dtype=dt, name="conv_expand_rms")
        fb_fusion = Conv2d(nf, 1, 1, 0, dtype=dt, name="fb_fusion")
        tsa_fusion = Conv2d(nf, 1, 1, 0, dtype=dt, name="tsa_fusion")
        rdab = RDAB(nf, mask_mode=cfg.mask_mode, dtype=dt, name="RDAB")
        align = MVDualAttAlignment(nf, 3, 1, 16, 10.0, dtype=dt,
                                   name="MV_deform_align")

        if pre_l1 is None:
            l1 = lrelu(conv_first(x.reshape(b * n, h, w, 1)))
            sides = conv_second(pms.astype(dt).reshape(b * n, h, w, 1))
            l1 = feat_ext(l1, sides)
        else:
            new = lrelu(conv_first(x[:, -1]))
            new = feat_ext(new, conv_second(pms.astype(dt)[:, -1]))
            l1 = jnp.concatenate(
                [pre_l1.astype(dt)[:, 1:], new[:, None]], axis=1)
            l1 = l1.reshape(b * n, h, w, nf)

        feas_pyr = [l1]
        feas_pyr.append(interpolate_bilinear(feas_pyr[-1], scale_factor=0.5))
        feas_pyr.append(interpolate_bilinear(feas_pyr[-1], scale_factor=0.5))

        rms_f = rms.astype(dt)
        ufs_f = ufs.astype(dt)

        def priors_at(i, pyr_i):
            uf = ufs_f[:, i]
            rm = rms_f[:, i]
            if pyr_i > 0:
                s = 0.5 ** pyr_i
                uf = interpolate_bilinear(uf, scale_factor=s) / (2.0 ** pyr_i)
                rm = interpolate_bilinear(rm, scale_factor=s) / (2.0 ** pyr_i)
            return conv_expand_ufs(uf), conv_expand_rms(rm)

        def mv_at(mvs, i, pyr_i):
            mv = mvs.astype(dt)[:, i]
            if pyr_i > 0:
                s = 0.5 ** pyr_i
                mv = interpolate_bilinear(mv, scale_factor=s) / (2.0 ** pyr_i)
            return mv

        nbr_idx = [i for i in range(n) if i != center]
        m = len(nbr_idx)
        fuse_fea_pyr = []
        aligned_out_prev = None  # (B, N, h', w', nf) from coarser level
        for pyr_i in (2, 1, 0):  # L3 -> L1
            hh, ww = h // (2 ** pyr_i), w // (2 ** pyr_i)
            fea_lv = feas_pyr[pyr_i].reshape(b, n, hh, ww, nf)
            cen = fea_lv[:, center]
            # neighbours fold into batch (shared weights) — 6x fewer DCN
            # call sites per level than the reference's python loop
            priors = [priors_at(i, pyr_i) for i in nbr_idx]
            ufs_p = jnp.concatenate([p[0] for p in priors], axis=0)
            rms_p = jnp.concatenate([p[1] for p in priors], axis=0)
            fea_nb = fea_lv[:, nbr_idx].transpose(1, 0, 2, 3, 4).reshape(
                m * b, hh, ww, nf)
            fea_com = fea_nb + rms_p
            if aligned_out_prev is not None:
                prev_nb = aligned_out_prev[:, nbr_idx].transpose(
                    1, 0, 2, 3, 4).reshape(m * b, hh // 2, ww // 2, nf)
                fea_com = fea_com + interpolate_bilinear(prev_nb,
                                                         scale_factor=2.0)
            x_n = rdab(rms_p, fea_com)
            fea_i = conv_expand_fea_r(jnp.concatenate([fea_nb, x_n], axis=-1))
            cen_rep = jnp.tile(cen, (m, 1, 1, 1))

            # both alignment directions in ONE batched call (weights are
            # shared, so stacking backward/forward along batch is exact);
            # halves the traced DCN call sites per level — V7's XLA
            # compile time was dominated by the 6 unrolled align graphs
            mv_both = jnp.concatenate(
                [mv_at(mvs, i, pyr_i) for mvs in (mvs0, mvs1)
                 for i in nbr_idx], axis=0)
            both = align(jnp.tile(cen_rep, (2, 1, 1, 1)),
                         jnp.tile(fea_i, (2, 1, 1, 1)),
                         jnp.tile(ufs_p, (2, 1, 1, 1)), mv_both)
            back, fwd = both[:m * b], both[m * b:]
            fused = fb_fusion(jnp.concatenate([back, fwd], axis=-1))
            fused = fused.reshape(m, b, hh, ww, nf).transpose(1, 0, 2, 3, 4)
            parts = []
            for i in range(n):
                if i == center:
                    parts.append(fea_lv[:, i][:, None])
                else:
                    parts.append(fused[:, nbr_idx.index(i)][:, None])
            aligned_out_prev = jnp.concatenate(parts, axis=1)
            flat = aligned_out_prev.transpose(0, 2, 3, 1, 4).reshape(
                b, hh, ww, n * nf)
            fuse_fea_pyr.append(lrelu(tsa_fusion(flat)))

        fuse_fea_pyr = fuse_fea_pyr[::-1]  # [L1, L2, L3]
        trunk_cls = SCNetPyrScan if cfg.scan_trunk else SCNetPyr
        out = trunk_cls(nf, cfg.scn_groups, dtype=dt, name="recon_trunk")(fuse_fea_pyr)

        out_l3 = lrelu(Conv2d(nf, 1, 1, 0, dtype=dt, name="upconv1_L3")(out[2]))
        out_l3 = pixel_shuffle(pixel_shuffle(out_l3, 2), 2)
        out_l2 = lrelu(Conv2d(nf, 1, 1, 0, dtype=dt, name="upconv1_L2")(out[1]))
        out_l2 = pixel_shuffle(out_l2, 2)
        out_fuse = jnp.concatenate([out[0], out_l2, out_l3], axis=-1)
        o = lrelu(pixel_shuffle(
            Conv2d(nf * 4, 1, 1, 0, dtype=dt, name="upconv1")(out_fuse), 2))
        o = lrelu(pixel_shuffle(
            Conv2d(nf * 4, 1, 1, 0, dtype=dt, name="upconv2")(o), 2))
        o = Conv2d(1, 1, 1, 0, dtype=dt, name="conv_last")(o)
        base = interpolate_bilinear(x_center, scale_factor=4.0)
        return (o + base).astype(jnp.float32), l1.reshape(b, n, h, w, nf)


class SIDECVSRModel(nn.Module):
    """SIDECVSR (`:4089-4211`), repaired: SFT side-embedding feature
    extraction, 3-level pyramid, MV_LOCAL_ATTN patch alignment, fea_fusion
    temporal attention, pyramid SCNet trunk."""

    cfg: ModelConfig = ModelConfig(name="sidecvsr", scn_groups=4)

    @nn.compact
    def __call__(self, x, mvs, pms, rms, ufs,
                 pre_l1: Optional[jnp.ndarray] = None):
        cfg = self.cfg
        dt = cfg.compute_dtype
        nf = cfg.nf
        b, n, h, w, _ = x.shape
        center = cfg.center
        x = x.astype(dt)
        x_center = x[:, center]

        conv_first = Conv2d(nf, 3, 1, 1, dtype=dt, name="conv_first")
        feat_ext = SideEmbeddedFeatureExtractBlock(nf, dtype=dt,
                                                   name="feature_extraction")
        from .prior_encoder import SideToFea
        side_ext = SideToFea(nf // 2, dtype=dt, name="side_fea_ext")
        attn_align = MVLocalAttn(nf, 3, dtype=dt, name="mv_patch_attn")
        tmp_attn = FeaFusion(nf, n, dtype=dt, name="tmp_fea_attn")
        tsa_fusion = Conv2d(nf, 1, 1, 0, dtype=dt, name="tsa_fusion")

        if pre_l1 is None:
            l1 = lrelu(conv_first(x.reshape(b * n, h, w, 1)))
            # active path feeds partition maps alone (`:4143`); SideToFea
            # expects 3 channels, so tile pm to 3 (the commented reference
            # path concatenates rms/pms/ufs — `:4134`)
            sides = jnp.tile(pms.astype(dt).reshape(b * n, h, w, 1), (1, 1, 1, 3))
            l1 = feat_ext(l1, side_ext(sides))
        else:
            new = lrelu(conv_first(x[:, -1]))
            sides = jnp.concatenate(
                [rms.astype(dt)[:, -1], pms.astype(dt)[:, -1],
                 ufs.astype(dt)[:, -1]], axis=-1)
            new = feat_ext(new, side_ext(sides))
            l1 = jnp.concatenate([pre_l1.astype(dt)[:, 1:], new[:, None]], axis=1)
            l1 = l1.reshape(b * n, h, w, nf)

        feas_pyr = [l1]
        feas_pyr.append(interpolate_bilinear(feas_pyr[-1], scale_factor=0.5))
        feas_pyr.append(interpolate_bilinear(feas_pyr[-1], scale_factor=0.5))

        fuse_fea_pyr = []
        for pyr_i in range(3):
            hh, ww = h // (2 ** pyr_i), w // (2 ** pyr_i)
            fea_lv = feas_pyr[pyr_i].reshape(b, n, hh, ww, nf)
            cen = fea_lv[:, center]
            aligned = []
            for i in range(n):
                if i == center:
                    aligned.append(fea_lv[:, i])
                    continue
                mv = mvs.astype(dt)[:, i]
                if pyr_i > 0:
                    mv = interpolate_bilinear(
                        mv, scale_factor=0.5 ** pyr_i) / (2.0 ** pyr_i)
                aligned.append(attn_align(fea_lv[:, i], cen, mv))
            flat = jnp.stack(aligned, axis=1).transpose(0, 2, 3, 1, 4)
            flat = flat.reshape(b, hh, ww, n * nf)
            fuse_fea_pyr.append(lrelu(tsa_fusion(tmp_attn(flat))))

        trunk_cls = SCNetPyrScan if cfg.scan_trunk else SCNetPyr
        out = trunk_cls(nf, cfg.scn_groups, dtype=dt, name="recon_trunk")(fuse_fea_pyr)
        out_l3 = lrelu(Conv2d(nf, 1, 1, 0, dtype=dt, name="upconv1_L3")(out[2]))
        out_l3 = pixel_shuffle(pixel_shuffle(out_l3, 2), 2)
        out_l2 = lrelu(Conv2d(nf, 1, 1, 0, dtype=dt, name="upconv1_L2")(out[1]))
        out_l2 = pixel_shuffle(out_l2, 2)
        out_fuse = jnp.concatenate([out[0], out_l2, out_l3], axis=-1)
        o = lrelu(pixel_shuffle(
            Conv2d(nf * 4, 3, 1, 1, dtype=dt, name="upconv1")(out_fuse), 2))
        o = lrelu(pixel_shuffle(
            Conv2d(nf * 4, 1, 1, 0, dtype=dt, name="upconv2")(o), 2))
        o = Conv2d(1, 3, 1, 1, dtype=dt, name="conv_last")(o)
        base = interpolate_bilinear(x_center, scale_factor=4.0)
        return (o + base).astype(jnp.float32), l1.reshape(b, n, h, w, nf)


class CVSRV9(nn.Module):
    """CVSR_V9 (`:5019-5126`): CVSR_V8 with the LLongRangAttention_1
    spatial-compensate variant (full-res sigmoid mask, swapped direct
    convs)."""

    cfg: ModelConfig = ModelConfig(name="cvsr_v9")

    @nn.compact
    def __call__(self, lrs, mvs0, mvs1, pms, rms, ufs, pre_l1=None):
        # V9 == V8 wiring with EGLA1 as the RDAB slot; reuse the V8 body by
        # swapping the module via a subclassed configuration.
        model = _V8WithEGLA1(self.cfg, name="body")
        return model(lrs, mvs0, mvs1, pms, rms, ufs, pre_l1)


class _V8WithEGLA1(CVSRV8):
    def _make_rdab(self):
        # torch name stays 'RDAB' (`:5046` assigns LLongRangAttention_1 to
        # the same attribute)
        return EGLA1(self.cfg.nf, dtype=self.cfg.compute_dtype, name="RDAB")
