"""CVSR_V8 — the flagship coding-prior-guided video-SR model, TPU-native.

Re-designed from the reference forward (`/root/reference/arch/
SIDECVSR_our.py:4371-4481`) with the same math but an XLA-friendly shape
discipline:

* NHWC everywhere; the 7-frame axis folds into batch for the shared-weight
  stages (feature extraction) and the 6 neighbours fold into batch for the
  per-neighbour EGLA+alignment loop (the reference runs a sequential Python
  loop over neighbours — here one batched call feeds the MXU 6x the work).
* The recurrent L1-feature cache for streaming inference (`:4416-4427`)
  is a pure function-level carry: pass ``pre_l1`` and only the newest frame
  is embedded.
* The unconditional featuremap dumps (`:4450` etc., broken paths) become
  optional ``sow('intermediates', ...)`` captures behind a flag.

Inputs (channels-last):
  lrs  (B, N, H, W, 1)  decoded LR Y frames, [0,1]
  mvs0 (B, N, H, W, 2)  expanded L0 flows (kept for API parity; V8 uses L1
                        only, as the reference does — `:4445`)
  mvs1 (B, N, H, W, 2)  expanded L1 flows, pixel units (dx, dy)
  pms  (B, N, H, W, 1)  partition maps, [0,1]
  rms  (B, N, H, W, 1)  residual maps, [0,1]
  ufs  (B, N, H, W, 1)  unfiltered prediction frames, [0,1]
  pre_l1 (B, N, H, W, nf) optional recurrent feature cache

Returns (sr (B, 4H, 4W, 1), l1_fea (B, N, H, W, nf)).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import ModelConfig
from ..ops.resize import interpolate_bilinear, pixel_shuffle
from .alignment import DualAttAlignment
from .attention import EGLA
from .layers import Conv2d, lrelu
from .prior_encoder import PartitionTransformerSA2, PartitionTransformerSAWoPAB
from .trunk import SCNetS


class _Conv1x1Params(nn.Module):
    """Bare 1x1-conv params (kernel (1,1,in,out) + bias) under a 'conv'
    scope so the checkpoint-converter path stays identical to Conv2d's."""

    in_ch: int
    out_ch: int

    @nn.compact
    def __call__(self):
        from .layers import torch_bias_init, torch_conv_kernel_init

        kernel = self.param("kernel", torch_conv_kernel_init,
                            (1, 1, self.in_ch, self.out_ch))
        bias = self.param("bias", torch_bias_init(self.in_ch), (self.out_ch,))
        return kernel, bias


class _TSAFusionParams(nn.Module):
    """tsa_fusion applied as a frame-contraction einsum — avoiding the
    (B,N,H,W,C)->(B,H,W,N*C) HBM transpose the channel-concat layout would
    force. Param tree path matches Conv2d ('tsa_fusion/conv/{kernel,bias}')."""

    n: int
    nf: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, aligned_fea):
        kernel, bias = _Conv1x1Params(self.n * self.nf, self.nf,
                                      name="conv")()
        # torch channel order is frame-major: (n, c) factorisation is exact
        w = kernel.reshape(self.n, self.nf, self.nf).astype(self.dtype)
        if isinstance(aligned_fea, tuple):
            # (neighbours (B, N-1, ...), center (B, ...)) — the frame
            # contraction splits exactly; avoids materialising the
            # (B, N, H, W, C) temporal concat (467 MB/step at production).
            # In "hcw" layout the operands are (B, [N-1,] H, C, W).
            nbr, center, layout = aligned_fea
            c = self.n // 2
            wn = jnp.concatenate([w[:c], w[c + 1:]], axis=0)
            if layout == "hcw":
                out = (jnp.einsum("bnhcw,nco->bhow", nbr, wn)
                       + jnp.einsum("bhcw,co->bhow", center, w[c]))
                return out + bias.astype(self.dtype)[None, None, :, None]
            out = (jnp.einsum("bnhwc,nco->bhwo", nbr, wn)
                   + jnp.einsum("bhwc,co->bhwo", center, w[c]))
        else:
            out = jnp.einsum("bnhwc,nco->bhwo", aligned_fea, w)
        return out + bias.astype(self.dtype)


class _SubpixelUp2(nn.Module):
    """1x1 conv (nf -> 4nf) + PixelShuffle(2), fused into ONE lhs-dilated
    conv with a 2x2 phase kernel — numerically identical (torch PS channel
    order c*4+dy*2+dx) but transpose-free. Params keep the Conv2d tree path
    ('upconvN/conv/{kernel,bias}') for the checkpoint converter."""

    nf: int
    dtype: Any = jnp.float32

    def setup(self):
        self._conv = _Conv1x1Params(self.nf, self.nf * 4, name="conv")

    def raw(self):
        """Raw (kernel, bias) for the fused-head kernel path."""
        return self._conv()

    def __call__(self, x, layout: str = "nhwc"):
        kernel, bias = self._conv()
        if layout == "hcw":
            # row-major path: 1x1 conv = channel einsum (W stays in lanes),
            # PixelShuffle = (c dy dx) channel split interleaved into rows
            # and lanes — torch channel order c*4 + dy*2 + dx
            b_, h, c, w = x.shape
            k = kernel[0, 0].astype(self.dtype)            # (nf, 4nf)
            y = jnp.einsum("bhcw,co->bhow", x, k) + bias.astype(
                self.dtype)[None, None, :, None]
            y = y.reshape(b_, h, self.nf, 2, 2, w)          # c, dy, dx
            y = y.transpose(0, 1, 3, 2, 5, 4)               # b h dy c w dx
            return y.reshape(b_, 2 * h, self.nf, 2 * w)
        wk = kernel[0, 0].reshape(self.nf, self.nf, 2, 2)  # in, c, dy, dx
        k = wk[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)     # ky=1-dy, kx=1-dx
        y = jax.lax.conv_general_dilated(
            x, k.astype(self.dtype), (1, 1), ((1, 1), (1, 1)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        b = bias.reshape(self.nf, 2, 2)
        # bias per output phase: out(2y+dy, 2x+dx, c) += bias[c*4+dy*2+dx]
        bb = b.transpose(1, 2, 0).reshape(1, 1, 2, 1, 2, self.nf)
        h2, w2 = y.shape[1], y.shape[2]
        y = y.reshape(-1, h2 // 2, 2, w2 // 2, 2, self.nf) + bb.astype(self.dtype)
        return y.reshape(-1, h2, w2, self.nf)


class CVSRV8(nn.Module):
    cfg: ModelConfig = ModelConfig()
    capture_features: bool = False

    def setup(self):
        cfg = self.cfg
        dt = cfg.compute_dtype
        self.conv_first = Conv2d(cfg.nf, 3, 1, 1, dtype=dt, name="conv_first")
        self.conv_second = Conv2d(cfg.nf, 3, 1, 1, dtype=dt, name="conv_second")
        if cfg.use_pab:
            if cfg.fused_embed:
                from .prior_encoder import PartitionTransformerSA2Fast
                self.transformer_feature_extraction = \
                    PartitionTransformerSA2Fast(
                        cfg.nf, cfg.mdta_heads, dtype=dt,
                        name="transformer_feature_extraction")
            else:
                self.transformer_feature_extraction = PartitionTransformerSA2(
                    cfg.nf, cfg.mdta_heads, dtype=dt,
                    name="transformer_feature_extraction")
        else:
            self.transformer_feature_extraction = PartitionTransformerSAWoPAB(
                cfg.nf, cfg.mdta_heads, dtype=dt,
                name="transformer_feature_extraction")
        self.conv_expand_fea_r = Conv2d(cfg.nf, 3, 1, 1, dtype=dt,
                                        name="conv_expand_fea_r")
        # the reference ablations REMOVE the prior-expansion convs whose
        # branch is off (commented-out ctor lines `:4603,4922`): woPd has no
        # conv_expand_ufs, woLA no conv_expand_rms
        if cfg.use_pd:
            self.conv_expand_ufs = Conv2d(cfg.nf, 3, 1, 1, dtype=dt,
                                          name="conv_expand_ufs")
        if cfg.use_la or not cfg.use_egla:
            self.conv_expand_rms = Conv2d(cfg.nf, 3, 1, 1, dtype=dt,
                                          name="conv_expand_rms")
        self._tsa = _TSAFusionParams(cfg.nframes, cfg.nf, dtype=dt,
                                     name="tsa_fusion")
        if cfg.fused_trunk:
            from .trunk_fast import SCNetFast
            self.recon_trunk = SCNetFast(cfg.nf, cfg.scn_groups, dtype=dt,
                                         use_int8=cfg.trunk_int8,
                                         name="recon_trunk")
        elif cfg.scan_trunk:
            from .trunk import SCNetSScan
            self.recon_trunk = SCNetSScan(cfg.nf, cfg.scn_groups, dtype=dt,
                                          name="recon_trunk")
        else:
            self.recon_trunk = SCNetS(cfg.nf, cfg.scn_groups, dtype=dt,
                                      name="recon_trunk")
        self.upconv1 = _SubpixelUp2(cfg.nf, dtype=dt, name="upconv1")
        self.upconv2 = _SubpixelUp2(cfg.nf, dtype=dt, name="upconv2")
        if cfg.fused_trunk:
            # raw params (same tree path) — the head runs in HCW layout,
            # conv_last as a dual-form einsum (see _reconstruct)
            from .trunk_fast import _ConvParams
            self.conv_last_p = _ConvParams(3, 3, cfg.nf, 1,
                                           scaled_init=False,
                                           name="conv_last")
        else:
            self.conv_last = Conv2d(1, 3, 1, 1, dtype=dt, name="conv_last")
        self.mv_deform_align = DualAttAlignment(
            cfg.nf, cfg.align_heads, use_mv=cfg.use_mv, use_pd=cfg.use_pd,
            dtype=dt, name="MV_deform_align")
        if cfg.use_egla:
            self.rdab = self._make_rdab()

    def _make_rdab(self):
        """The RDAB-slot module (torch name 'RDAB'); V9 overrides this."""
        cfg = self.cfg
        dt = cfg.compute_dtype
        if not cfg.use_la:          # CVSR_V8_woLA (`:4617,4668`)
            from .attention_variants import EGLAwoLA
            return EGLAwoLA(cfg.nf, dtype=dt, name="RDAB")
        if not cfg.use_ga:          # CVSR_V8_woGA (`:4723,4774`)
            from .attention_variants import EGLAwoGA
            return EGLAwoGA(cfg.nf, dtype=dt, name="RDAB")
        return EGLA(cfg.nf, mask_mode=cfg.mask_mode, fused=cfg.fused_egla,
                    dtype=dt, name="RDAB")

    def embed(self, frames, pms):
        """Shared-weight feature extraction for a stack of frames.

        frames, pms: (M, H, W, 1) -> (M, H, W, nf)
        """
        l1 = lrelu(self.conv_first(frames))
        if self.cfg.use_pab:
            sides = self.conv_second(pms)
            return self.transformer_feature_extraction(l1, sides)
        return self.transformer_feature_extraction(l1)

    def _compensate(self, fea, rms):
        """Spatial-compensate block -> aligner input ``fea_i``.

        Center-INDEPENDENT (reference recomputes this per window membership
        — `:4446-4454` — but the value only depends on the neighbour frame,
        so streaming can compute it once per frame; see infer/engine.py).
        fea (M, H, W, nf), rms (M, H, W, 1) -> (M, H, W, nf).
        """
        cfg = self.cfg
        if cfg.use_egla:
            if not cfg.use_la:
                # woLA (`:4664-4668`): no rms branch at all — fea_com is
                # the bare neighbour feature
                x_n = self.rdab(fea)
            else:
                rms_prior = self.conv_expand_rms(rms)
                x_n = self.rdab(rms_prior, fea + rms_prior)
        else:
            x_n = fea + self.conv_expand_rms(rms)
        return self.conv_expand_fea_r(jnp.concatenate([fea, x_n], axis=-1))

    def _reconstruct(self, aligned_fea, center_lr):
        """ATFM fusion + CSSR trunk + upsample head + bilinear base.

        aligned_fea: (B, N, H, W, nf), or a (neighbours, center, layout)
        tuple (layout "hcw" = row-major (.., H, C, W) operands, in which
        case fusion/trunk/head all stay in that layout end to end).
        center_lr (B, H, W, 1) -> SR fp32.
        """
        cfg = self.cfg
        hcw = isinstance(aligned_fea, tuple) and aligned_fea[2] == "hcw"
        fused = lrelu(self._tsa(aligned_fea))
        if cfg.fused_trunk:
            out = self.recon_trunk(fused, out_layout="hcw",
                                   in_layout="hcw" if hcw else "nhwc")
            return self.head_from_trunk(out, center_lr)
        out = self.recon_trunk(fused)
        return self.head_from_trunk(out, center_lr)

    def head_from_trunk(self, out, center_lr):
        """Upsample head: 2x subpixel stages + conv_last + bilinear base.

        ``out`` is the trunk output — row-major (B, H, C, W) on the
        fused-trunk path (the whole head stays in that layout: NHWC C=64
        activations half-fill bf16 (16,128) vregs, measured ~2x slower
        for both compute and memory — BENCH_NOTES), NHWC otherwise.
        """
        cfg = self.cfg
        dt = cfg.compute_dtype
        if cfg.fused_trunk:
            from ..ops.fused_vjp import head_fused

            k1, b1 = self.upconv1.raw()
            k2, b2 = self.upconv2.raw()
            kl, bl = self.conv_last_p()
            return head_fused(out, center_lr.astype(dt),
                              k1, b1, k2, b2, kl, bl)
        out = lrelu(self.upconv1(out))
        out = lrelu(self.upconv2(out))
        out = self.conv_last(out)
        base = interpolate_bilinear(
            center_lr.astype(dt), scale_factor=float(cfg.scale))
        return (out + base).astype(jnp.float32)

    # ------------------------------------------------------------------
    # streaming-engine entry points (see cdfo_tpu/infer/engine.py): the
    # per-frame work (embed + compensate + prior expansion) is split from
    # the per-center work (align + fuse + reconstruct) so a sequence does
    # each frame's compensation ONCE instead of once per window membership
    # ------------------------------------------------------------------

    def compensate_frames(self, lrs, pms, rms, ufs):
        """Per-frame center-independent stage.

        lrs/pms/rms/ufs: (M, H, W, 1) — frame m's decoded LR, partition
        map, residual and unfiltered-pred (priors already max(1,i)-indexed
        by the caller). Returns (l1 (M, H, W, nf), quad_fi
        (M, H+2, W+2, 4nf) — the warp-ready quad-pack of the compensated
        feature, built ONCE per frame instead of per window membership —
        and ufs_prior (M, H, W, nf; zeros when use_pd=False)).
        """
        from ..ops.warp import quad_pack
        from ..ops.warp_block import pad_ring_frame

        cfg = self.cfg
        dt = cfg.compute_dtype
        l1 = self.embed(lrs.astype(dt), pms.astype(dt))
        fea_i = self._compensate(l1, rms.astype(dt))
        if cfg.use_pd:
            ufs_p = self.conv_expand_ufs(ufs.astype(dt))
        else:
            ufs_p = jnp.zeros_like(l1)
        pack = pad_ring_frame if cfg.block_warp else quad_pack
        return l1, pack(fea_i), ufs_p

    def align_reconstruct(self, center_l1, center_lr, quad_ring, nbr_ufs_p,
                          nbr_mv, nbr_idx):
        """Per-center stage, batched over k output frames.

        center_l1 (k, H, W, nf); center_lr (k, H, W, 1);
        quad_ring (L, H+2, W+2, 4nf) — quad-packed compensated features for
        every ring slot; nbr_idx (k, N-1) int32 ring slots per neighbour in
        temporal order excluding the center; nbr_ufs_p (k, N-1, H, W, nf);
        nbr_mv (k, N-1, H, W, 2) expanded L1 flows.
        Returns SR (k, sH, sW, 1). The neighbour warp gathers STRAIGHT from
        the ring (frame index composed into the pixel gather).
        """
        from ..ops.warp import flow_warp_ring
        from ..ops.warp_block import flow_warp_ring_block

        cfg = self.cfg
        dt = cfg.compute_dtype
        k, nm1 = nbr_idx.shape
        _, h, w, _ = center_l1.shape
        center_l1 = center_l1.astype(dt)
        ufs_p = (nbr_ufs_p.astype(dt).reshape(k * nm1, h, w, cfg.nf)
                 if cfg.use_pd else None)
        mv = nbr_mv.astype(dt).reshape(k * nm1, h, w, 2)
        ring_warp = (flow_warp_ring_block if cfg.block_warp
                     else flow_warp_ring)
        warped = (ring_warp(quad_ring.astype(dt),
                            nbr_idx.reshape(k * nm1), mv)
                  if cfg.use_mv else None)
        if cfg.fused_trunk:
            # fast tail: alignment exits in row-major (H, C, W); fusion,
            # trunk and head all stay in that layout
            center_hcw = jnp.transpose(center_l1, (0, 1, 3, 2))
            if cfg.fused_align and cfg.use_mv and cfg.use_pd:
                # fully-fused MSA: the center is indexed inside the
                # kernels (bi // nbr) — never broadcast to k*nm1
                aligned = self.mv_deform_align(None, None, ufs_p, mv,
                                               warped_feat=warped,
                                               center_hcw=center_hcw,
                                               center_nhwc=center_l1)
            else:
                center_rep = jnp.broadcast_to(
                    center_l1[:, None], (k, nm1, h, w, cfg.nf)
                ).reshape(k * nm1, h, w, cfg.nf)
                aligned = self.mv_deform_align(center_rep, None, ufs_p, mv,
                                               warped_feat=warped,
                                               center_hcw=center_hcw)
            aligned = aligned.reshape(k, nm1, h, cfg.nf, w)
            return self._reconstruct((aligned, center_hcw, "hcw"),
                                     center_lr)
        center_rep = jnp.broadcast_to(
            center_l1[:, None], (k, nm1, h, w, cfg.nf)
        ).reshape(k * nm1, h, w, cfg.nf)
        aligned = self.mv_deform_align(center_rep, None, ufs_p, mv,
                                       warped_feat=warped)
        aligned = aligned.reshape(k, nm1, h, w, cfg.nf)
        # neighbours stay in temporal order (center excluded); the tsa
        # fusion contracts them and the center separately — no concat
        return self._reconstruct((aligned, center_l1, "nhwc"), center_lr)

    def __call__(self, lrs, mvs0, mvs1, pms, rms, ufs,
                 pre_l1: Optional[jnp.ndarray] = None):
        cfg = self.cfg
        b, n, h, w, _ = lrs.shape
        center = cfg.center
        dt = cfg.compute_dtype
        lrs = lrs.astype(dt)
        pms = pms.astype(dt)
        rms = rms.astype(dt)
        ufs = ufs.astype(dt)

        # 1. GCPI feature extraction (with recurrent cache for streaming)
        if pre_l1 is None:
            l1_fea = self.embed(lrs.reshape(b * n, h, w, 1),
                                pms.reshape(b * n, h, w, 1))
            l1_fea = l1_fea.reshape(b, n, h, w, cfg.nf)
        else:
            new_fea = self.embed(lrs[:, -1], pms[:, -1])
            l1_fea = jnp.concatenate(
                [pre_l1.astype(dt)[:, 1:], new_fea[:, None]], axis=1)

        center_fea = l1_fea[:, center]

        # 2. MV-GSA: per-neighbour spatial compensation + alignment,
        #    neighbours folded into batch (shared weights)
        nbr_idx = [i for i in range(n) if i != center]
        nbr_fea = l1_fea[:, nbr_idx].reshape(b * (n - 1), h, w, cfg.nf)
        nbr_rms = rms[:, nbr_idx].reshape(b * (n - 1), h, w, 1)
        nbr_ufs = ufs[:, nbr_idx].reshape(b * (n - 1), h, w, 1)
        nbr_mv = mvs1.astype(dt)[:, nbr_idx].reshape(b * (n - 1), h, w, 2)

        ufs_prior = self.conv_expand_ufs(nbr_ufs) if cfg.use_pd else None
        fea_i = self._compensate(nbr_fea, nbr_rms)

        center_rep = jnp.broadcast_to(
            center_fea[:, None], (b, n - 1, h, w, cfg.nf)
        ).reshape(b * (n - 1), h, w, cfg.nf)
        aligned = self.mv_deform_align(center_rep, fea_i, ufs_prior, nbr_mv)
        aligned = aligned.reshape(b, n - 1, h, w, cfg.nf)

        # re-interleave with the center frame in temporal order
        parts = []
        for j, i in enumerate(range(n)):
            if i == center:
                parts.append(center_fea[:, None])
            else:
                k = nbr_idx.index(i)
                parts.append(aligned[:, k][:, None])
        aligned_fea = jnp.concatenate(parts, axis=1)  # (B, N, H, W, nf)
        if self.capture_features:
            self.sow("intermediates", "aligned_fea", aligned_fea)

        # 3+4. ATFM fusion, CSSR trunk, upsample head, bilinear base
        sr = self._reconstruct(aligned_fea, lrs[:, center])
        return sr, l1_fea


def make_model(cfg: ModelConfig | None = None, **kw) -> CVSRV8:
    return CVSRV8(cfg or ModelConfig(), **kw)
