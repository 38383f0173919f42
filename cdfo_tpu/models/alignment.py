"""MV-guided temporal alignment (active CVSR_V8 path — no deformable conv).

``DualAttAlignment`` (`/root/reference/arch/SIDECVSR_our.py:3427-3496`):
flow-warp the neighbour features by the motion-vector field, fuse with the
unfiltered-prediction features, then two cross-MSAs (q = center frame,
k = fused, v = channel-gated warped / pred features) sharing the same
conv_du gate, temperature, and projection; aggregate with the *same*
``fusion_out`` conv used for the warp fusion (weight sharing is intentional
in the reference and reproduced here), then CALayer + 2 residual blocks.

The wo-Pd / wo-MV ablation variants (`:3502-3651`) drop one branch each.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import CALayer, Conv2d, ResidualBlockNoBN
from ..ops.warp import flow_warp

Dtype = Any


class _GateMSA(nn.Module):
    """Shared pieces of the two cross-MSAs: conv_du channel gate on v,
    L2-normalised q/k channel attention with learnable temperature."""

    dim: int = 64
    num_heads: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q_in, k_in, v_in):
        """``v_in`` may be a tuple of value tensors: attention and the
        (bias-free) output projection are linear in v and the attention
        matrix depends only on (q, k), so ``msa(q,k,v1) + msa(q,k,v2)``
        == ``msa(q,k,(v1,v2))`` exactly — at HALF the attention/projection
        cost. (The reference computes the two cross-MSAs with shared
        weights and identical q,k — `arch/SIDECVSR_our.py:3459-3490`.)"""
        b, h, w, c = q_in.shape
        temperature = self.param("temperature", nn.initializers.ones,
                                 (self.num_heads, 1, 1))
        du0 = Conv2d(self.dim // 16, 1, 1, 0, dtype=self.dtype,
                     name="conv_du_0")
        du2 = Conv2d(self.dim, 1, 1, 0, dtype=self.dtype, name="conv_du_2")
        vs = v_in if isinstance(v_in, tuple) else (v_in,)
        v_sum = None
        for v in vs:
            gate = jnp.mean(v, axis=(1, 2), keepdims=True)
            gate = jax.nn.sigmoid(du2(jax.nn.relu(du0(gate))))
            gv = v * gate
            v_sum = gv if v_sum is None else v_sum + gv
        v_in = v_sum

        # reshape-only head split; the pixel contraction rides dot_general
        # (no explicit (b, head, c, hw) transposes — see MDTA)
        ch = c // self.num_heads

        def to_x(t):  # (b, h, w, c) -> (b, hw, head, ch)
            return t.reshape(b, h * w, self.num_heads, ch)

        # normalization factored out of the gram product — see MDTA
        q = to_x(q_in)
        k = to_x(k_in)
        v = to_x(v_in)
        nq = jnp.maximum(jnp.sqrt(jnp.sum(
            jnp.square(q.astype(jnp.float32)), axis=1)), 1e-12)
        nk = jnp.maximum(jnp.sqrt(jnp.sum(
            jnp.square(k.astype(jnp.float32)), axis=1)), 1e-12)
        g = jnp.einsum("bxnc,bxnd->bncd", q, k,
                       preferred_element_type=jnp.float32)
        attn = g / (nq[..., :, None] * nk[..., None, :]) * temperature
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bncd,bxnd->bxnc", attn, v)
        out = out.reshape(b, h, w, c)
        return Conv2d(self.dim, 1, 1, 0, use_bias=False, dtype=self.dtype,
                      name="project_out")(out)


class DualAttAlignment(nn.Module):
    """forward(x=center feat, extra_feat=neighbour feat, pred_feat, flow).

    flow: (B, H, W, 2) pixel-unit (dx, dy).
    """

    dim: int = 64
    num_heads: int = 4
    use_mv: bool = True     # False => wo-MV ablation (no warp branch)
    use_pd: bool = True     # False => wo-Pd ablation (no pred branch)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, extra_feat, pred_feat, flow, warped_feat=None,
                 center_hcw=None, center_nhwc=None):
        """``center_hcw`` (B//nbr, H, C, W): when given, the tail
        (CALayer + 2 ResBlocks + center skip) runs as ONE row-major
        Pallas kernel (`ops/fused_tail.py`) and the output is returned in
        (B, H, C, W) layout — the trunk's native layout. The four tail
        convs are the NHWC C=64 shape XLA runs ~3x below the dual-form
        rate on this chip.

        ``center_nhwc`` (B//nbr, H, W, C): when ALSO given (streaming
        engine, use_mv+use_pd), the whole dual-MSA chain runs as the two
        W-major Pallas passes in `ops/fused_align.py` — x/extra_feat/flow
        are unused (the warp is precomputed) and the center is never
        broadcast to the neighbour batch."""
        if center_nhwc is not None:
            assert center_hcw is not None and warped_feat is not None \
                and self.use_mv and self.use_pd
            return self._fused_msa(warped_feat, pred_feat, center_nhwc,
                                   center_hcw)
        fusion_out_0 = Conv2d(self.dim, 1, 1, 0, use_bias=False,
                              dtype=self.dtype, name="fusion_out_0")
        msa = _GateMSA(self.dim, self.num_heads, dtype=self.dtype, name="msa")

        if not self.use_mv:
            # DualAttAlignment_woMV (`:3577-3646`): only the pred-feature MSA
            # (k = pred, unfused); extra_feat/flow unused
            out = msa(x, pred_feat, pred_feat)
        elif not self.use_pd:
            # DualAttAlignment_woPd (`:3502-3571`): only the warped MSA
            # (k = warped, unfused)
            if warped_feat is None:
                warped_feat = flow_warp(extra_feat, flow)
            out = msa(x, warped_feat, warped_feat)
        else:
            # streaming callers pass a precomputed warp (from the
            # quad-packed ring — see ops/warp.py:flow_warp_ring)
            if warped_feat is None:
                warped_feat = flow_warp(extra_feat, flow)
            fused_feat = jax.nn.relu(fusion_out_0(
                jnp.concatenate([warped_feat, pred_feat], axis=-1)))
            # == msa(x, fused, warped) + msa(x, fused, pred), exactly
            out = msa(x, fused_feat, (warped_feat, pred_feat))
        out = jax.nn.relu(fusion_out_0(jnp.concatenate([out, x], axis=-1)))
        ca = CALayer(self.dim, dtype=self.dtype, name="CALayer")
        if center_hcw is not None:
            return self._fast_tail(out, ca, center_hcw)
        out = ca(out)
        out = ResidualBlockNoBN(self.dim, dtype=self.dtype, name="ResidualBlock")(out)
        out = ResidualBlockNoBN(self.dim, dtype=self.dtype, name="ResidualBlock1")(out)
        return out + x

    def _fused_msa(self, warped, pred, center_nhwc, center_hcw):
        """Dual-MSA via `ops/fused_align.py`: two passes over the big
        operands, gates folded into the attention matrix, output in
        row-major layout straight into the fused tail kernel."""
        from ..ops.fused_align import msa_stage1, msa_stage2
        from ..ops.fused_mdta import attention_matrix
        from .trunk_fast import _ConvParams

        class _MSAParams(nn.Module):
            """Raw _GateMSA params (identical tree paths)."""

            dim: int
            num_heads: int

            @nn.compact
            def __call__(inner):
                temp = inner.param("temperature", nn.initializers.ones,
                                   (inner.num_heads, 1, 1))
                k0, b0 = _ConvParams(1, 1, inner.dim, inner.dim // 16,
                                     scaled_init=False, name="conv_du_0")()
                k2, b2 = _ConvParams(1, 1, inner.dim // 16, inner.dim,
                                     scaled_init=False, name="conv_du_2")()
                kp, _ = _ConvParams(1, 1, inner.dim, inner.dim,
                                    scaled_init=False, use_bias=False,
                                    name="project_out")()
                return temp, k0, b0, k2, b2, kp

        dt = self.dtype
        kf, _ = _ConvParams(1, 1, 2 * self.dim, self.dim, scaled_init=False,
                            use_bias=False, name="fusion_out_0")()
        temp, k0, b0, k2, b2, kp = _MSAParams(self.dim, self.num_heads,
                                              name="msa")()
        ca = CALayer(self.dim, dtype=dt, name="CALayer")

        b, h, w, c = warped.shape
        bc = center_nhwc.shape[0]
        nbr = b // bc
        rows = 16
        rpad = (-h) % rows

        def rpadded(t):
            return jnp.pad(t, ((0, 0), (0, rpad), (0, 0), (0, 0))) \
                if rpad else t

        warped = rpadded(warped.astype(dt))
        pred = rpadded(pred.astype(dt))
        center_p = rpadded(center_nhwc.astype(dt))
        wfuse = kf[0, 0].astype(dt)                       # (2C, C)

        stats = msa_stage1(warped, pred, center_p, wfuse,
                           img_h=h, img_w=w, nbr=nbr, rows=rows)
        amat = attention_matrix(stats[:, :3], temp, self.num_heads)
        npix = float(h * w)
        gap_w = (stats[:, 3, 0, :] / npix).astype(dt)     # (B, C)
        gap_p = (stats[:, 4, 0, :] / npix).astype(dt)

        def gate(g):
            y = jax.nn.relu(jnp.einsum("bc,co->bo", g, k0[0, 0].astype(dt))
                            + b0.astype(dt))
            y = jnp.einsum("bc,co->bo", y, k2[0, 0].astype(dt)) \
                + b2.astype(dt)
            return jax.nn.sigmoid(y)                      # (B, C)

        gw = gate(gap_w)
        gp = gate(gap_p)
        # fold the v-gates into the attention matrix (linear in v):
        # A (gw.w + gp.p) = (A diag(gw)) w + (A diag(gp)) p; stage 2 uses
        # the right-multiplication form M = diag(g) A^T
        amat_dt = amat.astype(dt)
        awt = jnp.swapaxes(amat_dt * gw[:, None, :], 1, 2)
        apt = jnp.swapaxes(amat_dt * gp[:, None, :], 1, 2)

        from .trunk_fast import _pick_tiles
        _, wp_t = _pick_tiles(w)
        # stage 2 writes fo DIRECTLY in the tail's slab layout; the
        # CALayer gate is applied inside the tail kernel — the full-res
        # gate-multiply + pad XLA pass between them is gone
        fo, st2 = msa_stage2(warped, pred, center_p, awt, apt,
                             kp[0, 0].astype(dt), wfuse,
                             img_h=h, img_w=w, nbr=nbr, rows=rows,
                             out_wpp=wp_t + 128)
        gap2 = (st2[:, 0, 0, :] / npix).astype(dt)
        s = ca.scale(gap2[:, None, None, :])              # (B, 1, 1, C)
        return self._tail_from_hcw(fo, center_hcw, gate=s[:, 0, 0, :],
                                   pre_rows=rows)

    def _fast_tail(self, fo, ca, center_hcw):
        s = ca.scale(fo)                                  # (B, 1, 1, C)
        t = (jnp.transpose(fo, (0, 1, 3, 2))
             * jnp.transpose(s, (0, 1, 3, 2)))            # (B, H, C, W)
        return self._tail_from_hcw(t, center_hcw)

    def _tail_from_hcw(self, t, center_hcw, gate=None, pre_rows=None):
        """``pre_rows`` set: ``t`` is already in the tail slab layout
        (B, Hp + 2*pre_rows, C, Wp + 128), written by ``msa_stage2`` —
        no XLA pad pass; ``gate`` (B, C) is applied inside the kernel."""
        from ..ops.fused_block import dual_weights
        from ..ops.fused_tail import resblock_pair_hcw
        from .trunk_fast import _ConvParams, _pick_tiles

        class _RawRB(nn.Module):
            dim: int

            @nn.compact
            def __call__(self):
                k1, b1 = _ConvParams(3, 3, self.dim, self.dim,
                                     name="conv1")()
                k2, b2 = _ConvParams(3, 3, self.dim, self.dim,
                                     name="conv2")()
                return k1, b1, k2, b2

        dt = self.dtype
        k1a, b1a, k1b, b1b = _RawRB(self.dim, name="ResidualBlock")()
        k2a, b2a, k2b, b2b = _RawRB(self.dim, name="ResidualBlock1")()
        bsz = t.shape[0]
        bc, h, _, w = center_hcw.shape
        nbr = bsz // bc
        wt, wp = _pick_tiles(w)
        rows = 16
        rpad = (-h) % rows
        if pre_rows is None:
            tp = jnp.pad(t, ((0, 0), (4, 4 + rpad), (0, 0),
                             (4, 124 + wp - w)))
            row_base = 4
        else:
            tp = t
            row_base = pre_rows
        sk = jnp.pad(center_hcw.astype(dt),
                     ((0, 0), (0, rpad), (0, 0), (0, wp - w)))
        out = resblock_pair_hcw(
            tp, sk,
            dual_weights(k1a).astype(dt), b1a.reshape(-1, 1).astype(dt),
            dual_weights(k1b).astype(dt), b1b.reshape(-1, 1).astype(dt),
            dual_weights(k2a).astype(dt), b2a.reshape(-1, 1).astype(dt),
            dual_weights(k2b).astype(dt), b2b.reshape(-1, 1).astype(dt),
            img_h=h, img_w=w, nbr=nbr, rows=rows, wt=wt,
            row_base=row_base, gate=gate)
        return out[:, :h, :, :w]
