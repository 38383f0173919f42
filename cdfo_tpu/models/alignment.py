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
                 center_hcw=None):
        """``center_hcw`` (B//nbr, H, C, W): when given, the tail
        (CALayer + 2 ResBlocks + center skip) runs as ONE row-major
        Pallas kernel (`ops/fused_tail.py`) and the output is returned in
        (B, H, C, W) layout — the trunk's native layout. The four tail
        convs are the NHWC C=64 shape XLA runs ~3x below the dual-form
        rate on this chip."""
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

    def _fast_tail(self, fo, ca, center_hcw):
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
        s = ca.scale(fo)                                  # (B, 1, 1, C)
        t = (jnp.transpose(fo, (0, 1, 3, 2))
             * jnp.transpose(s, (0, 1, 3, 2)))            # (B, H, C, W)
        bsz, h, _, w = t.shape
        bc = center_hcw.shape[0]
        nbr = bsz // bc
        wt, wp = _pick_tiles(w)
        rows = 16
        rpad = (-h) % rows
        tp = jnp.pad(t, ((0, 0), (4, 4 + rpad), (0, 0), (4, 124 + wp - w)))
        sk = jnp.pad(center_hcw.astype(dt),
                     ((0, 0), (0, rpad), (0, 0), (0, wp - w)))
        out = resblock_pair_hcw(
            tp, sk,
            dual_weights(k1a).astype(dt), b1a.reshape(-1, 1).astype(dt),
            dual_weights(k1b).astype(dt), b1b.reshape(-1, 1).astype(dt),
            dual_weights(k2a).astype(dt), b2a.reshape(-1, 1).astype(dt),
            dual_weights(k2b).astype(dt), b2b.reshape(-1, 1).astype(dt),
            img_h=h, img_w=w, nbr=nbr, rows=rows, wt=wt)
        return out[:, :h, :, :w]
