"""Whole-module numerical parity against torch-primitive oracles.

These re-derive each module's published formula with torch ops (conv2d /
normalize / softmax) on the SAME weights our flax modules use — catching
wiring errors (channel orders, shared-weight groupings, normalisation axes)
that op-level tests can't see.
"""
import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp
import pytest

from cdfo_tpu.models.attention import MDTA
from cdfo_tpu.models.alignment import DualAttAlignment


def t(x):  # NHWC numpy -> torch NCHW
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


def tw(k):  # flax (kh,kw,in,out) -> torch (out,in,kh,kw)
    return torch.from_numpy(np.ascontiguousarray(
        np.asarray(k).transpose(3, 2, 0, 1)))


def test_mdta_matches_torch_formula(rng):
    dim, heads = 16, 4
    x = rng.randn(2, 8, 8, dim).astype(np.float32)
    mod = MDTA(dim, heads, use_bias=False)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(mod.apply(params, jnp.asarray(x)))

    p = params["params"]
    xt = t(x)
    qkv = F.conv2d(xt, tw(p["qkv"]["conv"]["kernel"]))
    qkv = F.conv2d(qkv, tw(p["qkv_dwconv"]["conv"]["kernel"]),
                   padding=1, groups=dim * 3)
    q, k, v = qkv.chunk(3, dim=1)
    b, c, h, w = q.shape

    def heads_(z):
        return z.reshape(b, heads, c // heads, h * w)

    q, k, v = heads_(q), heads_(k), heads_(v)
    q = F.normalize(q, dim=-1)
    k = F.normalize(k, dim=-1)
    temp = torch.from_numpy(np.asarray(p["temperature"]))
    attn = (q @ k.transpose(-2, -1)) * temp
    attn = attn.softmax(dim=-1)
    out = attn @ v
    out = out.reshape(b, c, h, w)
    out = F.conv2d(out, tw(p["project_out"]["conv"]["kernel"]))
    ref = out.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_dual_att_alignment_matches_torch_formula(rng):
    dim, heads = 16, 4
    shape = (1, 8, 8, dim)
    x = rng.randn(*shape).astype(np.float32)
    extra = rng.randn(*shape).astype(np.float32)
    pred = rng.randn(*shape).astype(np.float32)
    flow = (rng.randn(1, 8, 8, 2) * 1.5).astype(np.float32)

    mod = DualAttAlignment(dim, heads)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x),
                      jnp.asarray(extra), jnp.asarray(pred),
                      jnp.asarray(flow))
    ours = np.asarray(mod.apply(params, jnp.asarray(x), jnp.asarray(extra),
                                jnp.asarray(pred), jnp.asarray(flow)))

    p = params["params"]
    # --- torch oracle, formula from SIDECVSR_our.py:3455-3495 -----------
    def grid_sample_warp(feat, fl):
        n, c, h, w = feat.shape
        gy, gx = torch.meshgrid(torch.arange(h).float(),
                                torch.arange(w).float(), indexing="ij")
        grid = torch.stack((gx, gy), 2) + torch.from_numpy(fl)[0]
        vx = 2 * grid[..., 0] / max(w - 1, 1) - 1
        vy = 2 * grid[..., 1] / max(h - 1, 1) - 1
        return F.grid_sample(feat, torch.stack((vx, vy), -1)[None],
                             mode="bilinear", padding_mode="zeros",
                             align_corners=True)

    xt, extrat, predt = t(x), t(extra), t(pred)
    warped = grid_sample_warp(extrat, flow)
    fo_w = tw(p["fusion_out_0"]["conv"]["kernel"])
    fused = F.relu(F.conv2d(torch.cat([warped, predt], 1), fo_w))

    msa = p["msa"]

    def gate(v):
        g = v.mean(dim=(2, 3), keepdim=True)
        g = F.conv2d(g, tw(msa["conv_du_0"]["conv"]["kernel"]),
                     torch.from_numpy(np.asarray(msa["conv_du_0"]["conv"]["bias"])))
        g = F.relu(g)
        g = F.conv2d(g, tw(msa["conv_du_2"]["conv"]["kernel"]),
                     torch.from_numpy(np.asarray(msa["conv_du_2"]["conv"]["bias"])))
        return v * torch.sigmoid(g)

    def channel_msa(q_in, k_in, v_in):
        b, c, h, w = q_in.shape
        def hsplit(z):
            return z.reshape(b, heads, c // heads, h * w)
        q = F.normalize(hsplit(q_in), dim=-1)
        k = F.normalize(hsplit(k_in), dim=-1)
        v = hsplit(v_in)
        temp = torch.from_numpy(np.asarray(msa["temperature"]))
        attn = ((q @ k.transpose(-2, -1)) * temp).softmax(-1)
        out = (attn @ v).reshape(b, c, h, w)
        return F.conv2d(out, tw(msa["project_out"]["conv"]["kernel"]))

    out1 = channel_msa(xt, fused, gate(warped))
    out2 = channel_msa(xt, fused, gate(predt))
    agg = F.relu(F.conv2d(torch.cat([out1 + out2, xt], 1), fo_w))

    def conv2d_b(z, node, pad=0):
        return F.conv2d(z, tw(node["conv"]["kernel"]),
                        torch.from_numpy(np.asarray(node["conv"]["bias"])),
                        padding=pad)

    ca = agg.mean(dim=(2, 3), keepdim=True)
    ca = conv2d_b(ca, p["CALayer"]["conv_du_0"])
    ca = F.relu(ca)
    ca = torch.sigmoid(conv2d_b(ca, p["CALayer"]["conv_du_2"]))
    agg = agg * ca
    for rb in ("ResidualBlock", "ResidualBlock1"):
        r = F.relu(conv2d_b(agg, p[rb]["conv1"], pad=1))
        agg = agg + conv2d_b(r, p[rb]["conv2"], pad=1)
    ref = (agg + xt).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_egla_window_stage_matches_torch(rng):
    """The inverse-masked 8x8 window attention stage in isolation."""
    from einops import rearrange as re_np
    from cdfo_tpu.ops.fused_attention import token_self_attention

    c = 8
    q = rng.randn(1, 16, 16, c).astype(np.float32)
    v = rng.randn(1, 16, 16, c).astype(np.float32)
    mask = (rng.rand(1, 16, 16, c) > 0.7).astype(np.float32)

    qw = re_np(jnp.asarray(mask * q), "b (h dh) (w dw) c -> (b h w) (dh dw) c",
               dh=8, dw=8)
    vw = re_np(jnp.asarray(v), "b (h dh) (w dw) c -> (b h w) (dh dw) c",
               dh=8, dw=8)
    ours = np.asarray(token_self_attention(qw, vw, use_pallas=False))

    # torch oracle with the reference's rearrange semantics
    import torch
    from einops import rearrange
    qt = rearrange(torch.from_numpy(mask * q).permute(0, 3, 1, 2),
                   "b c (h dh) (w dw) -> (b h w) (dh dw) c", dh=8, dw=8)
    vt = rearrange(torch.from_numpy(v).permute(0, 3, 1, 2),
                   "b c (h dh) (w dw) -> (b h w) (dh dw) c", dh=8, dw=8)
    atn = (qt @ qt.transpose(-2, -1)).softmax(-1)
    ref = (atn @ vt).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
