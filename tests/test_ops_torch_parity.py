"""Pin the core-op semantics against the torch primitives the reference used.

These tests define the contract that matters for checkpoint parity:
grid_sample(align_corners=True, zeros), interpolate(bilinear,
align_corners=False), PixelShuffle, ConvTranspose2d(s2 p2 [op1]).
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from cdfo_tpu.ops.warp import flow_warp
from cdfo_tpu.ops.resize import interpolate_bilinear, pixel_shuffle


def nchw(x_nhwc):
    return torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))


def to_nhwc(t_nchw):
    return t_nchw.detach().numpy().transpose(0, 2, 3, 1)


def torch_flow_warp(x, flow):
    """The reference flow_warp (`arch/SIDECVSR_our.py:3068-3099`) expressed
    directly with the torch primitive it wraps."""
    n, c, h, w = x.shape
    grid_y, grid_x = torch.meshgrid(
        torch.arange(0, h).float(), torch.arange(0, w).float(), indexing="ij")
    grid = torch.stack((grid_x, grid_y), 2)
    vgrid = grid + flow
    vx = 2.0 * vgrid[:, :, :, 0] / max(w - 1, 1) - 1.0
    vy = 2.0 * vgrid[:, :, :, 1] / max(h - 1, 1) - 1.0
    return F.grid_sample(x, torch.stack((vx, vy), dim=3),
                         mode="bilinear", padding_mode="zeros",
                         align_corners=True)


@pytest.mark.parametrize("shape", [(2, 16, 24, 3), (1, 8, 8, 64)])
def test_flow_warp_matches_grid_sample(rng, shape):
    x = rng.randn(*shape).astype(np.float32)
    flow = (rng.randn(shape[0], shape[1], shape[2], 2) * 3).astype(np.float32)
    ours = np.asarray(flow_warp(jnp.asarray(x), jnp.asarray(flow)))
    ref = to_nhwc(torch_flow_warp(nchw(x), torch.from_numpy(flow)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_flow_warp_zero_flow_identity(rng):
    x = rng.randn(1, 12, 10, 4).astype(np.float32)
    out = np.asarray(flow_warp(jnp.asarray(x), jnp.zeros((1, 12, 10, 2))))
    np.testing.assert_allclose(out, x, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("scale", [0.5, 2.0, 4.0])
@pytest.mark.parametrize("hw", [(16, 24), (34, 60), (17, 13)])
def test_interpolate_matches_torch(rng, scale, hw):
    x = rng.randn(2, hw[0], hw[1], 5).astype(np.float32)
    ours = np.asarray(interpolate_bilinear(jnp.asarray(x), scale_factor=scale))
    ref = to_nhwc(F.interpolate(nchw(x), scale_factor=scale, mode="bilinear",
                                align_corners=False))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_pixel_shuffle_matches_torch(rng):
    x = rng.randn(2, 6, 7, 64).astype(np.float32)
    ours = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
    ref = to_nhwc(F.pixel_shuffle(nchw(x), 2))
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("op", [0, 1])
@pytest.mark.parametrize("hw", [(18, 18), (33, 17)])
def test_conv_transpose_matches_torch(rng, op, hw):
    from cdfo_tpu.models.layers import ConvTranspose2d

    in_c, out_c, k, s, p = 6, 5, 3, 2, 2
    x = rng.randn(2, hw[0], hw[1], in_c).astype(np.float32)
    w_torch = rng.randn(in_c, out_c, k, k).astype(np.float32) * 0.2
    bias = rng.randn(out_c).astype(np.float32) * 0.1

    ref = F.conv_transpose2d(nchw(x), torch.from_numpy(w_torch),
                             torch.from_numpy(bias), stride=s, padding=p,
                             output_padding=op)
    mod = ConvTranspose2d(out_c, k, s, p, op)
    params = {"params": {"kernel": jnp.asarray(w_torch.transpose(2, 3, 0, 1)),
                         "bias": jnp.asarray(bias)}}
    ours = np.asarray(mod.apply(params, jnp.asarray(x)))
    assert ours.shape == to_nhwc(ref).shape
    np.testing.assert_allclose(ours, to_nhwc(ref), rtol=1e-4, atol=1e-4)


def test_conv2d_matches_torch(rng):
    from cdfo_tpu.models.layers import Conv2d

    x = rng.randn(2, 11, 13, 7).astype(np.float32)
    w = rng.randn(9, 7, 3, 3).astype(np.float32) * 0.2
    b = rng.randn(9).astype(np.float32)
    ref = F.conv2d(nchw(x), torch.from_numpy(w), torch.from_numpy(b),
                   stride=2, padding=2)
    mod = Conv2d(9, 3, 2, 2)
    params = {"params": {"conv": {
        "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
        "bias": jnp.asarray(b)}}}
    ours = np.asarray(mod.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, to_nhwc(ref), rtol=1e-4, atol=1e-4)


def test_channel_layernorm_matches_torch(rng):
    from cdfo_tpu.models.norms import ChannelLayerNorm

    x = rng.randn(2, 5, 6, 16).astype(np.float32)
    weight = rng.randn(16).astype(np.float32)
    bias = rng.randn(16).astype(np.float32)
    xt = torch.from_numpy(x)  # already channel-last for torch var over -1
    mu = xt.mean(-1, keepdim=True)
    sigma = xt.var(-1, keepdim=True, unbiased=False)
    ref = ((xt - mu) / torch.sqrt(sigma + 1e-5) * torch.from_numpy(weight)
           + torch.from_numpy(bias)).numpy()
    mod = ChannelLayerNorm(16)
    params = {"params": {"weight": jnp.asarray(weight), "bias": jnp.asarray(bias)}}
    ours = np.asarray(mod.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)
