"""Deformable conv: golden values + randomized parity vs torchvision."""
import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from cdfo_tpu.ops.deform_conv import deform_conv2d


def test_simple_check_golden():
    """The reference's only unit test (`ops/dcn/simple_check.py:1-24`):
    2-channel 3x3 arange input, all-ones weight, offsets that retarget every
    tap at the window center -> [81, 99, ..., 225]."""
    x = np.arange(18, dtype=np.float32).reshape(1, 2, 3, 3)  # NCHW
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    # per-tap [dy,dx] canceling the tap displacement, repeated for 2 groups
    off = np.array([1, 1, 1, 0, 1, -1, 0, 1, 0, 0, 0, -1, -1, 1, -1, 0, -1, -1],
                   np.float32)
    off = np.tile(off, 2)  # deformable_groups=2
    offset = jnp.asarray(np.broadcast_to(off, (1, 3, 3, 36)))
    weight = jnp.ones((3, 3, 2, 1))
    out = deform_conv2d(x_nhwc, offset, weight, padding=1)
    expected = np.array([81, 99, 117, 135, 153, 171, 189, 207, 225], np.float32)
    np.testing.assert_allclose(np.asarray(out).flatten(), expected, atol=1e-5)


def naive_deform_conv(x, offset, weight, bias, mask, stride, padding, dilation):
    """Independent NCHW loop oracle implementing the published DCNv2 math:
    per output pixel and tap, bilinear-sample at
    (y*s - p + i*dil + dy, x*s - p + j*dil + dx), zero outside, modulate,
    accumulate with the conv weight."""
    b, cin, h, w = x.shape
    cout, _, kh, kw = weight.shape
    k = kh * kw
    g = offset.shape[1] // (2 * k)
    cpg = cin // g
    ho = (h + 2 * padding - (dilation * (kh - 1) + 1)) // stride + 1
    wo = (w + 2 * padding - (dilation * (kw - 1) + 1)) // stride + 1
    out = np.zeros((b, cout, ho, wo), np.float64)

    def sample(img, y, x_):
        y0, x0 = int(np.floor(y)), int(np.floor(x_))
        acc = 0.0
        for (iy, ix, wgt) in [
            (y0, x0, (1 - (y - y0)) * (1 - (x_ - x0))),
            (y0, x0 + 1, (1 - (y - y0)) * (x_ - x0)),
            (y0 + 1, x0, (y - y0) * (1 - (x_ - x0))),
            (y0 + 1, x0 + 1, (y - y0) * (x_ - x0)),
        ]:
            if 0 <= iy < img.shape[0] and 0 <= ix < img.shape[1]:
                acc += wgt * img[iy, ix]
        return acc

    for bi in range(b):
        for oy in range(ho):
            for ox in range(wo):
                for ki in range(kh):
                    for kj in range(kw):
                        t = ki * kw + kj
                        for gi in range(g):
                            dy = offset[bi, gi * 2 * k + 2 * t, oy, ox]
                            dx = offset[bi, gi * 2 * k + 2 * t + 1, oy, ox]
                            m = (mask[bi, gi * k + t, oy, ox]
                                 if mask is not None else 1.0)
                            sy = oy * stride - padding + ki * dilation + dy
                            sx = ox * stride - padding + kj * dilation + dx
                            for c in range(cpg):
                                cc = gi * cpg + c
                                v = sample(x[bi, cc], sy, sx) * m
                                out[bi, :, oy, ox] += v * weight[:, cc, ki, kj]
    if bias is not None:
        out += bias[None, :, None, None]
    return out.astype(np.float32)


@pytest.mark.parametrize("stride,padding,dilation", [(1, 1, 1), (2, 2, 1), (1, 2, 2)])
def test_parity_naive_v1(rng, stride, padding, dilation):
    b, h, w, cin, cout, k = 1, 7, 8, 4, 3, 3
    ho = (h + 2 * padding - (dilation * (k - 1) + 1)) // stride + 1
    wo = (w + 2 * padding - (dilation * (k - 1) + 1)) // stride + 1
    x = rng.randn(b, cin, h, w).astype(np.float32)
    offset = (rng.randn(b, 2 * k * k, ho, wo) * 1.5).astype(np.float32)
    weight = (rng.randn(cout, cin, k, k) * 0.2).astype(np.float32)
    bias = rng.randn(cout).astype(np.float32)

    ref = naive_deform_conv(x, offset, weight, bias, None, stride, padding, dilation)
    ours = deform_conv2d(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(offset.transpose(0, 2, 3, 1)),
        jnp.asarray(weight.transpose(2, 3, 1, 0)),
        bias=jnp.asarray(bias), stride=stride, padding=padding,
        dilation=dilation)
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref,
                               rtol=1e-3, atol=1e-4)


def test_parity_naive_modulated_groups(rng):
    b, h, w, cin, cout, k, g = 1, 6, 6, 4, 5, 3, 2
    x = rng.randn(b, cin, h, w).astype(np.float32)
    offset = (rng.randn(b, 2 * g * k * k, h, w) * 2).astype(np.float32)
    mask = rng.rand(b, g * k * k, h, w).astype(np.float32)
    weight = (rng.randn(cout, cin, k, k) * 0.2).astype(np.float32)

    ref = naive_deform_conv(x, offset, weight, None, mask, 1, 1, 1)
    ours = deform_conv2d(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(offset.transpose(0, 2, 3, 1)),
        jnp.asarray(weight.transpose(2, 3, 1, 0)),
        mask=jnp.asarray(mask.transpose(0, 2, 3, 1)), padding=1)
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref,
                               rtol=1e-3, atol=1e-4)


def test_zero_offset_equals_conv(rng):
    """With zero offsets and unit mask, deform conv == plain conv."""
    import torch.nn.functional as F

    x = rng.randn(1, 3, 10, 12).astype(np.float32)
    weight = (rng.randn(8, 3, 3, 3) * 0.3).astype(np.float32)
    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(weight), padding=1).numpy()
    ours = deform_conv2d(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.zeros((1, 10, 12, 18)),
        jnp.asarray(weight.transpose(2, 3, 1, 0)), padding=1)
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-4)


def test_gradients_flow(rng):
    x = jnp.asarray(rng.randn(1, 6, 6, 2).astype(np.float32))
    offset = jnp.asarray(rng.randn(1, 6, 6, 18).astype(np.float32))
    weight = jnp.asarray(rng.randn(3, 3, 2, 4).astype(np.float32) * 0.2)

    def f(x, o, w):
        return jnp.sum(deform_conv2d(x, o, w, padding=1) ** 2)

    gx, go, gw = jax.grad(f, argnums=(0, 1, 2))(x, offset, weight)
    assert np.isfinite(np.asarray(gx)).all()
    assert np.abs(np.asarray(go)).sum() > 0  # offsets get gradient
    assert np.abs(np.asarray(gw)).sum() > 0


def test_pack_modules_run(rng):
    from cdfo_tpu.models.dcn import DeformConvPack, ModulatedDeformConvPack

    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    for mod in [DeformConvPack(6, 3, padding=1, deformable_groups=2),
                ModulatedDeformConvPack(6, 3, padding=1, deformable_groups=2)]:
        params = mod.init(jax.random.PRNGKey(0), x)
        out = mod.apply(params, x)
        assert out.shape == (1, 8, 8, 6)
