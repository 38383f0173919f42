"""PSNR/SSIM MATLAB-protocol tests."""
import numpy as np
import pytest

from cdfo_tpu.metrics import (
    bgr2ycbcr, calculate_psnr, calculate_ssim, psnr_jax, rgb2ycbcr,
    to_y_channel, ycbcr2rgb)


def test_psnr_identical_inf(rng):
    img = (rng.rand(32, 32, 1) * 255).astype(np.float64)
    assert calculate_psnr(img, img, 4) == float("inf")


def test_psnr_known_value():
    a = np.zeros((40, 40, 1), np.float64)
    b = np.full((40, 40, 1), 10.0)
    # mse = 100 -> psnr = 20*log10(255/10)
    expected = 20 * np.log10(255.0 / 10.0)
    np.testing.assert_allclose(calculate_psnr(a, b, 4), expected, rtol=1e-9)


def test_ssim_identical_is_one(rng):
    img = (rng.rand(48, 48) * 255).astype(np.float64)
    assert calculate_ssim(img[..., None], img[..., None], 4) == pytest.approx(1.0)


def test_ssim_decreases_with_noise(rng):
    img = (rng.rand(48, 48) * 255).astype(np.float64)
    noisy = img + rng.randn(48, 48) * 20
    s = calculate_ssim(img[..., None], noisy[..., None], 4)
    assert 0 < s < 0.99


def test_bt601_roundtrip(rng):
    rgb = rng.rand(16, 16, 3).astype(np.float32)
    ycbcr = rgb2ycbcr(rgb)
    back = ycbcr2rgb(ycbcr)
    np.testing.assert_allclose(back, rgb, atol=2e-3)


def test_bt601_y_black_white():
    black = np.zeros((2, 2, 3), np.uint8)
    white = np.full((2, 2, 3), 255, np.uint8)
    assert rgb2ycbcr(black, y_only=True).mean() == pytest.approx(16, abs=1)
    assert rgb2ycbcr(white, y_only=True).mean() == pytest.approx(235, abs=1)


def test_to_y_channel_gray_passthrough(rng):
    g = (rng.rand(8, 8, 1) * 255).astype(np.float64)
    np.testing.assert_allclose(to_y_channel(g), g, rtol=1e-5)


def test_psnr_jax_matches_numpy(rng):
    sr = rng.rand(2, 40, 40, 1).astype(np.float32)
    hr = rng.rand(2, 40, 40, 1).astype(np.float32)
    import jax.numpy as jnp

    ours = np.asarray(psnr_jax(jnp.asarray(sr), jnp.asarray(hr), crop_border=4))
    for b in range(2):
        ref = calculate_psnr(sr[b] * 255, hr[b] * 255, 4)
        np.testing.assert_allclose(ours[b], ref, rtol=1e-4)
