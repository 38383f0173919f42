import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cdfo_tpu.config import ModelConfig
from cdfo_tpu.models import MODEL_REGISTRY, build_model


def small_inputs(h=16, w=16):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    return (jax.random.uniform(ks[0], (1, 7, h, w, 1)),
            jax.random.normal(ks[1], (1, 7, h, w, 2)) * 0.3,
            jax.random.normal(ks[2], (1, 7, h, w, 2)) * 0.3,
            jax.random.uniform(ks[3], (1, 7, h, w, 1)),
            jax.random.uniform(ks[4], (1, 7, h, w, 1)) - 0.5,
            jax.random.uniform(ks[5], (1, 7, h, w, 1)))


RNGS = {"params": jax.random.PRNGKey(1), "gumbel": jax.random.PRNGKey(2)}


@pytest.mark.parametrize("name", ["cvsr_v8_wola", "cvsr_v8_woga",
                                  "cvsr_v8_womv", "cvsr_v8_wopd"])
def test_v8_ablations_via_registry(name):
    cfg_kw = {"cvsr_v8_wola": dict(use_la=False),
              "cvsr_v8_woga": dict(use_ga=False),
              "cvsr_v8_womv": dict(use_mv=False),
              "cvsr_v8_wopd": dict(use_pd=False)}[name]
    cfg = ModelConfig(name=name, scn_groups=1, mask_mode="expected", **cfg_kw)
    model = build_model(name, cfg)
    args = small_inputs()
    params = model.init(RNGS, *args)
    sr, _ = model.apply(params, *args)
    assert sr.shape == (1, 64, 64, 1)
    assert np.isfinite(np.asarray(sr)).all()


def test_registry_complete():
    for name in ["cvsr_v8", "cvsr_v8_wopab", "cvsr_v8_wola", "cvsr_v8_woga",
                 "cvsr_v8_womv", "cvsr_v8_wopd", "cvsr_v7", "cvsr_v9",
                 "sidecvsr"]:
        assert name in MODEL_REGISTRY
    with pytest.raises(KeyError):
        build_model("nope")


def test_haar_dwt_reconstruction(rng):
    from cdfo_tpu.losses.wavelet import haar_dwt

    x = jnp.asarray(rng.rand(2, 16, 16, 1).astype(np.float32))
    ll, lh, hl, hh = haar_dwt(x)
    assert ll.shape == (2, 8, 8, 1)
    # orthonormal haar: energy preserved
    e_in = float(jnp.sum(x ** 2))
    e_out = float(sum(jnp.sum(t ** 2) for t in (ll, lh, hl, hh)))
    np.testing.assert_allclose(e_in, e_out, rtol=1e-5)
    # perfect reconstruction of the 2x2 means from LL
    np.testing.assert_allclose(
        np.asarray(ll) * 0.5,
        np.asarray(x.reshape(2, 8, 2, 8, 2, 1).mean(axis=(2, 4))), rtol=1e-5)


def test_haar_dwt_matches_pytorch_wavelets_convention(rng):
    """Oracle vs torch grouped-conv haar DWT (orthonormal filters)."""
    import torch
    import torch.nn.functional as F

    x = rng.rand(1, 1, 8, 8).astype(np.float32)
    h = np.array([1, 1], np.float32) / np.sqrt(2)
    g = np.array([-1, 1], np.float32) / np.sqrt(2)

    def filt2(img, fy, fx):
        k = torch.from_numpy(np.outer(fy, fx).astype(np.float32))[None, None]
        return F.conv2d(torch.from_numpy(img), k, stride=2).numpy()

    from cdfo_tpu.losses.wavelet import haar_dwt
    import jax.numpy as jnp

    ll, lh, hl, hh = haar_dwt(jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(ll)[0, :, :, 0],
                               filt2(x, h, h)[0, 0], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(lh)[0, :, :, 0],
                               filt2(x, g, h)[0, 0], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hl)[0, :, :, 0],
                               filt2(x, h, g)[0, 0], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hh)[0, :, :, 0],
                               filt2(x, g, g)[0, 0], rtol=1e-5, atol=1e-6)


def test_multiwave_contrastive_loss(rng):
    from cdfo_tpu.losses.wavelet import charbonnier_fcl_loss

    sr = jnp.asarray(rng.rand(2, 16, 16, 1).astype(np.float32))
    hr = jnp.asarray(rng.rand(2, 16, 16, 1).astype(np.float32))
    lr = jnp.asarray(rng.rand(2, 16, 16, 1).astype(np.float32))

    def fake_lpips(a, b):  # stand-in distance; real one needs weights
        return jnp.mean(jnp.abs(a - b), axis=(1, 2, 3))

    loss = charbonnier_fcl_loss(sr, hr, lr, fake_lpips,
                                rng=jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
