"""Pin the EGLA direct-conv and MDTA normalisation semantics vs torch."""
import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from cdfo_tpu.models.attention import _conv9_along, _l2_normalize


def test_conv9_channel_axis_matches_directW1(rng):
    """directW1_conv: Conv2d(1,1,(1,9),pad=(0,4)) on (B,1,W,C) — conv along C."""
    x = rng.randn(3, 5, 16).astype(np.float32)  # (tokens, w, c)
    k = rng.randn(9).astype(np.float32)
    b = np.float32(rng.randn())
    w_t = torch.from_numpy(k).reshape(1, 1, 1, 9)
    ref = F.conv2d(torch.from_numpy(x).unsqueeze(1), w_t,
                   torch.tensor([b]), padding=(0, 4)).squeeze(1).numpy()
    ours = np.asarray(_conv9_along(jnp.asarray(x), jnp.asarray(k), b, axis=2))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_conv9_position_axis_matches_directH1(rng):
    """directH1_conv: Conv2d(1,1,(9,1),pad=(4,0)) on (B,1,H,C) — conv along H."""
    x = rng.randn(3, 7, 12).astype(np.float32)  # (tokens, h, c)
    k = rng.randn(9).astype(np.float32)
    b = np.float32(rng.randn())
    w_t = torch.from_numpy(k).reshape(1, 1, 9, 1)
    ref = F.conv2d(torch.from_numpy(x).unsqueeze(1), w_t,
                   torch.tensor([b]), padding=(4, 0)).squeeze(1).numpy()
    ours = np.asarray(_conv9_along(jnp.asarray(x), jnp.asarray(k), b, axis=1))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_l2_normalize_matches_torch(rng):
    x = rng.randn(2, 4, 8, 32).astype(np.float32)
    x[0, 0, 0] = 0  # degenerate row exercises the eps clamp
    ref = F.normalize(torch.from_numpy(x), dim=-1).numpy()
    ours = np.asarray(_l2_normalize(jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_gumbel_mask_statistics():
    """The hard mask is mostly zero (softmax over 64 channels rarely
    reaches 0.5) and per-pixel random in 'sample' mode."""
    import jax
    from cdfo_tpu.models.attention import EGLA

    egla = EGLA(in_dim=64, mask_mode="sample")
    res = jnp.ones((1, 16, 16, 64)) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 64))
    params = egla.init({"params": jax.random.PRNGKey(1),
                        "gumbel": jax.random.PRNGKey(2)}, res, x)
    out1 = egla.apply(params, res, x, rngs={"gumbel": jax.random.PRNGKey(3)})
    out2 = egla.apply(params, res, x, rngs={"gumbel": jax.random.PRNGKey(4)})
    assert out1.shape == x.shape
    # different gumbel draws -> different outputs (stochastic masks)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
