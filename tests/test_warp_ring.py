"""flow_warp_ring: quad-ring gather vs plain flow_warp, including the
tiled 4x4 fast path (blocky flows), its pixel-strip bottom rows, and
the lax.cond fallback for non-blocky flows."""
import numpy as np
import jax.numpy as jnp
import pytest

from cdfo_tpu.ops.warp import flow_warp, flow_warp_ring, quad_pack


def _ring(rng, l, h, w, c):
    frames = jnp.asarray(rng.rand(l, h, w, c).astype(np.float32))
    return frames, quad_pack(frames)


@pytest.mark.parametrize("tiled", [False, True])
@pytest.mark.parametrize("blocky", [False, True])
def test_ring_matches_flow_warp(tiled, blocky):
    rng = np.random.RandomState(0)
    l, h, w, c = 3, 16, 24, 8
    b = 4
    frames, ring = _ring(rng, l, h, w, c)
    fidx = jnp.asarray(np.array([0, 2, 1, 2], np.int32))
    if blocky:
        blk = rng.randn(b, h // 4, w // 4, 2).astype(np.float32) * 5
        fl = np.repeat(np.repeat(blk, 4, 1), 4, 2)
        fl[:, -2:] = 0.0  # zero-padded bottom rows (eval pipeline)
    else:
        fl = rng.randn(b, h, w, 2).astype(np.float32) * 5
    flow = jnp.asarray(fl)
    out = flow_warp_ring(ring, fidx, flow, tiled=tiled)
    ref = flow_warp(frames[np.asarray(fidx)], flow)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
