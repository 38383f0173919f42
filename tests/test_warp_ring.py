"""flow_warp_ring: quad-ring gather vs plain flow_warp, including the
tiled 4x4 fast path (blocky flows), its pixel-strip bottom rows, and
the lax.cond fallback for non-blocky flows."""
import numpy as np
import jax.numpy as jnp
import pytest

from cdfo_tpu.ops.warp import (flow_warp, flow_warp_ring,
                               flow_warp_ring_wide, quad_pack, wide_pack)


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


@pytest.mark.parametrize("wblocky", [False, True])
def test_wide_ring_matches_flow_warp(wblocky):
    """Wide-pack ring warp == flow_warp for W-blockwise flows (one gather
    per 4-aligned group) AND arbitrary flows (per-pixel fallback)."""
    rng = np.random.RandomState(1)
    l, h, w, c = 3, 16, 24, 8
    b = 4
    frames = jnp.asarray(rng.rand(l, h, w, c).astype(np.float32))
    ring = wide_pack(frames)
    fidx = jnp.asarray(np.array([0, 2, 1, 2], np.int32))
    if wblocky:
        # W-blockwise only (rows vary freely — H-blockiness not needed)
        blk = rng.randn(b, h, w // 4, 2).astype(np.float32) * 5
        fl = np.repeat(blk, 4, 2)
        fl[:, -2:] = 0.0  # zero-padded bottom rows (eval pipeline)
    else:
        fl = rng.randn(b, h, w, 2).astype(np.float32) * 5
    flow = jnp.asarray(fl)
    out = flow_warp_ring_wide(ring, fidx, flow)
    ref = flow_warp(frames[np.asarray(fidx)], flow)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_wide_ring_extreme_flows():
    """Fully-outside and partially-valid blocks: keep-mask zeroing and
    unclipped starts for any block containing a valid pixel."""
    rng = np.random.RandomState(2)
    l, h, w, c = 2, 8, 16, 4
    frames = jnp.asarray(rng.rand(l, h, w, c).astype(np.float32))
    ring = wide_pack(frames)
    fidx = jnp.asarray(np.array([1, 0], np.int32))
    blk = np.zeros((2, h, w // 4, 2), np.float32)
    blk[0, :, 0] = (-30.0, 0.0)      # fully outside left
    blk[0, :, 1] = (w + 30.0, 0.0)   # fully outside right
    blk[0, :, 2] = (0.0, -h - 5.0)   # fully outside top
    blk[1, :, 0] = (-2.5, 0.0)       # partially valid left
    blk[1, :, 3] = (2.5, h - 1.2)    # partially valid bottom-right
    flow = jnp.asarray(np.repeat(blk, 4, 2))
    out = flow_warp_ring_wide(ring, fidx, flow)
    ref = flow_warp(frames[np.asarray(fidx)], flow)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
