"""Pallas block-gather warp (`ops/warp_block.py`) vs plain flow_warp:
the per-block-DMA fast path on 4x4-blockwise flows (incl. edge blocks
and the mixed bottom band), and the exact per-pixel fallback."""
import numpy as np
import jax.numpy as jnp
import pytest

from cdfo_tpu.ops.warp import flow_warp
from cdfo_tpu.ops.warp_block import flow_warp_ring_block, pad_ring_frame


def _mk(rng, l, h, w, c):
    frames = jnp.asarray(rng.rand(l, h, w, c).astype(np.float32))
    return frames, pad_ring_frame(frames)


@pytest.mark.parametrize("mix_bottom", [False, True])
def test_block_warp_matches_flow_warp(mix_bottom):
    rng = np.random.RandomState(0)
    l, h, w, c = 3, 16, 32, 8
    frames, ring = _mk(rng, l, h, w, c)
    b = 2
    fidx = jnp.asarray(np.array([2, 0], np.int32))
    blk = (rng.randn(b, h // 4, w // 4, 2) * 3.0).astype(np.float32)
    blk[0, 0, 0] = (-50.0, 2.0)       # fully outside
    blk[0, 0, 1] = (-1.5, -1.5)       # partially valid corner
    blk[1, -1, -1] = (2.5, h - 1.2)   # partially valid bottom edge
    flow = np.repeat(np.repeat(blk, 4, 1), 4, 2)
    if mix_bottom:
        # eval's 270->272 zero-pad analog: the bottom rows stop being
        # blockwise — they must route through the per-pixel bottom path
        flow[:, h - 2:] = 0.0
    flow = jnp.asarray(flow)
    out = flow_warp_ring_block(ring, fidx, flow)
    ref = flow_warp(frames[np.asarray(fidx)], flow)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_block_warp_pixel_fallback_exact():
    """Non-blockwise flows (top rows) -> the whole-image per-pixel
    fallback; still exact."""
    rng = np.random.RandomState(1)
    l, h, w, c = 2, 8, 16, 4
    frames, ring = _mk(rng, l, h, w, c)
    flow = jnp.asarray((rng.randn(2, h, w, 2) * 2.0).astype(np.float32))
    fidx = jnp.asarray(np.array([1, 0], np.int32))
    out = flow_warp_ring_block(ring, fidx, flow)
    ref = flow_warp(frames[np.asarray(fidx)], flow)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
