"""Pallas manual-DMA BLOCK-GATHER warp — the round-5 warp kernel.

Coding-prior flows are constant over 4x4 blocks (HEVC MV granularity;
`mv2mvs` preserves it — see `ops/warp.py::flow_warp_ring`'s fast-path
note), so the bilinear warp needs ONE source patch per 4x4 output
block, not one gathered row per pixel. The shipped XLA row-gather costs
11.8 ns/index (3.13M indices/step ~ 37 ms at the headline geometry);
`tools/microbench_dma.py` measured per-block patch DMAs at **88
ns/DMA** (8160 block DMAs = one frame in 0.72 ms), so this kernel
replaces the per-pixel gather with per-block DMA copies:

* the ring stores UNPACKED features (C channels, not the 4C quad pack:
  2.5x less ring build/update HBM traffic) zero-padded by 8 rows/pixels
  per side, flattened to one 2D (L*Hp, Wp*C) buffer;
* per block, one async copy fetches a (16, 6*C) patch — the smallest
  legal tile-aligned unit covering the block's (5, 5) bilinear support
  (HBM DMA slices must be (8, 128)-tile aligned; starts are aligned on
  the host side and asserted with `pl.multiple_of`);
* the per-block bilinear blend runs on the VPU with scalar weights from
  SMEM (H-blend via dynamic sublane slices, W-blend via the two static
  64-lane-offset variants selected by the sub-pixel parity), per-pixel
  zeros-padding keep masks included;
* output accumulates in VMEM per 8-row band pair and leaves in ONE
  aligned (8, W*C) store per pair.

Semantics are identical to ``flow_warp_ring`` (bilinear,
padding_mode='zeros', align_corners=True) for 4x4-blockwise flows; the
public wrapper falls back to an exact per-pixel 4-tap gather for
arbitrary flows (slow — insurance, not a production path) and always
computes the LAST 4 rows per-pixel (the eval pipeline's 270->272 zero
pad mixes the bottom block — same rule as the retired tiled path).

Ref: `/root/reference/arch/SIDECVSR_our.py:3068-3099` (warp semantics).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD = 8          # zero border (rows and pixels) each side, tile-aligned
NSLOTS = 8       # patch DMAs in flight


def pad_ring_frame(x: jnp.ndarray) -> jnp.ndarray:
    """(M, H, W, C) -> (M, H+2*PAD, (W+2*PAD)*C): the block-warp ring
    layout (zero borders supply the bilinear zero taps)."""
    m, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))
    return xp.reshape(m, h + 2 * PAD, (w + 2 * PAD) * c)


def _prep(flow: jnp.ndarray, frame_idx: jnp.ndarray, h: int, w: int,
          hp: int, c: int):
    """Per-block DMA starts + blend params from per-pixel flows.

    flow: (B, H, W, 2) pixel-unit (dx, dy); frame_idx (B,) ring slots.
    Returns (ints (B, nby, nbx, 3) int32 [y_abs, x_lane, sub],
             flts (B, nby, nbx, 3) f32 [wy, wx, keep],
             blocky (bool) — flow equals its own 4x4 broadcast over the
             top H-4 rows).
    """
    b = flow.shape[0]
    nby, nbx = h // 4, w // 4
    fb = flow[:, ::4, ::4]                         # (B, nby, nbx, 2)
    gx = jax.lax.broadcasted_iota(jnp.float32, (nby, nbx), 1) * 4.0
    gy = jax.lax.broadcasted_iota(jnp.float32, (nby, nbx), 0) * 4.0
    sx = gx[None] + fb[..., 0].astype(jnp.float32)
    sy = gy[None] + fb[..., 1].astype(jnp.float32)
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0
    wy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    # DMA starts: clip only blocks with NO valid pixel (a block has a
    # valid pixel iff coord0 >= -4, since pixel t samples coord0+t and
    # -1 is the last in-range floor coord) so partially-valid edge
    # blocks gather from their true offsets; fully-outside blocks read
    # harmless in-bounds zeros (their per-pixel keep masks are 0)
    xc = jnp.clip(x0i, -5, w - 1) + PAD            # [3, w+7]
    yc = jnp.clip(y0i, -5, h - 1) + PAD            # [3, h+7]
    y8 = (yc // 8) * 8
    suby = yc - y8
    subx = xc % 2
    xlane = (xc // 2) * 2 * c
    y_abs = frame_idx[:, None, None] * hp + y8
    # pack per-pixel offsets the kernel reconstructs: sub = suby*2+subx,
    # plus the unclipped block coords for the keep masks
    ints = jnp.stack([y_abs, xlane, suby * 2 + subx], axis=-1)
    # keep needs the near-unclipped y0/x0 per pixel: y0_pix = y0_blk + r,
    # x0_pix = x0_blk + t. Coords are clipped to [-6, dim+5] — far enough
    # out that every pixel of the block still fails the keep test — so
    # the packed encode y0*4096 + (x0+2048) stays exact in f32.
    y0k = jnp.clip(y0i, -6, h + 5)
    x0k = jnp.clip(x0i, -6, w + 5)
    flts = jnp.stack([wy, wx,
                      y0k.astype(jnp.float32) * 4096.0
                      + (x0k + 2048).astype(jnp.float32)], axis=-1)
    hb = h - 4
    blk = flow[:, :hb]
    blocky = jnp.all(blk == jnp.repeat(
        jnp.repeat(blk[:, ::4, ::4], 4, axis=1), 4, axis=2))
    return ints, flts, blocky


def _kernel(ints_ref, flts_ref, ring_ref, out_ref, band, stage, sems, *,
            nbx, c, h, w):
    f32 = jnp.float32
    npair = 2 * nbx

    def get_dma(jj, slot):
        r2 = jj // nbx
        j = jj - r2 * nbx
        y = pl.multiple_of(ints_ref[0, r2, j, 0], 8)
        x = pl.multiple_of(ints_ref[0, r2, j, 1], 128)
        return pltpu.make_async_copy(
            ring_ref.at[pl.ds(y, 16), pl.ds(x, 6 * c)],
            stage.at[slot], sems.at[slot])

    for s in range(NSLOTS):
        get_dma(s, s).start()

    lane_t = jax.lax.broadcasted_iota(jnp.int32, (1, 4 * c), 1) // c
    # (4, 16) sublane-extraction index grids for the one-hot selectors
    rr = jax.lax.broadcasted_iota(jnp.int32, (4, 16), 0)
    kk = jax.lax.broadcasted_iota(jnp.int32, (4, 16), 1)

    def dotf(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    def make_body(r2):
        # r2 is a PYTHON constant so the band-row offsets below are
        # static (dynamic sublane indices must be tile-aligned on TPU)
        def body(j, carry):
            jj = r2 * nbx + j
            slot = jax.lax.rem(jj, NSLOTS)
            get_dma(jj, slot).wait()
            sub = ints_ref[0, r2, j, 2]
            suby = sub // 2
            subx = sub - suby * 2
            wy = flts_ref[0, r2, j, 0]
            wx = flts_ref[0, r2, j, 1]
            packed = flts_ref[0, r2, j, 2]
            # decode: packed = y0*4096 + (x0+2048), x0+2048 in [0, 4096)
            y0b = jnp.floor(packed / 4096.0)
            x0b = packed - y0b * 4096.0 - 2048.0
            tf = lane_t.astype(f32)
            colmask = ((x0b + tf >= -1.0)
                       & (x0b + tf <= w - 1.0)).astype(f32)
            # dynamic sublane ROTATE brings row suby to row 0, making
            # the H-tap slices static (dynamic sublane indexing must be
            # tile-aligned on TPU; a rotate is the cheap legal form)
            # dynamic_rotate is 32-bit only (and bitcasting bf16 packs
            # sublane PAIRS, the wrong granularity) — convert to f32,
            # which the blend needs anyway
            st = pltpu.roll(stage[slot].astype(f32),
                            shift=(16 - suby) % 16, axis=0)
            h04 = st[0:4]                      # rows suby .. suby+3
            h14 = st[1:5]                      # rows suby+1 .. suby+4
            hr4 = h04 * (1.0 - wy) + h14 * wy
            ea = hr4[:, 0:4 * c] * (1.0 - wx) + hr4[:, c:5 * c] * wx
            eb = hr4[:, c:5 * c] * (1.0 - wx) + hr4[:, 2 * c:6 * c] * wx
            out4 = jnp.where(subx == 0, ea, eb)
            rowv = (jax.lax.broadcasted_iota(jnp.int32, (4, 1), 0)
                    .astype(f32) + y0b)
            rowkeep = ((rowv >= -1.0) & (rowv <= h - 1.0)).astype(f32)
            out4 = out4 * (rowkeep * colmask)
            band[r2 * 4:r2 * 4 + 4,
                 pl.ds(pl.multiple_of(j * 4 * c, 128), 4 * c)] = (
                out4.astype(band.dtype))

            @pl.when(jj + NSLOTS < npair)
            def _():
                get_dma(jj + NSLOTS, slot).start()

            return carry

        return body

    jax.lax.fori_loop(0, nbx, make_body(0), 0)
    jax.lax.fori_loop(0, nbx, make_body(1), 0)
    out_ref[:] = band[:]


def _block_warp_call(ring2d, ints, flts, *, h, w, c):
    b, nby, nbx, _ = ints.shape
    grid = (b * nby // 2,)
    kernel = functools.partial(_kernel, nbx=nbx, c=c, h=h, w=w)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # index_map is in BLOCK units: band-pair p covers source rows
            # [2p, 2p+2) via block index p on a block of extent 2
            pl.BlockSpec((1, 2, nbx, 3), lambda q: (q // (nby // 2),
                                                    q % (nby // 2),
                                                    0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2, nbx, 3), lambda q: (q // (nby // 2),
                                                    q % (nby // 2),
                                                    0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((8, w * c), lambda q: (q, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * nby * 4, w * c), ring2d.dtype),
        scratch_shapes=[
            pltpu.VMEM((8, w * c), ring2d.dtype),          # band
            pltpu.VMEM((NSLOTS, 16, 6 * c), ring2d.dtype),  # stage
            pltpu.SemaphoreType.DMA((NSLOTS,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(ints, flts, ring2d)
    return out.reshape(b, nby * 4, w, c)


def _pixel_fallback(ring: jnp.ndarray, frame_idx: jnp.ndarray,
                    flow: jnp.ndarray, h: int, w: int, c: int,
                    y_offset: int = 0):
    """Exact per-pixel 4-tap gather from the PADDED unpacked ring —
    matches `warp.py::_warp_from_quad` semantics without the quad pack.
    Slow (4x the quad path's index count); correctness insurance and the
    bottom-rows path only. ``y_offset`` is the absolute image row of
    ``flow``'s first row (the bottom-band call passes H-4)."""
    l, hp, wpc = ring.shape
    wp = wpc // c
    b = flow.shape[0]
    fdtype = jnp.float32
    gx = jax.lax.broadcasted_iota(fdtype, flow.shape[1:3], 1)
    gy = jax.lax.broadcasted_iota(fdtype, flow.shape[1:3], 0) + y_offset
    sx = gx[None] + flow[..., 0].astype(fdtype)
    sy = gy[None] + flow[..., 1].astype(fdtype)
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx1 = (sx - x0).astype(fdtype)
    wy1 = (sy - y0).astype(fdtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    keep = (((y0i >= -1) & (y0i <= h - 1) & (x0i >= -1) & (x0i <= w - 1))
            .astype(fdtype))
    flat = ring.reshape(l * hp * wp, c)
    fr = frame_idx.reshape(b, 1, 1)
    # clamp to hp-2/wp-2 so the +1 taps stay in-bounds on the LAST ring
    # slot (an OOB gather poisons the output on TPU); only keep=0
    # samples ever hit the clamp, and the pad band is zero anyway
    py = jnp.clip(y0i + PAD, 0, hp - 2)
    px = jnp.clip(x0i + PAD, 0, wp - 2)

    def tap(dy, dx):
        idx = fr * (hp * wp) + (py + dy) * wp + (px + dx)
        return jnp.take(flat, idx.reshape(-1), axis=0).reshape(
            *py.shape, c)

    w00 = (keep * (1 - wy1) * (1 - wx1))[..., None]
    w01 = (keep * (1 - wy1) * wx1)[..., None]
    w10 = (keep * wy1 * (1 - wx1))[..., None]
    w11 = (keep * wy1 * wx1)[..., None]
    return (tap(0, 0) * w00 + tap(0, 1) * w01
            + tap(1, 0) * w10 + tap(1, 1) * w11)


def flow_warp_ring_block(ring: jnp.ndarray, frame_idx: jnp.ndarray,
                         flow: jnp.ndarray) -> jnp.ndarray:
    """Warp frames picked from an UNPACKED padded ring
    (:func:`pad_ring_frame` per slot) by per-image flows — same
    semantics as ``warp.py::flow_warp_ring`` / ``flow_warp(ring[i], f)``.

    Fast path (4x4-blockwise flows over the top H-4 rows, the
    coding-prior case): the Pallas block-gather kernel; bottom 4 rows
    and non-blockwise flows use the exact per-pixel gather.
    """
    l, hp, wpc = ring.shape
    b, h, w, _ = flow.shape
    c = wpc // (w + 2 * PAD)
    hb = h - 4
    ints, flts, blocky = _prep(flow, frame_idx, h, w, hp, c)
    ring2d = ring.reshape(l * hp, wpc)

    def fast(_):
        full = _block_warp_call(ring2d, ints, flts, h=h, w=w, c=c)
        bottom = _pixel_fallback(ring, frame_idx, flow[:, hb:], h, w, c,
                                 y_offset=hb)
        return jnp.concatenate([full[:, :hb], bottom], axis=1)

    def slow(_):
        return _pixel_fallback(ring, frame_idx, flow, h, w, c)

    out = jax.lax.cond(blocky, fast, slow, None)
    return out.astype(ring.dtype)
