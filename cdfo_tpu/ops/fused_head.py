"""Fused upsample-head Pallas kernel: both subpixel stages + conv_last +
the bilinear x4 base in ONE pass, phase-major — the 2x and 4x feature
intermediates never touch HBM.

The reference head (`/root/reference/arch/SIDECVSR_our.py:4390-4393,
4473-4480`) is ``lrelu(PS2(upconv1(x))) -> lrelu(PS2(upconv2(.))) ->
conv_last -> + bilinear x4 base``. Materialised naively the 4x 64-channel
intermediate alone is ~267 MB/frame at the headline geometry (~18 ms of
HBM round-trips at the chip's measured elementwise bandwidth — the whole
head measured 13-22 ms).

Phase-major formulation on (H, C, W) rows: a 4x pixel (4m+ry, 4n+rx) is
(1x position (m, n), phase (ry, rx)); ry = 2*dy1 + dy2 for the two
PixelShuffle stages. Both 1x1 convs act per 1x position:

* upconv1: (256, 64) matmul per row, output rows PERMUTED p1-major
  (host-side weight permutation) so stage-2 reads contiguous 64-channel
  sublane blocks;
* upconv2: four (256, 64) matmuls (one per p1), giving the 1024-channel
  phase-major y2 row = (p1, p2, c);
* conv_last (3x3 at 4x, zero-padded) folds into THREE (16, 3072) matmuls
  per output row over the free-reshaped 3-row y2 stack, one per 1x column
  offset, with static output-window shifts — tap (dy, dx) of out-phase
  (ry, rx) lands on y2 phase ((ry+dy) mod 4, (rx+dx) mod 4) at 1x offset
  (floor((ry+dy)/4), floor((rx+dx)/4));
* the bilinear x4 base (align_corners=False: per-phase 2-tap stencils
  0.375/0.625 and 0.125/0.875, border-clamped via an edge-padded LR slab)
  is added in-kernel.

Output is the PHASE-MAJOR SR frame (B, H, 16, W) in fp32; the host-side
wrapper rearranges to (B, 4H, 4W, 1) with one cheap 1-channel pass.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def perm_subpixel_weights(kernel, bias):
    """(1,1,nf,4nf) + (4nf,) -> (4nf, nf) matmul matrix with rows permuted
    phase-major ((dy,dx,c) instead of torch's (c,dy,dx)) + (4nf, 1) bias."""
    nf = kernel.shape[2]
    k = kernel[0, 0].reshape(nf, nf, 2, 2)        # in, c, dy, dx
    wT = jnp.transpose(k, (2, 3, 1, 0)).reshape(4 * nf, nf)
    b = jnp.transpose(bias.reshape(nf, 2, 2), (1, 2, 0)).reshape(4 * nf, 1)
    return wT, b


@functools.lru_cache(maxsize=1)
def _conv_last_placement() -> np.ndarray:
    """Constant (3, 16, 48, 3, 3) tap-placement tensor: which conv_last
    tap (dy, dx) of output phase o lands in K-slot (dr, phase) of the
    column-offset-dc matmul."""
    m = np.zeros((3, 16, 48, 3, 3), np.float32)
    for ry in range(4):
        for rx in range(4):
            o = ry * 4 + rx
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    dr, ryp = divmod(ry + dy + 4, 4)
                    dc, rxp = divmod(rx + dx + 4, 4)
                    ph = ((ryp // 2) * 2 + (rxp // 2)) * 4 \
                        + (ryp % 2) * 2 + (rxp % 2)
                    m[dc - 1 + 1, o, (dr - 1 + 1) * 16 + ph,
                      dy + 1, dx + 1] += 1.0
    return m


def fold_conv_last(kernel, bias, nf: int = 64):
    """(3,3,nf,1) + (1,) -> ((16, 3*3*16*nf) dc-major-packed matmul
    weights, (16,1)): conv_last folded onto phase-major y2 rows.
    Traceable (einsum with a constant placement tensor)."""
    mj = jnp.asarray(_conv_last_placement())
    kl = kernel[:, :, :, 0]                           # (3, 3, nf)
    wl = jnp.einsum("dosyx,yxc->dosc", mj, kl).reshape(3, 16, 48 * nf)
    wl = jnp.transpose(wl, (1, 0, 2)).reshape(16, 3 * 48 * nf)
    bl = jnp.broadcast_to(bias.astype(jnp.float32).reshape(1, 1), (16, 1))
    return wl, bl


# bilinear x4 phase stencils: src = (r+0.5)/4 - 0.5 for phase r
_UP4_TAPS = ((0.375, 0.625, 0.0), (0.125, 0.875, 0.0),
             (0.0, 0.875, 0.125), (0.0, 0.625, 0.375))


def _kernel(t_ref, lr_ref, wa_ref, ba_ref, wb_ref, bb_ref, wl_ref, bl_ref,
            out_ref, t_t, lr_t, y2_t, o_t, in_sems, lr_sems, out_sems, *,
            rows, wt, nf, h, w, nsteps, unroll, scale_shift):
    bi = pl.program_id(0)
    ci = pl.program_id(1)
    c0 = ci * wt
    R = rows
    f32 = jnp.float32

    def in_copy(i, slot):
        return pltpu.make_async_copy(
            t_ref.at[bi, pl.ds(i * R, R + 2), :, pl.ds(c0, wt + 128)],
            t_t.at[slot], in_sems.at[slot])

    def lr_copy(i, slot):
        return pltpu.make_async_copy(
            lr_ref.at[bi, pl.ds(i * R, R + 2), :, pl.ds(c0, wt + 128)],
            lr_t.at[slot], lr_sems.at[slot])

    def out_copy(i, slot):
        return pltpu.make_async_copy(
            o_t.at[slot],
            out_ref.at[bi, pl.ds(i * R, R), :, pl.ds(c0, wt)],
            out_sems.at[slot])

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    wa = wa_ref[:]          # (4nf, nf) p1-major rows
    ba = ba_ref[:]
    wb = wb_ref[:]          # (4nf, nf) p2-major rows
    bb = bb_ref[:]
    wl = wl_ref[:]          # (16, 3*3*16nf), dc-major blocks
    kdim = 3 * 16 * nf
    wld = [wl[:, d * kdim:(d + 1) * kdim] for d in range(3)]
    bl = bl_ref[:]

    g = jax.lax.broadcasted_iota(jnp.int32, (1, wt + 2), 1) + (c0 - 1)
    colmask = ((g >= 0) & (g < w)).astype(f32)

    in_copy(0, 0).start()
    lr_copy(0, 0).start()

    def step(i, _):
        slot = jax.lax.rem(i, 2)
        nxt = 1 - slot
        r0 = i * R

        @pl.when(i + 1 < nsteps)
        def _prefetch():
            in_copy(i + 1, nxt).start()
            lr_copy(i + 1, nxt).start()

        in_copy(i, slot).wait()
        lr_copy(i, slot).wait()

        # ---- y2 rows: both subpixel stages, phase-major ------------------
        def y2_row(rr, c):
            r = r0 + rr - 1
            rv = jnp.where((r >= 0) & (r < h), 1.0, 0.0).astype(f32)
            cm = rv * colmask
            trow = t_t[slot, pl.ds(rr, 1), :, 1:wt + 3][0]
            a = dot(wa, trow) + ba
            a = jnp.where(a >= 0, a, 0.1 * a).astype(trow.dtype)
            for p1 in range(4):
                y = dot(wb, a[p1 * nf:(p1 + 1) * nf]) + bb
                y = jnp.where(y >= 0, y, 0.1 * y) * cm
                y2_t[pl.ds(rr, 1), p1 * 4 * nf:(p1 + 1) * 4 * nf] = (
                    y.astype(y2_t.dtype)[None])
            return c

        jax.lax.fori_loop(0, R + 2, y2_row, 0,
                          unroll=(R + 2) if unroll else 1)

        @pl.when(i >= 2)
        def _wait_out():
            out_copy(i - 2, slot).wait()

        # ---- conv_last + base per output row -----------------------------
        def out_row(ri, c):
            y23 = y2_t[pl.ds(ri, 3)].reshape(3 * 16 * nf, wt + 2)
            sm1 = dot(wld[0], y23)
            s0 = dot(wld[1], y23)
            sp1 = dot(wld[2], y23)
            acc = sm1[:, 0:wt] + s0[:, 1:wt + 1] + sp1[:, 2:wt + 2] + bl
            # bilinear x4 base from the LR slab (1 channel)
            lm1 = lr_t[slot, pl.ds(ri, 1)][0][0:1].astype(f32)  # (1, wt+128)
            lm = lr_t[slot, pl.ds(ri + 1, 1)][0][0:1].astype(f32)
            lp1 = lr_t[slot, pl.ds(ri + 2, 1)][0][0:1].astype(f32)
            brows = [wm1 * lm1 + w0 * lm + wp1 * lp1
                     for (wm1, w0, wp1) in _UP4_TAPS]
            base = []
            for ry in range(4):
                br = brows[ry]
                for (cm1, cc0, cp1) in _UP4_TAPS:
                    base.append(cm1 * br[:, 1:wt + 1] + cc0 * br[:, 2:wt + 2]
                                + cp1 * br[:, 3:wt + 3])
            acc = acc + jnp.concatenate(base, axis=0)
            o_t[slot, pl.ds(ri, 1)] = acc.astype(o_t.dtype)[None]
            return c

        jax.lax.fori_loop(0, R, out_row, 0, unroll=R if unroll else 1)
        out_copy(i, slot).start()
        return _

    jax.lax.fori_loop(0, nsteps, step, 0, unroll=False)

    last = nsteps - 1
    out_copy(last, jax.lax.rem(last, 2)).wait()

    @pl.when(nsteps >= 2)
    def _drain():
        out_copy(last - 1, jax.lax.rem(last - 1, 2)).wait()


def fused_head_hcw(t_pad: jnp.ndarray, lr_pad: jnp.ndarray,
                   waT, ba, wbT, bb, wl, bl, *,
                   img_h: int, img_w: int, rows: int = 8, wt: int = 512,
                   unroll: bool = True) -> jnp.ndarray:
    """Fused head on row-major trunk output.

    t_pad: (B, H+2, nf, Wp+128) zero-padded (1 row each side; cols 2 left).
    lr_pad: (B, H+2, 8, Wp+128) EDGE-padded LR frame in channel 0
      (channels 1-7 are sublane-tiling filler — Mosaic cannot slice a
      size-1 second-minor dim).
    waT/ba, wbT/bb: from :func:`perm_subpixel_weights`.
    wl/bl: from :func:`fold_conv_last`.
    Returns PHASE-MAJOR SR (B, H, 16, Wp) fp32 (no HBM 4x intermediate).
    """
    b, hp2, nf, wpp = t_pad.shape
    h, wp = hp2 - 2, wpp - 128
    assert wp % wt == 0 and h % rows == 0
    grid = (b, wp // wt)
    R = rows
    kernel = functools.partial(
        _kernel, rows=R, wt=wt, nf=nf, h=img_h, w=img_w,
        nsteps=h // R, unroll=unroll, scale_shift=None)
    dt = t_pad.dtype
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)] +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((b, h, 16, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, R + 2, nf, wt + 128), dt),       # t_t
            pltpu.VMEM((2, R + 2, 8, wt + 128), dt),        # lr_t
            pltpu.VMEM((R + 2, 16 * nf, wt + 2), dt),       # y2_t
            pltpu.VMEM((2, R, 16, wt), jnp.float32),        # o_t
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(t_pad, lr_pad, waT, ba, wbT, bb, wl, bl)


def phase_to_image(out_phase: jnp.ndarray, w: int) -> jnp.ndarray:
    """(B, H, 16, Wp) phase-major -> (B, 4H, 4W, 1)."""
    b, h, _, wp = out_phase.shape
    o = out_phase[:, :, :, :w].reshape(b, h, 4, 4, w)
    o = jnp.transpose(o, (0, 1, 2, 4, 3))
    return o.reshape(b, 4 * h, 4 * w, 1)


def fused_head(t_hcw: jnp.ndarray, center_lr: jnp.ndarray,
               up1_kernel, up1_bias, up2_kernel, up2_bias,
               last_kernel, last_bias, *, rows: int = 8,
               wt: int | None = None) -> jnp.ndarray:
    """Convenience wrapper: (B, H, nf, W) trunk output + (B, H, W, 1) LR
    -> (B, 4H, 4W, 1) fp32 SR (head + bilinear base, x4 only)."""
    b, h, nf, w = t_hcw.shape
    if wt is None:
        # single 128-aligned tile up to 512 lanes, equal tiles beyond
        wp = -(-w // 128) * 128
        ntiles = -(-wp // 512)
        wt = -(-wp // (ntiles * 128)) * 128
    wp = -(-w // wt) * wt
    rpad = (-h) % rows
    tp = jnp.pad(t_hcw, ((0, 0), (1, 1 + rpad), (0, 0), (2, 126 + wp - w)))
    lr = jnp.transpose(center_lr, (0, 1, 3, 2))      # (B, H, 1, W)
    lr = jnp.pad(lr, ((0, 0), (1, 1), (0, 0), (2, 2)), mode="edge")
    lr = jnp.pad(lr, ((0, 0), (0, rpad), (0, 7), (0, 124 + wp - w)))
    waT, ba = perm_subpixel_weights(up1_kernel, up1_bias)
    wbT, bb = perm_subpixel_weights(up2_kernel, up2_bias)
    wl, bl = fold_conv_last(last_kernel, last_bias, nf)
    dt = t_hcw.dtype
    out = fused_head_hcw(tp, lr.astype(dt), waT.astype(dt),
                         ba.astype(jnp.float32), wbT.astype(dt),
                         bb.astype(jnp.float32), wl.astype(dt),
                         bl.astype(jnp.float32),
                         img_h=h, img_w=w, rows=rows, wt=wt)
    return phase_to_image(out[:, :h], w)
