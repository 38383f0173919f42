"""Fused alignment-tail Pallas kernel: the two ResidualBlockNoBN's of
``DualAttAlignment`` plus the final ``+ center`` skip, chained in VMEM on
row-major (H, C, W) features.

Reference semantics (`/root/reference/arch/SIDECVSR_our.py:3492-3494`,
blocks `:254-271`): out = RB2(RB1(t)) + x where RB(t) = t +
conv3x3(relu(conv3x3(t))). The four 3x3 convs at C=64 are exactly the
NHWC shape XLA runs worst on this chip (~29 TF/s, BENCH_NOTES); in
dual-form row-major they ride the MXU like the trunk kernel.

The center skip is NOT materialised per neighbour: ``skip_ref`` holds the
k distinct center frames and the kernel maps batch ``bi -> bi // nbr``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, sk_ref, g_ref, w11_ref, b11_ref, w12_ref, b12_ref,
            w21_ref, b21_ref, w22_ref, b22_ref, out_ref,
            x_t, xm_t, y1_t, r1_t, y2_t, sk_t, o_t,
            in_sems, sk_sems, out_sems, *,
            rows, wt, cin, h, w, nbr, nsteps, unroll, out_dtype, row_base):
    bi = pl.program_id(0)
    ci = pl.program_id(1)
    c0 = ci * wt
    R = rows
    f32 = jnp.float32
    ski = jax.lax.div(bi, nbr)
    # per-frame channel gate, pre-broadcast over lanes by the host
    # (lane-safe: no single-lane slices / sublane<->lane relayouts)
    gv = g_ref[bi].astype(f32)                    # (cin, wt + 8)

    def in_copy(i, slot):
        return pltpu.make_async_copy(
            x_ref.at[bi, pl.ds(i * R + row_base - 4, R + 8), :,
                     pl.ds(c0, wt + 128)],
            x_t.at[slot], in_sems.at[slot])

    def sk_copy(i, slot):
        return pltpu.make_async_copy(
            sk_ref.at[ski, pl.ds(i * R, R), :, pl.ds(c0, wt)],
            sk_t.at[slot], sk_sems.at[slot])

    def out_copy(i, slot):
        return pltpu.make_async_copy(
            o_t.at[slot],
            out_ref.at[bi, pl.ds(i * R, R), :, pl.ds(c0, wt)],
            out_sems.at[slot])

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    def slices(wref):
        wv = wref[:]
        return [wv[:, d * 3 * cin:(d + 1) * 3 * cin] for d in range(3)]

    w11 = slices(w11_ref)
    w12 = slices(w12_ref)
    w21 = slices(w21_ref)
    w22 = slices(w22_ref)
    b11 = b11_ref[:]
    b12 = b12_ref[:]
    b21 = b21_ref[:]
    b22 = b22_ref[:]

    def colmask(width, base):
        g = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1) + base
        return ((g >= 0) & (g < w)).astype(f32)

    cm_x = colmask(wt + 8, c0 - 4)
    cm_y1 = colmask(wt + 6, c0 - 3)
    cm_r1 = colmask(wt + 4, c0 - 2)
    cm_y2 = colmask(wt + 2, c0 - 1)

    in_copy(0, 0).start()
    sk_copy(0, 0).start()

    def step(i, _):
        slot = jax.lax.rem(i, 2)
        nxt = 1 - slot
        r0 = i * R

        @pl.when(i + 1 < nsteps)
        def _prefetch():
            in_copy(i + 1, nxt).start()
            sk_copy(i + 1, nxt).start()

        in_copy(i, slot).wait()
        sk_copy(i, slot).wait()

        # masked input rows: slab row j <-> 1x row r0 + j - 4. The mask is
        # a `where` (not a multiply): rows outside the image may be
        # UNWRITTEN HBM when the producer kernel emits the padded layout
        # directly (row_base > 4), and NaN * 0 = NaN.
        def xm_row(j, c):
            r = r0 + j - 4
            rv = (r >= 0) & (r < h)
            xr = x_t[slot, pl.ds(j, 1), :, 0:wt + 8][0]
            xv = jnp.where(rv & (cm_x > 0), xr.astype(f32) * gv, 0.0)
            xm_t[pl.ds(j, 1)] = xv.astype(xm_t.dtype)[None]
            return c

        jax.lax.fori_loop(0, R + 8, xm_row, 0,
                          unroll=(R + 8) if unroll else 1)

        # RB1 inner: y1 rows r = r0 - 3 + q, q in [0, R+6)
        def y1_row(q, c):
            r = r0 - 3 + q
            rv = jnp.where((r >= 0) & (r < h), 1.0, 0.0).astype(f32)
            x3 = xm_t[pl.ds(q, 3)].reshape(3 * cin, wt + 8)
            z0 = dot(w11[0], x3)
            z1 = dot(w11[1], x3)
            z2 = dot(w11[2], x3)
            y = z0[:, 0:wt + 6] + z1[:, 1:wt + 7] + z2[:, 2:wt + 8] + b11
            y = jnp.maximum(y, 0.0) * (rv * cm_y1)
            y1_t[pl.ds(q, 1)] = y.astype(y1_t.dtype)[None]
            return c

        jax.lax.fori_loop(0, R + 6, y1_row, 0,
                          unroll=(R + 6) if unroll else 1)

        # RB1 out: rows r = r0 - 2 + q, q in [0, R+4)
        def r1_row(q, c):
            r = r0 - 2 + q
            rv = jnp.where((r >= 0) & (r < h), 1.0, 0.0).astype(f32)
            y3 = y1_t[pl.ds(q, 3)].reshape(3 * cin, wt + 6)
            z0 = dot(w12[0], y3)
            z1 = dot(w12[1], y3)
            z2 = dot(w12[2], y3)
            acc = (z0[:, 0:wt + 4] + z1[:, 1:wt + 5] + z2[:, 2:wt + 6]
                   + b12 + xm_t[pl.ds(q + 2, 1), :, 2:wt + 6][0].astype(f32))
            # mask AFTER the bias/skip add: invalid rows must be ZERO for
            # RB2's conv padding
            acc = acc * (rv * cm_r1)
            r1_t[pl.ds(q, 1)] = acc.astype(r1_t.dtype)[None]
            return c

        jax.lax.fori_loop(0, R + 4, r1_row, 0,
                          unroll=(R + 4) if unroll else 1)

        # RB2 inner: rows r = r0 - 1 + q, q in [0, R+2)
        def y2_row(q, c):
            r = r0 - 1 + q
            rv = jnp.where((r >= 0) & (r < h), 1.0, 0.0).astype(f32)
            r3 = r1_t[pl.ds(q, 3)].reshape(3 * cin, wt + 4)
            z0 = dot(w21[0], r3)
            z1 = dot(w21[1], r3)
            z2 = dot(w21[2], r3)
            y = z0[:, 0:wt + 2] + z1[:, 1:wt + 3] + z2[:, 2:wt + 4] + b21
            y = jnp.maximum(y, 0.0) * (rv * cm_y2)
            y2_t[pl.ds(q, 1)] = y.astype(y2_t.dtype)[None]
            return c

        jax.lax.fori_loop(0, R + 2, y2_row, 0,
                          unroll=(R + 2) if unroll else 1)

        @pl.when(i >= 2)
        def _wait_out():
            out_copy(i - 2, slot).wait()

        # RB2 out + center skip
        def out_row(ri, c):
            y3 = y2_t[pl.ds(ri, 3)].reshape(3 * cin, wt + 2)
            z0 = dot(w22[0], y3)
            z1 = dot(w22[1], y3)
            z2 = dot(w22[2], y3)
            acc = (z0[:, 0:wt] + z1[:, 1:wt + 1] + z2[:, 2:wt + 2] + b22
                   + r1_t[pl.ds(ri + 2, 1), :, 2:wt + 2][0].astype(f32)
                   + sk_t[slot, pl.ds(ri, 1)][0].astype(f32))
            o_t[slot, pl.ds(ri, 1)] = acc.astype(out_dtype)[None]
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


def resblock_pair_hcw(x_pad: jnp.ndarray, skip: jnp.ndarray,
                      w11d, b11, w12d, b12, w21d, b21, w22d, b22, *,
                      img_h: int, img_w: int, nbr: int = 1,
                      rows: int = 16, wt: int = 512,
                      unroll: bool = True, row_base: int = 4,
                      gate: jnp.ndarray | None = None) -> jnp.ndarray:
    """out = RB2(RB1(gate[b] * x)) + skip[b // nbr] on row-major features.

    x_pad: (B, H+2*row_base, cin, Wp+128) with image row 0 at slab row
      ``row_base`` and image col 0 at lane 4 (pad values arbitrary —
      where-masked, NaN-safe). skip: (B//nbr, H, cin, Wp).
    w*d: (cin, 9*cin) dual conv weights; b* (cin, 1).
    gate: optional (B, cin) per-frame channel scale (e.g. the CALayer
      gate), applied to x inside the kernel — saves the full-res XLA
      multiply pass when the producer writes x_pad directly.
    """
    bsz, hp, cin, wpp = x_pad.shape
    h, wp = hp - 2 * row_base, wpp - 128
    assert wp % wt == 0 and h % rows == 0
    kernel = functools.partial(
        _kernel, rows=rows, wt=wt, cin=cin, h=img_h, w=img_w, nbr=nbr,
        nsteps=h // rows, unroll=unroll, out_dtype=x_pad.dtype,
        row_base=row_base)
    dt = x_pad.dtype
    if gate is None:
        gate_w = jnp.ones((bsz, cin, wt + 8), dt)
    else:
        gate_w = jnp.broadcast_to(gate.astype(dt)[:, :, None],
                                  (bsz, cin, wt + 8))
    return pl.pallas_call(
        kernel,
        grid=(bsz, wp // wt),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)] +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((bsz, h, cin, wp), dt),
        scratch_shapes=[
            pltpu.VMEM((2, rows + 8, cin, wt + 128), dt),   # x_t
            pltpu.VMEM((rows + 8, cin, wt + 8), dt),        # xm_t
            pltpu.VMEM((rows + 6, cin, wt + 6), dt),        # y1_t
            pltpu.VMEM((rows + 4, cin, wt + 4), dt),        # r1_t
            pltpu.VMEM((rows + 2, cin, wt + 2), dt),        # y2_t
            pltpu.VMEM((2, rows, cin, wt), dt),             # sk_t
            pltpu.VMEM((2, rows, cin, wt), dt),             # o_t
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(x_pad, skip, gate_w, w11d, b11, w12d, b12, w21d, b21, w22d, b22)
