"""Fully-fused SCNet ``Block_`` Pallas kernel: 1x body + 2x branch in VMEM.

Round-2 profiling (BENCH_NOTES) showed the trunk's cost is only ~60% Pallas
body compute — the rest is XLA glue around it: the 2x branch's ``up`` write
(67 MB/frame/block), the pre-kernel ``pad`` copy, the ``down`` read-back and
the 1x1 convs are all separate HBM passes (~350 MB/frame/block at the
headline geometry, ~2.3 ms/block at the chip's measured ~150 GB/s
elementwise bandwidth).

This kernel computes, for each input row-block, the whole

    out = x + body(x) + conv1x1_d(down2(body(up2(conv1x1_u(x))))) + extra

expression (reference ``Block_``, `/root/reference/arch/SIDECVSR_our.py:
378-406`; ``extra`` is the 0.5x branch, still computed outside at 1/16 the
FLOPs) with every 2x intermediate living only in VMEM, in row-major
(H, C, W) layout:

* ``up2`` (bilinear align_corners=False: phase weights 0.25/0.75, border
  clamp) is W-PHASE-SPLIT: the 2x-wide image is held as two 1x-wide planes
  (even/odd columns), so no strided lane ops are needed anywhere.
* conv1 on the upsampled signal runs as 6 dual-form matmuls per 2x row
  (per output phase, the 3 column taps split into same-phase/other-phase
  groups with static output-window shifts) — zero patch copies, the 3-row
  K-stack is a free leading-dim reshape.
* ``down2 . conv2`` is FOLDED into one effective stride-2 conv: the four
  o2x pixels averaged by ``down2`` share taps, giving effective weights
  T[e,f] = 0.25 * sum of contributing conv2 taps over 2x offsets
  e,f in {-1,0,1,2}. Per output row this is 4 matmuls with K = 4*cmid
  — 4/9 of the naive conv2 FLOPs.
* the 1x body shares the same input slab (masked to zeros outside the
  image for its conv padding; the up-branch needs EDGE-replicated halo
  for the bilinear border clamp, so the host pads with edge values and
  the kernel masks).
* conv1x1_u / conv1x1_d (which commute with the resizes — channel-only
  vs spatial-only linear maps) run in-kernel as (C,C) matmuls.

Zero-padding semantics of both convs are reproduced by masking ``u`` (the
upsampled planes) and ``y`` (the lrelu'd intermediate) to zero outside the
true 2x image extent, exactly like the single-body kernel masks its halo.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_block import dual_weights


def fold_down_conv2(w2_hwio: jnp.ndarray) -> jnp.ndarray:
    """(3,3,cmid,cout) -> (cout, 4, 4*cmid): the down2-folded effective
    weights, packed per column-combo f in the order [f=0, f=2, f=-1, f=1]
    (even-phase shift 0, even +1, odd -1, odd 0), each a (cout, 4*cmid)
    block over row-offsets e in {-1,0,1,2}.

    T[e, f] = 0.25 * sum_{(q,dy): q-1+dy=e} sum_{(j,dx): j-1+dx=f} W2[dy,dx]
    with q, j in {0, 1} (the two 2x pixels averaged per axis).
    """
    cmid, cout = w2_hwio.shape[2], w2_hwio.shape[3]

    def taps(e):
        # dy indices contributing at 2x row offset e
        return [dy for q in (0, 1) for dy in (e + 1 - q,) if 0 <= dy <= 2]

    packs = []
    for f in (0, 2, -1, 1):
        blocks = []
        for e in (-1, 0, 1, 2):
            t = jnp.zeros((cmid, cout), w2_hwio.dtype)
            for dy in taps(e):
                for dx in taps(f):
                    t = t + w2_hwio[dy, dx]
            blocks.append(0.25 * t)
        packs.append(jnp.concatenate(blocks, axis=0))  # (4*cmid, cout)
    w = jnp.stack(packs)                               # (4, 4*cmid, cout)
    return jnp.transpose(w, (2, 0, 1)).reshape(cout, 16 * cmid)


def _kernel(x_ref, ex_ref, w1_ref, b1_ref, w2_ref, b2_ref, w2f_ref,
            ku_ref, bu_ref, kd_ref, bd_ref, out_ref,
            x_t, ex_t, z_t, ue_t, uo_t, ye_t, yo_t, y1_t, xm_t, o_t,
            in_sems, ex_sems, out_sems, *,
            rows, wt, cin, cmid, h, w, nsteps, unroll, out_dtype):
    bi = pl.program_id(0)
    ci = pl.program_id(1)
    c0 = ci * wt
    R = rows

    def in_copy(i, slot):
        return pltpu.make_async_copy(
            x_ref.at[bi, pl.ds(i * R, R + 4), :, pl.ds(c0, wt + 128)],
            x_t.at[slot], in_sems.at[slot])

    def ex_copy(i, slot):
        return pltpu.make_async_copy(
            ex_ref.at[bi, pl.ds(i * R, R), :, pl.ds(c0, wt)],
            ex_t.at[slot], ex_sems.at[slot])

    def out_copy(i, slot):
        return pltpu.make_async_copy(
            o_t.at[slot],
            out_ref.at[bi, pl.ds(i * R, R), :, pl.ds(c0, wt)],
            out_sems.at[slot])

    f32 = jnp.float32

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    # weight slices (VMEM refs -> values once). Matmul M-stacking was
    # tried and reverted: identical throughput, 2x the Mosaic compile time.
    w1 = w1_ref[:]                     # (cmid, 9*cin), dx-major
    w1d = [w1[:, d * 3 * cin:(d + 1) * 3 * cin] for d in range(3)]
    w2 = w2_ref[:]                     # (cin, 9*cmid)
    w2d = [w2[:, d * 3 * cmid:(d + 1) * 3 * cmid] for d in range(3)]
    w2fv = w2f_ref[:]                  # (cin, 16*cmid), f-major blocks
    w2f = [w2fv[:, i * 4 * cmid:(i + 1) * 4 * cmid] for i in range(4)]
    kuT = ku_ref[:]                    # (out, in) — pre-transposed by host
    kdT = kd_ref[:]
    b1 = b1_ref[:]
    b2 = b2_ref[:]
    bu = bu_ref[:]
    bd = bd_ref[:]

    # column masks (f32 multiplicands)
    # xm / slab cols: j <-> image col c0 + j - 2, width wt+4
    g1 = jax.lax.broadcasted_iota(jnp.int32, (1, wt + 4), 1) + (c0 - 2)
    colmask_x = ((g1 >= 0) & (g1 < w)).astype(f32)
    # u planes: p <-> col c0 + p - 2, width wt+4
    colmask_u = colmask_x
    # y planes (1x and 2x): p <-> col c0 + p - 1, width wt+2
    g2 = jax.lax.broadcasted_iota(jnp.int32, (1, wt + 2), 1) + (c0 - 1)
    colmask_y = ((g2 >= 0) & (g2 < w)).astype(f32)

    in_copy(0, 0).start()
    ex_copy(0, 0).start()

    def step(i, _):
        slot = jax.lax.rem(i, 2)
        nxt = 1 - slot
        r0 = i * R

        @pl.when(i + 1 < nsteps)
        def _prefetch():
            in_copy(i + 1, nxt).start()
            ex_copy(i + 1, nxt).start()

        in_copy(i, slot).wait()
        ex_copy(i, slot).wait()

        # ---- per-input-row precompute: masked x, z = conv1x1_u(x) -------
        def prep_row(rr, c):
            # rr in [0, R+4): 1x row r = r0 + rr - 2
            grow = r0 + rr - 2
            rv = jnp.where((grow >= 0) & (grow < h), 1.0, 0.0).astype(f32)
            xrow = x_t[slot, pl.ds(rr, 1), :, 0:wt + 4][0]
            xm_t[pl.ds(rr, 1)] = (xrow.astype(f32)
                                  * (rv * colmask_x)).astype(xm_t.dtype)[None]
            # z: cols s <-> image col c0 + s - 3; fill s in [1, wt+6) from
            # slab cols [0, wt+5). Col 0 is left UNWRITTEN: it feeds only
            # u_e plane col 0, which no conv1 output window ever reads
            # (single-lane stores lower to an unsupported gather on TPU).
            zrow = (dot(kuT, x_t[slot, pl.ds(rr, 1), :, 0:wt + 5][0])
                    + bu).astype(z_t.dtype)
            z_t[pl.ds(rr, 1), :, 1:wt + 6] = zrow[None]
            return c

        jax.lax.fori_loop(0, R + 4, prep_row, 0,
                          unroll=(R + 4) if unroll else 1)

        # ---- upsample planes: pairs q = 2m, 2m+1 per source row m --------
        # u buffer row uq <-> 2x row q = 2*r0 - 2 + uq, uq in [0, 2R+4)
        def up_pair(mq, c):
            m = r0 - 1 + mq                # z buffer index mq + 1
            zm1 = z_t[pl.ds(mq, 1)][0].astype(f32)
            zm = z_t[pl.ds(mq + 1, 1)][0].astype(f32)
            zp1 = z_t[pl.ds(mq + 2, 1)][0].astype(f32)
            # H-up: q=2m -> 0.25*z[m-1] + 0.75*z[m];
            #       q=2m+1 -> 0.75*z[m] + 0.25*z[m+1]
            for par, hrow in ((0, 0.25 * zm1 + 0.75 * zm),
                              (1, 0.75 * zm + 0.25 * zp1)):
                q = 2 * m + par
                rv = jnp.where((q >= 0) & (q < 2 * h), 1.0, 0.0).astype(f32)
                cm = rv * colmask_u
                uq = 2 * mq + par
                ue_t[pl.ds(uq, 1)] = ((0.25 * hrow[:, 0:wt + 4]
                                       + 0.75 * hrow[:, 1:wt + 5])
                                      * cm).astype(ue_t.dtype)[None]
                uo_t[pl.ds(uq, 1)] = ((0.75 * hrow[:, 1:wt + 5]
                                       + 0.25 * hrow[:, 2:wt + 6])
                                      * cm).astype(uo_t.dtype)[None]
            return c

        jax.lax.fori_loop(0, R + 2, up_pair, 0,
                          unroll=(R + 2) if unroll else 1)

        # ---- conv1 at 2x: y rows q = 2*r0 - 1 + yq, yq in [0, 2R+2) ------
        def y2_row(yq, c):
            q = 2 * r0 - 1 + yq
            rv = jnp.where((q >= 0) & (q < 2 * h), 1.0, 0.0).astype(f32)
            # u buffer row of q-1 is (q-1) - (2r0-2) = yq
            u3o = uo_t[pl.ds(yq, 3)].reshape(3 * cin, wt + 4)
            u3e = ue_t[pl.ds(yq, 3)].reshape(3 * cin, wt + 4)
            a0 = dot(w1d[0], u3o)
            a2 = dot(w1d[2], u3o)
            a1 = dot(w1d[1], u3e)
            ye = a0[:, 0:wt + 2] + (a1 + a2)[:, 1:wt + 3] + b1
            d0 = dot(w1d[0], u3e)
            d1 = dot(w1d[1], u3o)
            d2 = dot(w1d[2], u3e)
            yo = (d0 + d1)[:, 1:wt + 3] + d2[:, 2:wt + 4] + b1
            ye = jnp.where(ye >= 0, ye, 0.1 * ye) * (rv * colmask_y)
            yo = jnp.where(yo >= 0, yo, 0.1 * yo) * (rv * colmask_y)
            ye_t[pl.ds(yq, 1)] = ye.astype(ye_t.dtype)[None]
            yo_t[pl.ds(yq, 1)] = yo.astype(yo_t.dtype)[None]
            return c

        jax.lax.fori_loop(0, 2 * R + 2, y2_row, 0,
                          unroll=(2 * R + 2) if unroll else 1)

        # ---- conv1 at 1x: y1 rows r = r0 - 1 + yq, yq in [0, R+2) --------
        def y1_row(yq, c):
            r = r0 - 1 + yq
            rv = jnp.where((r >= 0) & (r < h), 1.0, 0.0).astype(f32)
            x3 = xm_t[pl.ds(yq, 3)].reshape(3 * cin, wt + 4)
            p0 = dot(w1d[0], x3)
            p1 = dot(w1d[1], x3)
            p2 = dot(w1d[2], x3)
            y = (p0[:, 0:wt + 2] + p1[:, 1:wt + 3] + p2[:, 2:wt + 4] + b1)
            y = jnp.where(y >= 0, y, 0.1 * y) * (rv * colmask_y)
            y1_t[pl.ds(yq, 1)] = y.astype(y1_t.dtype)[None]
            return c

        jax.lax.fori_loop(0, R + 2, y1_row, 0,
                          unroll=(R + 2) if unroll else 1)

        @pl.when(i >= 2)
        def _wait_out():
            out_copy(i - 2, slot).wait()

        # ---- conv2 (1x) + folded down.conv2 (2x) + assemble --------------
        def out_row(ri, c):
            # 1x body: y1 rows ri..ri+2
            y3 = y1_t[pl.ds(ri, 3)].reshape(3 * cmid, wt + 2)
            z0 = dot(w2d[0], y3)
            z1 = dot(w2d[1], y3)
            z2 = dot(w2d[2], y3)
            body = z0[:, 0:wt] + z1[:, 1:wt + 1] + z2[:, 2:wt + 2] + b2
            # 2x branch: y rows 2ri..2ri+3 in buffer coords
            ye4 = ye_t[pl.ds(2 * ri, 4)].reshape(4 * cmid, wt + 2)
            yo4 = yo_t[pl.ds(2 * ri, 4)].reshape(4 * cmid, wt + 2)
            ge0 = dot(w2f[0], ye4)
            ge1 = dot(w2f[1], ye4)
            gm1 = dot(w2f[2], yo4)
            go0 = dot(w2f[3], yo4)
            upres = (ge0[:, 1:wt + 1] + ge1[:, 2:wt + 2]
                     + gm1[:, 0:wt] + go0[:, 1:wt + 1] + b2)
            upres = dot(kdT, upres.astype(kdT.dtype)) + bd
            acc = (body + upres
                   + x_t[slot, pl.ds(ri + 2, 1), :, 2:wt + 2][0].astype(f32)
                   + ex_t[slot, pl.ds(ri, 1)][0].astype(f32))
            o_t[slot, pl.ds(ri, 1)] = acc.astype(out_dtype)[None]
            return c

        jax.lax.fori_loop(0, R, out_row, 0,
                          unroll=R if unroll else 1)
        out_copy(i, slot).start()
        return _

    jax.lax.fori_loop(0, nsteps, step, 0, unroll=False)

    last = nsteps - 1
    out_copy(last, jax.lax.rem(last, 2)).wait()

    @pl.when(nsteps >= 2)
    def _drain():
        out_copy(last - 1, jax.lax.rem(last - 1, 2)).wait()


def scale_block_hcw(x_pad: jnp.ndarray, extra: jnp.ndarray,
                    w1d, b1, w2d, b2, w2f, ku, bu, kd, bd, *,
                    img_h: int, img_w: int,
                    rows: int = 16, wt: int = 512,
                    unroll: bool = True) -> jnp.ndarray:
    """Fused Block_ on row-major features.

    x_pad: (B, H+4, cin, Wp+128) EDGE-padded 2 rows/cols each side (zeros
      beyond are fine — masked), Wp % wt == 0, H % rows == 0.
    extra: (B, H, cin, Wp) — the 0.5x-branch residual (zeros if none).
    w1d: (cmid, 9*cin) dual conv1 weights; b1 (cmid, 1).
    w2d: (cin, 9*cmid); b2 (cin, 1).
    w2f: (cin, 4, 4*cmid) from :func:`fold_down_conv2`.
    ku/bu, kd/bd: (cin, cin) TRANSPOSED to (out, in) + (cin, 1) — the
      up_0 / down_0 1x1 convs.
    Returns (B, H, cin, Wp) = x + body(x) + down(body(up(x))) + extra.
    """
    b, hp4, cin, wpp = x_pad.shape
    h, wp = hp4 - 4, wpp - 128
    cmid = w1d.shape[0]
    assert wp % wt == 0 and h % rows == 0, (h, wp, rows, wt)
    grid = (b, wp // wt)
    R = rows
    kernel = functools.partial(
        _kernel, rows=R, wt=wt, cin=cin, cmid=cmid,
        h=img_h, w=img_w, nsteps=h // R,
        unroll=unroll, out_dtype=x_pad.dtype)
    dt = x_pad.dtype
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)] +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((b, h, cin, wp), dt),
        scratch_shapes=[
            pltpu.VMEM((2, R + 4, cin, wt + 128), dt),      # x_t
            pltpu.VMEM((2, R, cin, wt), dt),                # ex_t
            pltpu.VMEM((R + 4, cin, wt + 6), dt),           # z_t
            pltpu.VMEM((2 * R + 4, cin, wt + 4), dt),       # ue_t
            pltpu.VMEM((2 * R + 4, cin, wt + 4), dt),       # uo_t
            pltpu.VMEM((2 * R + 2, cmid, wt + 2), dt),      # ye_t
            pltpu.VMEM((2 * R + 2, cmid, wt + 2), dt),      # yo_t
            pltpu.VMEM((R + 2, cmid, wt + 2), dt),          # y1_t
            pltpu.VMEM((R + 4, cin, wt + 4), dt),           # xm_t
            pltpu.VMEM((2, R, cin, wt), dt),                # o_t
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(x_pad, extra, w1d, b1, w2d, b2, w2f, ku.T, bu, kd.T, bd)


def fused_scale_block(x_nhwc: jnp.ndarray, w1_hwio, b1, w2_hwio, b2,
                      kd_hwio, bd, ku_hwio, bu,
                      extra_nhwc: jnp.ndarray | None = None,
                      *, rows: int = 8, wt: int = 512) -> jnp.ndarray:
    """NHWC test wrapper: full Block_ minus the 0.5x branch (pass it via
    ``extra_nhwc``). kd/ku are the (1,1,cin,cin) down_0/up_0 kernels."""
    b, h, w, cin = x_nhwc.shape
    x = jnp.transpose(x_nhwc, (0, 1, 3, 2))
    wp = -(-w // wt) * wt
    rpad = (-h) % rows
    x = jnp.pad(x, ((0, 0), (2, 2), (0, 0), (2, 2)), mode="edge")
    x = jnp.pad(x, ((0, 0), (0, rpad), (0, 0), (0, 124 + wp - w)))
    if extra_nhwc is None:
        ex = jnp.zeros((b, h + rpad, cin, wp), x.dtype)
    else:
        ex = jnp.transpose(extra_nhwc, (0, 1, 3, 2))
        ex = jnp.pad(ex, ((0, 0), (0, rpad), (0, 0), (0, wp - w)))
    out = scale_block_hcw(
        x, ex, dual_weights(w1_hwio), b1.reshape(-1, 1),
        dual_weights(w2_hwio), b2.reshape(-1, 1),
        fold_down_conv2(w2_hwio),
        ku_hwio[0, 0], bu.reshape(-1, 1), kd_hwio[0, 0], bd.reshape(-1, 1),
        img_h=h, img_w=w, rows=rows, wt=wt)
    out = out[:, :h, :, :w]
    return jnp.transpose(out, (0, 1, 3, 2))
