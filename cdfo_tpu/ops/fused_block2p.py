"""Frame-packed fused Block_ kernel — g frames per invocation, N x g dots.

`tools/microbench_dots.py` (BENCH_NOTES "Dot-granularity probe") showed the
fused Block_ kernel's dots are N-STARVED: the same FLOPs at 4x the RHS
width run 1.5-1.75x faster (conv1-style 86->129 TF/s, conv2-style
109->190), because each dot pays an LHS load into the systolic array that
only N streamed columns amortise. The engine's k=4 center frames share
geometry and weights, so this kernel packs g frames SIDE-BY-SIDE along the
lane axis at fixed per-segment strides and issues every heavy dot once
over the packed width:

* every full-width plane uses per-segment stride ``S = wt + 8``; the
  half-width (0.5x-branch) planes use ``Sh = wt//2 + 8``; the input slab
  keeps the DMA-aligned ``SX = wt + 128``.
* window arithmetic stays GLOBAL (one slice per tap over the whole packed
  row): conv taps reach at most 2 lanes past a segment's content, which is
  inside that segment's slack, so no tap ever reads another frame's lanes.
* slack lanes hold garbage; that is safe because every cross-lane
  contraction is either channel-wise (lane-independent) or an exact-width
  per-segment slice (the pair-mean / W-expansion matmuls), and the output
  DMA copies content lanes only.
* masks are the single-frame masks applied per segment (all segments share
  the tile origin c0), built once as packed rows via mod-S lane indices.

Math, conventions and reference mapping are identical to
``fused_block2.scale_block_hcw`` (reference ``Block_``
`/root/reference/arch/SIDECVSR_our.py:378-406`); g=1 degenerates to the
same schedule as the unpacked kernel. Row-block default is 8 (VMEM:
the packed planes are ~4x wider, so the row dimension halves).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_block import dual_weights
from .fused_block2 import _pair_matrix, _up_matrices, fold_down_conv2


def _seg_mask(g, stride, width, off, lo, hi):
    """(1, g*stride+8) f32 mask: per-segment col p = lane mod stride maps to
    image col p + off; 1.0 where lo <= col < hi AND p < width (content)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, g * stride + 8), 1)
    p = jax.lax.rem(lane, stride)
    col = p + off
    ok = (col >= lo) & (col < hi) & (p < width)
    # lanes in the +8 tail alias segment 0 via mod; kill them explicitly
    ok &= lane < g * stride
    return ok.astype(jnp.float32)


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w2f_ref,
            ku_ref, bu_ref, kd_ref, bd_ref, p_ref, q_ref, out_ref,
            x_t, z_t, ue_t, uo_t, ye_t, yo_t, y1_t, xm_t,
            d_t, y5_t, e_t, o_t,
            in_sems, out_sems, *,
            g, rows, wt, cin, cmid, h, w, nsteps, unroll, out_dtype):
    bi = pl.program_id(0)
    ci = pl.program_id(1)
    c0 = ci * wt
    R = rows
    Rh = R // 2
    wd = wt // 2
    h2, w2 = h // 2, w // 2
    f32 = jnp.float32
    SX = wt + 128
    S = wt + 8
    Sh = wd + 8
    L = g * S            # global op width, full-scale planes
    Lh = g * Sh          # global op width, half-scale planes

    def in_copy(i, slot, gi):
        return pltpu.make_async_copy(
            x_ref.at[bi * g + gi, pl.ds(i * R, R + 12), :,
                     pl.ds(c0, wt + 128)],
            x_t.at[slot, :, :, pl.ds(gi * SX, SX)], in_sems.at[slot, gi])

    def out_copy(i, slot, gi):
        return pltpu.make_async_copy(
            o_t.at[slot, :, :, pl.ds(gi * wt, wt)],
            out_ref.at[bi * g + gi, pl.ds(i * R, R), :, pl.ds(c0, wt)],
            out_sems.at[slot, gi])

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    w1 = w1_ref[:]                     # (cmid, 9*cin), dx-major
    w1d = [w1[:, d * 3 * cin:(d + 1) * 3 * cin] for d in range(3)]
    w2v = w2_ref[:]                    # (cin, 9*cmid)
    w2d = [w2v[:, d * 3 * cmid:(d + 1) * 3 * cmid] for d in range(3)]
    w2fv = w2f_ref[:]                  # (cin, 16*cmid), f-major blocks
    w2f = [w2fv[:, i * 4 * cmid:(i + 1) * 4 * cmid] for i in range(4)]
    kuT = ku_ref[:]                    # (out, in) — pre-transposed by host
    kdT = kd_ref[:]
    b1 = b1_ref[:]
    b2 = b2_ref[:]
    bu = bu_ref[:]
    bd = bd_ref[:]
    pmat = p_ref[:]                    # (wt+12, wd+6) f32 pair-mean
    qmat = q_ref[pl.ds(ci, 1)][0]      # (wd+2, wt) f32 W-expansion

    # packed column masks (single-frame semantics per segment; segments
    # share c0). Conventions per segment identical to fused_block2:
    # xm/u col j <-> image col c0 + j - 2 (content width wt+4)
    colmask_x = _seg_mask(g, S, wt + 4, c0 - 2, 0, w)
    # y planes: col p <-> image col c0 + p - 1 (content width wt+2)
    colmask_y = _seg_mask(g, S, wt + 2, c0 - 1, 0, w)
    # D: col p <-> 0.5x col c0/2 - 3 + p (content width wd+6)
    colmask_d = _seg_mask(g, Sh, wd + 6, c0 // 2 - 3, 0, w2)
    # y05: col p <-> 0.5x col c0/2 - 2 + p (content width wd+4)
    colmask_y5 = _seg_mask(g, Sh, wd + 4, c0 // 2 - 2, 0, w2)

    for gi in range(g):
        in_copy(0, 0, gi).start()

    def step(i, _):
        slot = jax.lax.rem(i, 2)
        nxt = 1 - slot
        r0 = i * R                    # even (R is even)

        @pl.when(i + 1 < nsteps)
        def _prefetch():
            for gi in range(g):
                in_copy(i + 1, nxt, gi).start()

        for gi in range(g):
            in_copy(i, slot, gi).wait()

        # ---- 1x/2x prep: masked x rows + z = conv1x1_u(x) ---------------
        # rr in [0, R+4) <-> 1x row r0 + rr - 2 <-> slab row rr + 4
        def prep_row(rr, c):
            grow = r0 + rr - 2
            rv = jnp.where((grow >= 0) & (grow < h), 1.0, 0.0).astype(f32)
            xrow = x_t[slot, pl.ds(rr + 4, 1)][0]        # (cin, g*SX)
            for gi in range(g):
                seg = xrow[:, gi * SX + 4:gi * SX + wt + 9]
                xm_t[pl.ds(rr, 1), :, gi * S:gi * S + wt + 4] = (
                    seg[:, :wt + 4].astype(f32) * rv).astype(
                        xm_t.dtype)[None]
                zrow = (dot(kuT, seg) + bu).astype(z_t.dtype)
                z_t[pl.ds(rr, 1), :, gi * S + 1:gi * S + wt + 6] = zrow[None]
            return c

        jax.lax.fori_loop(0, R + 4, prep_row, 0,
                          unroll=(R + 4) if unroll else 1)
        # apply the packed column mask once over all rows (cheaper than
        # per-row-per-segment masking; rv was applied per row above)
        xm_t[:, :, :] = (xm_t[:, :, :].astype(f32)
                         * colmask_x).astype(xm_t.dtype)

        # ---- 2x upsample planes: pairs q = 2m, 2m+1 per source row m ----
        # u buffer row uq <-> 2x row q = 2*r0 - 2 + uq, uq in [0, 2R+4)
        def up_pair(mq, c):
            m = r0 - 1 + mq            # z buffer index mq + 1
            zm1 = z_t[pl.ds(mq, 1)][0].astype(f32)
            zm = z_t[pl.ds(mq + 1, 1)][0].astype(f32)
            zp1 = z_t[pl.ds(mq + 2, 1)][0].astype(f32)
            for par, hrow in ((0, 0.25 * zm1 + 0.75 * zm),
                              (1, 0.75 * zm + 0.25 * zp1)):
                q = 2 * m + par
                rv = jnp.where((q >= 0) & (q < 2 * h), 1.0, 0.0).astype(f32)
                cm = rv * colmask_x[:, :L]
                uq = 2 * mq + par
                ue_t[pl.ds(uq, 1), :, :L] = ((0.25 * hrow[:, 0:L]
                                              + 0.75 * hrow[:, 1:L + 1])
                                             * cm).astype(ue_t.dtype)[None]
                uo_t[pl.ds(uq, 1), :, :L] = ((0.75 * hrow[:, 1:L + 1]
                                              + 0.25 * hrow[:, 2:L + 2])
                                             * cm).astype(uo_t.dtype)[None]
            return c

        jax.lax.fori_loop(0, R + 2, up_pair, 0,
                          unroll=(R + 2) if unroll else 1)

        # ---- conv1 at 2x: y rows q = 2*r0 - 1 + yq, yq in [0, 2R+2) -----
        def y2_row(yq, c):
            q = 2 * r0 - 1 + yq
            rv = jnp.where((q >= 0) & (q < 2 * h), 1.0, 0.0).astype(f32)
            u3o = uo_t[pl.ds(yq, 3)].reshape(3 * cin, L + 8)
            u3e = ue_t[pl.ds(yq, 3)].reshape(3 * cin, L + 8)
            cm = rv * colmask_y[:, :L]
            # sequential slice-accumulation: at most ONE full-width dot
            # output live at a time (multiple live (cmid, L) f32 temporaries
            # blow the vreg file — Mosaic allocated 63 MB of spill slots)
            ye = dot(w1d[0], u3o)[:, 0:L]
            ye = ye + dot(w1d[1], u3e)[:, 1:L + 1]
            ye = ye + dot(w1d[2], u3o)[:, 1:L + 1] + b1
            ye = jnp.where(ye >= 0, ye, 0.1 * ye) * cm
            ye_t[pl.ds(yq, 1), :, :L] = ye.astype(ye_t.dtype)[None]
            yo = dot(w1d[0], u3e)[:, 1:L + 1]
            yo = yo + dot(w1d[1], u3o)[:, 1:L + 1]
            yo = yo + dot(w1d[2], u3e)[:, 2:L + 2] + b1
            yo = jnp.where(yo >= 0, yo, 0.1 * yo) * cm
            yo_t[pl.ds(yq, 1), :, :L] = yo.astype(yo_t.dtype)[None]
            return c

        jax.lax.fori_loop(0, 2 * R + 2, y2_row, 0,
                          unroll=(2 * R + 2) if unroll == "all" else 1)

        # ---- conv1 at 1x: y1 rows r = r0 - 1 + yq, yq in [0, R+2) -------
        def y1_row(yq, c):
            r = r0 - 1 + yq
            rv = jnp.where((r >= 0) & (r < h), 1.0, 0.0).astype(f32)
            x3 = xm_t[pl.ds(yq, 3)].reshape(3 * cin, L + 8)
            y = dot(w1d[0], x3)[:, 0:L]
            y = y + dot(w1d[1], x3)[:, 1:L + 1]
            y = y + dot(w1d[2], x3)[:, 2:L + 2] + b1
            y = jnp.where(y >= 0, y, 0.1 * y) * (rv * colmask_y[:, :L])
            y1_t[pl.ds(yq, 1), :, :L] = y.astype(y1_t.dtype)[None]
            return c

        jax.lax.fori_loop(0, R + 2, y1_row, 0,
                          unroll=(R + 2) if unroll else 1)

        # ---- 0.5x branch: D -> y05 -> B -> E, half-width planes ---------
        # D rows dj in [0, Rh+6) <-> 0.5x row j' = r0/2 - 3 + dj, whose x
        # source rows 2j', 2j'+1 are slab rows 2dj, 2dj+1 exactly.
        def d_row(dj, c):
            jp = r0 // 2 - 3 + dj
            rv = jnp.where((jp >= 0) & (jp < h2), 1.0, 0.0).astype(f32)
            xa = 0.5 * (x_t[slot, pl.ds(2 * dj, 1)][0].astype(f32)
                        + x_t[slot, pl.ds(2 * dj + 1, 1)][0].astype(f32))
            dpre = dot(kdT, xa.astype(kdT.dtype))      # (cin, g*SX)
            for gi in range(g):
                drow = dot(dpre[:, gi * SX:gi * SX + wt + 12]
                           .astype(pmat.dtype), pmat) + bd
                d_t[pl.ds(dj, 1), :, gi * Sh:gi * Sh + wd + 6] = (
                    drow * rv).astype(d_t.dtype)[None]
            return c

        jax.lax.fori_loop(0, Rh + 6, d_row, 0,
                          unroll=(Rh + 6) if unroll else 1)
        d_t[:, :, :] = (d_t[:, :, :].astype(f32)
                        * colmask_d).astype(d_t.dtype)

        # y05 rows yj in [0, Rh+4) <-> 0.5x row j = r0/2 - 2 + yj
        def y5_row(yj, c):
            j = r0 // 2 - 2 + yj
            rv = jnp.where((j >= 0) & (j < h2), 1.0, 0.0).astype(f32)
            d3 = d_t[pl.ds(yj, 3)].reshape(3 * cin, Lh + 8)
            y = dot(w1d[0], d3)[:, 0:Lh]
            y = y + dot(w1d[1], d3)[:, 1:Lh + 1]
            y = y + dot(w1d[2], d3)[:, 2:Lh + 2] + b1
            y = jnp.where(y >= 0, y, 0.1 * y) * (rv * colmask_y5[:, :Lh])
            y5_t[pl.ds(yj, 1), :, :Lh] = y.astype(y5_t.dtype)[None]
            return c

        jax.lax.fori_loop(0, Rh + 4, y5_row, 0,
                          unroll=(Rh + 4) if unroll else 1)

        # B/E rows bj in [0, Rh+2) <-> 0.5x row j = r0/2 - 1 + bj
        def e_row(bj, c):
            y3 = y5_t[pl.ds(bj, 3)].reshape(3 * cmid, Lh + 8)
            brow = dot(w2d[0], y3)[:, 0:Lh]
            brow = brow + dot(w2d[1], y3)[:, 1:Lh + 1]
            brow = brow + dot(w2d[2], y3)[:, 2:Lh + 2] + b2
            erow = dot(kuT, brow.astype(kuT.dtype)) + bu
            e_t[pl.ds(bj, 1), :, :Lh] = erow.astype(e_t.dtype)[None]
            return c

        jax.lax.fori_loop(0, Rh + 2, e_row, 0,
                          unroll=(Rh + 2) if unroll else 1)

        @pl.when(i >= 2)
        def _wait_out():
            for gi in range(g):
                out_copy(i - 2, slot, gi).wait()

        # ---- conv2 (1x) + folded down.conv2 (2x) + 0.5x up + assemble ---
        def out_row(ri, c):
            y3 = y1_t[pl.ds(ri, 3)].reshape(3 * cmid, L + 8)
            body = dot(w2d[0], y3)[:, 0:L]
            body = body + dot(w2d[1], y3)[:, 1:L + 1]
            body = body + dot(w2d[2], y3)[:, 2:L + 2] + b2
            ye4 = ye_t[pl.ds(2 * ri, 4)].reshape(4 * cmid, L + 8)
            yo4 = yo_t[pl.ds(2 * ri, 4)].reshape(4 * cmid, L + 8)
            upres = dot(w2f[0], ye4)[:, 1:L + 1]
            upres = upres + dot(w2f[1], ye4)[:, 2:L + 2]
            upres = upres + dot(w2f[2], yo4)[:, 0:L]
            upres = upres + dot(w2f[3], yo4)[:, 1:L + 1] + b2
            upres = dot(kdT, upres.astype(kdT.dtype)) + bd
            # 0.5x branch H-expansion: out row m = r0 + ri = 2m' + par
            mh = r0 // 2 + ri // 2
            par = ri % 2
            ra = jnp.clip(mh - 1 + par, 0, h2 - 1) - (r0 // 2 - 1)
            rb = jnp.clip(mh + par, 0, h2 - 1) - (r0 // 2 - 1)
            wa = 0.25 + 0.5 * jnp.asarray(par, f32)
            wb = 0.75 - 0.5 * jnp.asarray(par, f32)
            eh = (wa * e_t[pl.ds(ra, 1)][0].astype(f32)
                  + wb * e_t[pl.ds(rb, 1)][0].astype(f32))
            xrow = x_t[slot, pl.ds(ri + 6, 1)][0]
            for gi in range(g):
                dres = dot(eh[:, gi * Sh:gi * Sh + wd + 2]
                           .astype(qmat.dtype), qmat)   # (cin, wt)
                acc = (body[:, gi * S:gi * S + wt]
                       + upres[:, gi * S:gi * S + wt] + dres
                       + xrow[:, gi * SX + 6:gi * SX + wt + 6].astype(f32))
                o_t[slot, pl.ds(ri, 1), :, gi * wt:(gi + 1) * wt] = (
                    acc.astype(out_dtype)[None])
            return c

        jax.lax.fori_loop(0, R, out_row, 0,
                          unroll=R if unroll == "all" else 1)
        for gi in range(g):
            out_copy(i, slot, gi).start()
        return _

    jax.lax.fori_loop(0, nsteps, step, 0, unroll=False)

    last = nsteps - 1
    for gi in range(g):
        out_copy(last, jax.lax.rem(last, 2), gi).wait()

    @pl.when(nsteps >= 2)
    def _drain():
        for gi in range(g):
            out_copy(last - 1, jax.lax.rem(last - 1, 2), gi).wait()


def scale_block_hcw_packed(x_pad: jnp.ndarray,
                           w1d, b1, w2d, b2, w2f, ku, bu, kd, bd, *,
                           img_h: int, img_w: int, g: int = 4,
                           rows: int = 8, wt: int = 512,
                           unroll: str = "all") -> jnp.ndarray:
    """Frame-packed fused full Block_ on row-major features.

    Same contract as :func:`fused_block2.scale_block_hcw` (x_pad
    (B, H+12, cin, Wp+128) EDGE-padded 6 rows/cols, masks restore conv
    zero-padding), plus ``g``: frames packed per kernel invocation along
    the lane axis (requires B % g == 0; all frames share img_h/img_w).
    """
    b, hp, cin, wpp = x_pad.shape
    h, wp = hp - 12, wpp - 128
    cmid = w1d.shape[0]
    assert b % g == 0, (b, g)
    assert wp % wt == 0 and h % rows == 0 and rows % 2 == 0
    assert img_h % 2 == 0 and img_w % 2 == 0, (
        "Block_ is undefined for odd extents (reference shape-mismatches)")
    ntiles = wp // wt
    R = rows
    Rh = R // 2
    wd = wt // 2
    SX, S, Sh = wt + 128, wt + 8, wd + 8
    kernel = functools.partial(
        _kernel, g=g, rows=R, wt=wt, cin=cin, cmid=cmid,
        h=img_h, w=img_w, nsteps=h // R,
        unroll=unroll, out_dtype=x_pad.dtype)
    dt = x_pad.dtype
    pmat = jnp.asarray(_pair_matrix(wt))
    qall = jnp.asarray(_up_matrices(wt, img_w, ntiles))
    return pl.pallas_call(
        kernel,
        grid=(b // g, ntiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * 11,
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((b, h, cin, wp), dt),
        scratch_shapes=[
            pltpu.VMEM((2, R + 12, cin, g * SX), dt),       # x_t
            pltpu.VMEM((R + 4, cin, g * S + 8), dt),        # z_t
            pltpu.VMEM((2 * R + 4, cin, g * S + 8), dt),    # ue_t
            pltpu.VMEM((2 * R + 4, cin, g * S + 8), dt),    # uo_t
            pltpu.VMEM((2 * R + 2, cmid, g * S + 8), dt),   # ye_t
            pltpu.VMEM((2 * R + 2, cmid, g * S + 8), dt),   # yo_t
            pltpu.VMEM((R + 2, cmid, g * S + 8), dt),       # y1_t
            pltpu.VMEM((R + 4, cin, g * S + 8), dt),        # xm_t
            pltpu.VMEM((Rh + 6, cin, g * Sh + 8), dt),      # d_t
            pltpu.VMEM((Rh + 4, cmid, g * Sh + 8), dt),     # y5_t
            pltpu.VMEM((Rh + 2, cin, g * Sh + 8), dt),      # e_t
            pltpu.VMEM((2, R, cin, g * wt), dt),            # o_t
            pltpu.SemaphoreType.DMA((2, g)),
            pltpu.SemaphoreType.DMA((2, g)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(x_pad, w1d, b1, w2d, b2, w2f, ku.T, bu, kd.T, bd, pmat, qall)


def fused_scale_block_packed(x_nhwc: jnp.ndarray, w1_hwio, b1, w2_hwio, b2,
                             kd_hwio, bd, ku_hwio, bu, *, g: int = 4,
                             rows: int = 8, wt: int = 512,
                             unroll: str = "all") -> jnp.ndarray:
    """NHWC test wrapper: the FULL Block_ with g-frame lane packing."""
    b, h, w, cin = x_nhwc.shape
    x = jnp.transpose(x_nhwc, (0, 1, 3, 2))
    wp = -(-w // wt) * wt
    rpad = (-h) % rows
    x = jnp.pad(x, ((0, 0), (6, 6), (0, 0), (6, 6)), mode="edge")
    x = jnp.pad(x, ((0, 0), (0, rpad), (0, 0), (0, 116 + wp - w)))
    out = scale_block_hcw_packed(
        x, dual_weights(w1_hwio), b1.reshape(-1, 1),
        dual_weights(w2_hwio), b2.reshape(-1, 1),
        fold_down_conv2(w2_hwio),
        ku_hwio[0, 0], bu.reshape(-1, 1), kd_hwio[0, 0], bd.reshape(-1, 1),
        img_h=h, img_w=w, g=g, rows=rows, wt=wt, unroll=unroll)
    out = out[:, :h, :, :w]
    return jnp.transpose(out, (0, 1, 3, 2))
