"""Fully-fused SCNet ``Block_`` Pallas kernel — ALL THREE branches in VMEM.

Round-2 profiling (BENCH_NOTES) showed the trunk's cost was only ~60%
Pallas body compute — the rest was XLA glue around it: the 2x branch's
``up`` write, the pre-kernel ``pad`` copies, ``down`` read-backs and the
1x1 convs are all separate HBM passes (~350 MB/frame/block at the headline
geometry). This kernel computes the whole reference ``Block_``
(`/root/reference/arch/SIDECVSR_our.py:378-406`)

    out = x + body(x)
            + conv1x1_d(down2(body(up2(conv1x1_u(x)))))     # 2x branch
            + up2(conv1x1_u(body(down2(conv1x1_d(x)))))     # 0.5x branch

for each input row-block with every off-scale intermediate living only in
VMEM, in row-major (H, C, W) layout. (The 1x1 ``up_0``/``down_0`` convs
commute with the bilinear resizes — channel-only vs spatial-only linear
maps — which is what makes both folded orderings above exact.)

Techniques (derivations in the per-section comments):

* ``up2`` (bilinear align_corners=False: 0.25/0.75 phase weights, border
  clamp) is W-PHASE-SPLIT: 2x-wide images are held as two 1x-wide planes,
  so no strided lane ops exist anywhere. conv1 on the upsampled signal is
  6 dual-form matmuls per 2x row with static output-window shifts; the
  3-row K-stacks are free leading-dim reshapes.
* ``down2 . conv2`` on the 2x branch is FOLDED into one effective
  stride-2 conv: T[e,f] = 0.25 * sum of contributing conv2 taps over 2x
  offsets e,f in {-1,0,1,2} — 4 matmuls with K = 4*cmid per output row,
  4/9 of the naive conv2 FLOPs.
* the 0.5x branch runs in half-width planes: the W pair-mean rides a
  constant (wt+12, wt/2+6) pairing matmul P (even/odd lane extraction is
  not vectorisable on TPU, but on the MXU it is free); the final 0.5x->1x
  W-expansion rides a per-tile constant (wt/2+2, wt) matmul Q whose
  columns also encode the bilinear border clamp. H-direction up/down use
  direct row arithmetic (rows are sublane-addressable).
* zero-padding of every conv is reproduced by masking the relevant
  intermediate (xm / u / y / D / y05) to zero outside its true extent.
* the host pads the input slab with 6 EDGE rows/cols (the widest halo:
  the 0.5x branch needs x rows r0-6..r0+R+5); edge values implement the
  bilinear border clamps, masks restore conv zero-padding semantics.

Requires even img_h/img_w (the reference Block_ itself shape-mismatches
on odd extents: down2 then up2 yields 2*floor(h/2) != h rows).
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
    """(3,3,cmid,cout) -> (cout, 16*cmid): the down2-folded effective
    weights, packed per column-combo f in the order [f=0, f=2, f=-1, f=1]
    (even-phase shift 0, even +1, odd -1, odd 0), each a (cout, 4*cmid)
    block over row-offsets e in {-1,0,1,2}.

    T[e, f] = 0.25 * sum_{(q,dy): q-1+dy=e} sum_{(j,dx): j-1+dx=f} W2[dy,dx]
    with q, j in {0, 1} (the two 2x pixels averaged per axis).
    """
    cmid, cout = w2_hwio.shape[2], w2_hwio.shape[3]

    def taps(e):
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


@functools.lru_cache(maxsize=16)
def _pair_matrix(wt: int) -> np.ndarray:
    """(wt+12, wt//2+6) column pair-mean: P[2p, p] = P[2p+1, p] = 0.5.
    Maps slab lanes (image col c0+l-6) onto D cols (0.5x col c0/2-3+p)."""
    wd = wt // 2
    p = np.zeros((wt + 12, wd + 6), np.float32)
    for c in range(wd + 6):
        p[2 * c, c] = 0.5
        p[2 * c + 1, c] = 0.5
    return p


@functools.lru_cache(maxsize=64)
def _up_matrices(wt: int, w: int, ntiles: int) -> np.ndarray:
    """(ntiles, wt//2+2, wt) per-tile 0.5x->1x bilinear W-expansion.
    Column t of tile ci produces image col n = ci*wt + t from E plane
    cols (E col p <-> 0.5x col ci*wt//2 - 1 + p), with the border clamp
    baked in; cols with n >= w are zero (cropped by the caller)."""
    wd = wt // 2
    w2 = w // 2
    q = np.zeros((ntiles, wd + 2, wt), np.float32)
    for ci in range(ntiles):
        for t in range(wt):
            n = ci * wt + t
            if n >= w:
                continue
            np_, par = divmod(n, 2)
            taps = (((np_ - 1, 0.25), (np_, 0.75)) if par == 0
                    else ((np_, 0.75), (np_ + 1, 0.25)))
            for col, wgt in taps:
                cc = min(max(col, 0), w2 - 1)
                p = cc - ci * wd + 1
                q[ci, p, t] += wgt
    return q


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w2f_ref,
            ku_ref, bu_ref, kd_ref, bd_ref, p_ref, q_ref, out_ref,
            x_t, z_t, ue_t, uo_t, ye_t, yo_t, y1_t, xm_t,
            d_t, y5_t, e_t, o_t,
            in_sems, out_sems, *,
            rows, wt, cin, cmid, h, w, nsteps, unroll, out_dtype):
    bi = pl.program_id(0)
    ci = pl.program_id(1)
    c0 = ci * wt
    R = rows
    Rh = R // 2
    wd = wt // 2
    h2, w2 = h // 2, w // 2
    f32 = jnp.float32

    def in_copy(i, slot):
        return pltpu.make_async_copy(
            x_ref.at[bi, pl.ds(i * R, R + 12), :, pl.ds(c0, wt + 128)],
            x_t.at[slot], in_sems.at[slot])

    def out_copy(i, slot):
        return pltpu.make_async_copy(
            o_t.at[slot],
            out_ref.at[bi, pl.ds(i * R, R), :, pl.ds(c0, wt)],
            out_sems.at[slot])

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

    # column masks; slab lane l <-> image col c0 + l - 6
    # xm: width wt+4, col j <-> image col c0 + j - 2
    g1 = jax.lax.broadcasted_iota(jnp.int32, (1, wt + 4), 1) + (c0 - 2)
    colmask_x = ((g1 >= 0) & (g1 < w)).astype(f32)
    colmask_u = colmask_x              # u planes share the convention
    # y planes (1x and 2x phase): col p <-> image col c0 + p - 1
    g2 = jax.lax.broadcasted_iota(jnp.int32, (1, wt + 2), 1) + (c0 - 1)
    colmask_y = ((g2 >= 0) & (g2 < w)).astype(f32)
    # D: col p <-> 0.5x col c0/2 - 3 + p
    g3 = jax.lax.broadcasted_iota(jnp.int32, (1, wd + 6), 1) + (c0 // 2 - 3)
    colmask_d = ((g3 >= 0) & (g3 < w2)).astype(f32)
    # y05: col p <-> 0.5x col c0/2 - 2 + p
    g4 = jax.lax.broadcasted_iota(jnp.int32, (1, wd + 4), 1) + (c0 // 2 - 2)
    colmask_y5 = ((g4 >= 0) & (g4 < w2)).astype(f32)

    in_copy(0, 0).start()

    def step(i, _):
        slot = jax.lax.rem(i, 2)
        nxt = 1 - slot
        r0 = i * R                    # even (R is even)

        @pl.when(i + 1 < nsteps)
        def _prefetch():
            in_copy(i + 1, nxt).start()

        in_copy(i, slot).wait()

        # ---- 1x/2x prep: masked x rows + z = conv1x1_u(x) ---------------
        # rr in [0, R+4) <-> 1x row r0 + rr - 2 <-> slab row rr + 4
        def prep_row(rr, c):
            grow = r0 + rr - 2
            rv = jnp.where((grow >= 0) & (grow < h), 1.0, 0.0).astype(f32)
            xrow = x_t[slot, pl.ds(rr + 4, 1), :, 4:wt + 8][0]
            xm_t[pl.ds(rr, 1)] = (xrow.astype(f32)
                                  * (rv * colmask_x)).astype(xm_t.dtype)[None]
            # z cols s <-> image col c0 + s - 3, filled for s in [1, wt+6)
            # from slab lanes [4, wt+9). Col 0 is left unwritten: it feeds
            # only u_e plane col 0, which no conv1 output window reads.
            zrow = (dot(kuT, x_t[slot, pl.ds(rr + 4, 1), :, 4:wt + 9][0])
                    + bu).astype(z_t.dtype)
            z_t[pl.ds(rr, 1), :, 1:wt + 6] = zrow[None]
            return c

        jax.lax.fori_loop(0, R + 4, prep_row, 0,
                          unroll=(R + 4) if unroll else 1)

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

        # ---- conv1 at 2x: y rows q = 2*r0 - 1 + yq, yq in [0, 2R+2) -----
        def y2_row(yq, c):
            q = 2 * r0 - 1 + yq
            rv = jnp.where((q >= 0) & (q < 2 * h), 1.0, 0.0).astype(f32)
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

        # ---- conv1 at 1x: y1 rows r = r0 - 1 + yq, yq in [0, R+2) -------
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

        # ---- 0.5x branch: D -> y05 -> B -> E, half-width planes ---------
        # D rows dj in [0, Rh+6) <-> 0.5x row j' = r0/2 - 3 + dj, whose x
        # source rows 2j', 2j'+1 are slab rows 2dj, 2dj+1 exactly.
        def d_row(dj, c):
            jp = r0 // 2 - 3 + dj
            rv = jnp.where((jp >= 0) & (jp < h2), 1.0, 0.0).astype(f32)
            xa = 0.5 * (x_t[slot, pl.ds(2 * dj, 1), :, 0:wt + 12][0]
                        .astype(f32)
                        + x_t[slot, pl.ds(2 * dj + 1, 1), :, 0:wt + 12][0]
                        .astype(f32))
            dpre = dot(kdT, xa.astype(kdT.dtype))      # (cin, wt+12)
            drow = dot(dpre.astype(pmat.dtype), pmat) + bd
            d_t[pl.ds(dj, 1)] = (drow * (rv * colmask_d)
                                 ).astype(d_t.dtype)[None]
            return c

        jax.lax.fori_loop(0, Rh + 6, d_row, 0,
                          unroll=(Rh + 6) if unroll else 1)

        # y05 rows yj in [0, Rh+4) <-> 0.5x row j = r0/2 - 2 + yj
        def y5_row(yj, c):
            j = r0 // 2 - 2 + yj
            rv = jnp.where((j >= 0) & (j < h2), 1.0, 0.0).astype(f32)
            d3 = d_t[pl.ds(yj, 3)].reshape(3 * cin, wd + 6)
            p0 = dot(w1d[0], d3)
            p1 = dot(w1d[1], d3)
            p2 = dot(w1d[2], d3)
            y = (p0[:, 0:wd + 4] + p1[:, 1:wd + 5] + p2[:, 2:wd + 6] + b1)
            y = jnp.where(y >= 0, y, 0.1 * y) * (rv * colmask_y5)
            y5_t[pl.ds(yj, 1)] = y.astype(y5_t.dtype)[None]
            return c

        jax.lax.fori_loop(0, Rh + 4, y5_row, 0,
                          unroll=(Rh + 4) if unroll else 1)

        # B/E rows bj in [0, Rh+2) <-> 0.5x row j = r0/2 - 1 + bj
        def e_row(bj, c):
            y3 = y5_t[pl.ds(bj, 3)].reshape(3 * cmid, wd + 4)
            z0 = dot(w2d[0], y3)
            z1 = dot(w2d[1], y3)
            z2 = dot(w2d[2], y3)
            brow = z0[:, 0:wd + 2] + z1[:, 1:wd + 3] + z2[:, 2:wd + 4] + b2
            erow = dot(kuT, brow.astype(kuT.dtype)) + bu
            e_t[pl.ds(bj, 1)] = erow.astype(e_t.dtype)[None]
            return c

        jax.lax.fori_loop(0, Rh + 2, e_row, 0,
                          unroll=(Rh + 2) if unroll else 1)

        @pl.when(i >= 2)
        def _wait_out():
            out_copy(i - 2, slot).wait()

        # ---- conv2 (1x) + folded down.conv2 (2x) + 0.5x up + assemble ---
        def out_row(ri, c):
            y3 = y1_t[pl.ds(ri, 3)].reshape(3 * cmid, wt + 2)
            z0 = dot(w2d[0], y3)
            z1 = dot(w2d[1], y3)
            z2 = dot(w2d[2], y3)
            body = z0[:, 0:wt] + z1[:, 1:wt + 1] + z2[:, 2:wt + 2] + b2
            ye4 = ye_t[pl.ds(2 * ri, 4)].reshape(4 * cmid, wt + 2)
            yo4 = yo_t[pl.ds(2 * ri, 4)].reshape(4 * cmid, wt + 2)
            ge0 = dot(w2f[0], ye4)
            ge1 = dot(w2f[1], ye4)
            gm1 = dot(w2f[2], yo4)
            go0 = dot(w2f[3], yo4)
            upres = (ge0[:, 1:wt + 1] + ge1[:, 2:wt + 2]
                     + gm1[:, 0:wt] + go0[:, 1:wt + 1] + b2)
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
            dres = dot(eh.astype(qmat.dtype), qmat)     # (cin, wt)
            acc = (body + upres + dres
                   + x_t[slot, pl.ds(ri + 6, 1), :, 6:wt + 6][0].astype(f32))
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


def scale_block_hcw(x_pad: jnp.ndarray,
                    w1d, b1, w2d, b2, w2f, ku, bu, kd, bd, *,
                    img_h: int, img_w: int,
                    rows: int = 16, wt: int = 512,
                    unroll: bool = True) -> jnp.ndarray:
    """Fused full Block_ on row-major features.

    x_pad: (B, H+12, cin, Wp+128) EDGE-padded 6 rows/cols each side
      (zeros beyond are fine — masked), Wp % wt == 0, H % rows == 0,
      rows even, img_h/img_w even.
    w1d: (cmid, 9*cin) dual conv1 weights; b1 (cmid, 1).
    w2d: (cin, 9*cmid); b2 (cin, 1).
    w2f: (cin, 16*cmid) from :func:`fold_down_conv2`.
    ku/bu, kd/bd: (cin, cin) up_0/down_0 1x1 kernels (in,out) + biases.
    Returns (B, H, cin, Wp) = x + body(x) + down(body(up(x)))
                                + up(body(down(x))).
    """
    b, hp, cin, wpp = x_pad.shape
    h, wp = hp - 12, wpp - 128
    cmid = w1d.shape[0]
    assert wp % wt == 0 and h % rows == 0 and rows % 2 == 0
    assert img_h % 2 == 0 and img_w % 2 == 0, (
        "Block_ is undefined for odd extents (reference shape-mismatches)")
    ntiles = wp // wt
    R = rows
    Rh = R // 2
    wd = wt // 2
    kernel = functools.partial(
        _kernel, rows=R, wt=wt, cin=cin, cmid=cmid,
        h=img_h, w=img_w, nsteps=h // R,
        unroll=unroll, out_dtype=x_pad.dtype)
    dt = x_pad.dtype
    pmat = jnp.asarray(_pair_matrix(wt))
    qall = jnp.asarray(_up_matrices(wt, img_w, ntiles))
    return pl.pallas_call(
        kernel,
        grid=(b, ntiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * 11,
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((b, h, cin, wp), dt),
        scratch_shapes=[
            pltpu.VMEM((2, R + 12, cin, wt + 128), dt),     # x_t
            pltpu.VMEM((R + 4, cin, wt + 6), dt),           # z_t
            pltpu.VMEM((2 * R + 4, cin, wt + 4), dt),       # ue_t
            pltpu.VMEM((2 * R + 4, cin, wt + 4), dt),       # uo_t
            pltpu.VMEM((2 * R + 2, cmid, wt + 2), dt),      # ye_t
            pltpu.VMEM((2 * R + 2, cmid, wt + 2), dt),      # yo_t
            pltpu.VMEM((R + 2, cmid, wt + 2), dt),          # y1_t
            pltpu.VMEM((R + 4, cin, wt + 4), dt),           # xm_t
            pltpu.VMEM((Rh + 6, cin, wd + 6), dt),          # d_t
            pltpu.VMEM((Rh + 4, cmid, wd + 4), dt),         # y5_t
            pltpu.VMEM((Rh + 2, cin, wd + 2), dt),          # e_t
            pltpu.VMEM((2, R, cin, wt), dt),                # o_t
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(x_pad, w1d, b1, w2d, b2, w2f, ku.T, bu, kd.T, bd, pmat, qall)


def fused_scale_block(x_nhwc: jnp.ndarray, w1_hwio, b1, w2_hwio, b2,
                      kd_hwio, bd, ku_hwio, bu,
                      *, rows: int = 8, wt: int = 512) -> jnp.ndarray:
    """NHWC test wrapper: the FULL Block_ (all three branches).
    kd/ku are the (1,1,cin,cin) down_0/up_0 kernels."""
    b, h, w, cin = x_nhwc.shape
    x = jnp.transpose(x_nhwc, (0, 1, 3, 2))
    wp = -(-w // wt) * wt
    rpad = (-h) % rows
    x = jnp.pad(x, ((0, 0), (6, 6), (0, 0), (6, 6)), mode="edge")
    x = jnp.pad(x, ((0, 0), (0, rpad), (0, 0), (0, 116 + wp - w)))
    out = scale_block_hcw(
        x, dual_weights(w1_hwio), b1.reshape(-1, 1),
        dual_weights(w2_hwio), b2.reshape(-1, 1),
        fold_down_conv2(w2_hwio),
        ku_hwio[0, 0], bu.reshape(-1, 1), kd_hwio[0, 0], bd.reshape(-1, 1),
        img_h=h, img_w=w, rows=rows, wt=wt)
    out = out[:, :h, :, :w]
    return jnp.transpose(out, (0, 1, 3, 2))
