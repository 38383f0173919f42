"""INT8 "turbo" variant of the fused Block_ kernel (`fused_block2.py`).

Identical structure and data flow, but the heavy conv matmuls (conv1/conv2
at 1x and the folded 2x branch — ~94% of the block's FLOPs) run as
int8 x int8 -> int32 MXU dots (v5e int8 peak is 2x bf16):

* weights are quantized per-output-channel, symmetric (host-side);
* activations are quantized **in the producing loop's epilogue** — there
  are NO standalone quantize passes and NO bf16 staging planes for the
  int8 operands (round 4 measured those passes eating most of the
  theoretical 2x; BENCH_NOTES "int8 turbo" section):
  - the ``u`` upsample planes are convex blends of ``z`` rows, so
    ``amax(u) <= amax(z)`` — the z amax (free in the prep loop) is an
    exact-enough per-step scale and ``up_pair`` stores int8 directly;
  - the masked 1x input ``xm`` gets a VPU-only amax pre-pass (no dots),
    then ``prep_row`` quantizes inline;
  - the lrelu'd conv1 outputs (``y1``/``y2``) use a LAGGED running
    scale: step ``i`` quantizes with ``1.25 * max`` of the amaxes
    measured in steps ``< i`` (values above it clip), bootstrapped at
    step 0 from the analytic bound ``maxrowsum(|W1|) * amax(input) +
    max|b1|``. The dequant always uses the scale that quantized.
* dequantisation happens once per output row: i32 windowed sums are
  scaled by (s_act * s_w[channel]) before bias/activation.

The 0.5x branch (6% of FLOPs), the 1x1 convs and all masks/stencils stay
bf16/f32. NOT bit-exact: opt-in via ``ModelConfig.trunk_int8``; measured
PSNR delta documented in BENCH_NOTES.md.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_block import dual_weights
from .fused_block2 import _pair_matrix, _up_matrices, fold_down_conv2


def quant_weight(w):
    """(M, K) -> (int8 (M, K), f32 scale (M, 1)) symmetric per-out-channel."""
    s = jnp.maximum(jnp.max(jnp.abs(w.astype(jnp.float32)),
                            axis=1, keepdims=True), 1e-8) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / s), -127, 127
                 ).astype(jnp.int8)
    return q, s


# headroom multiplier on the lagged y1/y2 scales: activations in step i
# may exceed the running amax of steps < i; 1.25x turns modest growth
# into fine quantization instead of clipping (large growth still clips)
LAG_MARGIN = 1.25


def _kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
            w2f_ref, s2f_ref, ku_ref, bu_ref, kd_ref, bd_ref,
            p_ref, q_ref, bnd_ref, out_ref,
            x_t, z_t, ueq_t, uoq_t, yeq_t, yoq_t,
            y1q_t, xmq_t, d_t, y5_t, e_t, o_t,
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

    def doti(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    w1q = w1_ref[:]                    # int8 (cmid, 9*cin), dx-major
    w1d = [w1q[:, d * 3 * cin:(d + 1) * 3 * cin] for d in range(3)]
    s_w1 = s1_ref[:]                   # (cmid, 1) f32
    w2q = w2_ref[:]                    # int8 (cin, 9*cmid)
    w2d = [w2q[:, d * 3 * cmid:(d + 1) * 3 * cmid] for d in range(3)]
    s_w2 = s2_ref[:]                   # (cin, 1)
    w2fq = w2f_ref[:]                  # int8 (cin, 16*cmid)
    w2f = [w2fq[:, i * 4 * cmid:(i + 1) * 4 * cmid] for i in range(4)]
    s_w2f = s2f_ref[:]                 # (cin, 1)
    kuT = ku_ref[:]
    kdT = kd_ref[:]
    b1 = b1_ref[:]
    b2 = b2_ref[:]
    bu = bu_ref[:]
    bd = bd_ref[:]
    pmat = p_ref[:]
    qmat = q_ref[pl.ds(ci, 1)][0]
    rs1 = bnd_ref[0, 0]                # maxrowsum |W1 dequantized|
    b1max = bnd_ref[0, 1]              # max |b1|
    rn1 = bnd_ref[0, 2]                # max row 2-norm of W1 dequantized
    # bf16 dequantised weights for the 0.5x branch (reuses the SAME
    # quantized values so only ONE weight layout ships)
    w1b = [(w1d[d].astype(f32) * s_w1).astype(jnp.bfloat16)
           for d in range(3)]
    w2b = [(w2d[d].astype(f32) * s_w2).astype(jnp.bfloat16)
           for d in range(3)]

    g1 = jax.lax.broadcasted_iota(jnp.int32, (1, wt + 4), 1) + (c0 - 2)
    colmask_x = ((g1 >= 0) & (g1 < w)).astype(f32)
    colmask_u = colmask_x
    g2 = jax.lax.broadcasted_iota(jnp.int32, (1, wt + 2), 1) + (c0 - 1)
    colmask_y = ((g2 >= 0) & (g2 < w)).astype(f32)
    g3 = jax.lax.broadcasted_iota(jnp.int32, (1, wd + 6), 1) + (c0 // 2 - 3)
    colmask_d = ((g3 >= 0) & (g3 < w2)).astype(f32)
    g4 = jax.lax.broadcasted_iota(jnp.int32, (1, wd + 4), 1) + (c0 // 2 - 2)
    colmask_y5 = ((g4 >= 0) & (g4 < w2)).astype(f32)

    in_copy(0, 0).start()

    def step(i, lag):
        ay1_run, ay2_run = lag         # running y amaxes from steps < i
        slot = jax.lax.rem(i, 2)
        nxt = 1 - slot
        r0 = i * R

        @pl.when(i + 1 < nsteps)
        def _prefetch():
            in_copy(i + 1, nxt).start()

        in_copy(i, slot).wait()

        # ---- xm amax/rms pre-pass (VPU only, no dots, no stores) --------
        ncol_x = jnp.sum(colmask_x)

        def xm_amax_row(rr, acc):
            amax, ssq, cnt = acc
            grow = r0 + rr - 2
            rv = jnp.where((grow >= 0) & (grow < h), 1.0, 0.0).astype(f32)
            xm = x_t[slot, pl.ds(rr + 4, 1), :, 4:wt + 8][0].astype(f32) \
                * (rv * colmask_x)
            return (jnp.maximum(amax, jnp.max(jnp.abs(xm))),
                    ssq + jnp.sum(xm * xm), cnt + rv * ncol_x * cin)

        xm_max, xm_ssq, xm_cnt = jax.lax.fori_loop(
            0, R + 4, xm_amax_row, (f32(0), f32(0), f32(0)),
            unroll=(R + 4) if unroll else 1)
        xm_rms = jnp.sqrt(xm_ssq / jnp.maximum(xm_cnt, 1.0))
        s_xm = jnp.maximum(xm_max, 1e-8) / 127.0
        inv_xm = 1.0 / s_xm

        # ---- prep: z (bf16) + inline-quantized xm; z amax carried -------
        def prep_row(rr, acc):
            amax, ssq = acc
            grow = r0 + rr - 2
            rv = jnp.where((grow >= 0) & (grow < h), 1.0, 0.0).astype(f32)
            xrow = x_t[slot, pl.ds(rr + 4, 1), :, 4:wt + 8][0]
            xm = xrow.astype(f32) * (rv * colmask_x)
            xmq_t[pl.ds(rr, 1)] = jnp.clip(
                jnp.round(xm * inv_xm), -127, 127).astype(jnp.int8)[None]
            zrow = (dot(kuT, x_t[slot, pl.ds(rr + 4, 1), :, 4:wt + 9][0])
                    + bu)
            z_t[pl.ds(rr, 1), :, 1:wt + 6] = zrow.astype(z_t.dtype)[None]
            return (jnp.maximum(amax, jnp.max(jnp.abs(zrow))),
                    ssq + jnp.sum(zrow * zrow))

        z_max, z_ssq = jax.lax.fori_loop(
            0, R + 4, prep_row, (f32(0), f32(0)),
            unroll=(R + 4) if unroll else 1)
        z_rms = jnp.sqrt(z_ssq / ((R + 4) * cin * (wt + 5)))

        # u rows are convex blends of z rows: amax(u) <= amax(z), and the
        # bound is tight (>= 0.75 * amax(z) reaches the top bin). Using it
        # as the u scale lets up_pair store int8 straight away.
        s_u = jnp.maximum(z_max, 1e-8) / 127.0
        inv_u = 1.0 / s_u

        # ---- 2x upsample planes, quantized in the epilogue --------------
        def up_pair(mq, c):
            m = r0 - 1 + mq
            zm1 = z_t[pl.ds(mq, 1)][0].astype(f32)
            zm = z_t[pl.ds(mq + 1, 1)][0].astype(f32)
            zp1 = z_t[pl.ds(mq + 2, 1)][0].astype(f32)
            for par, hrow in ((0, 0.25 * zm1 + 0.75 * zm),
                              (1, 0.75 * zm + 0.25 * zp1)):
                q = 2 * m + par
                rv = jnp.where((q >= 0) & (q < 2 * h), 1.0, 0.0).astype(f32)
                cm = (rv * colmask_u) * inv_u
                uq = 2 * mq + par
                ueq_t[pl.ds(uq, 1)] = jnp.clip(jnp.round(
                    (0.25 * hrow[:, 0:wt + 4] + 0.75 * hrow[:, 1:wt + 5])
                    * cm), -127, 127).astype(jnp.int8)[None]
                uoq_t[pl.ds(uq, 1)] = jnp.clip(jnp.round(
                    (0.75 * hrow[:, 1:wt + 5] + 0.25 * hrow[:, 2:wt + 6])
                    * cm), -127, 127).astype(jnp.int8)[None]
            return c

        jax.lax.fori_loop(0, R + 2, up_pair, 0,
                          unroll=(R + 2) if unroll else 1)

        # lagged y scales: step 0 bootstraps from min(hard bound,
        # statistical estimate) — hard: |y| <= maxrowsum(|W1|)*amax(in) +
        # max|b1| (lrelu only shrinks); statistical: peak ~ 5 sigma with
        # sigma <= maxrownorm2(W1)*rms(in) (values beyond it clip)
        def boot(in_max, in_rms):
            return jnp.minimum(rs1 * in_max, 5.0 * rn1 * in_rms) + b1max

        ay2_base = jnp.where(i == 0, boot(z_max, z_rms),
                             LAG_MARGIN * ay2_run)
        s_y2 = jnp.maximum(ay2_base, 1e-8) / 127.0
        inv_y2 = 1.0 / s_y2
        ay1_base = jnp.where(i == 0, boot(xm_max, xm_rms),
                             LAG_MARGIN * ay1_run)
        s_y1 = jnp.maximum(ay1_base, 1e-8) / 127.0
        inv_y1 = 1.0 / s_y1

        # per-step dequant scale vectors
        sc1u = (s_w1 * s_u)            # (cmid, 1) for conv1-2x
        sc1x = (s_w1 * s_xm)           # conv1-1x
        sc2 = s_w2 * s_y1
        sc2f = s_w2f * s_y2

        # ---- conv1 at 2x: int8 dots, dequant, lrelu, requant ------------
        def y2_row(yq, amax):
            q = 2 * r0 - 1 + yq
            rv = jnp.where((q >= 0) & (q < 2 * h), 1.0, 0.0).astype(f32)
            u3o = uoq_t[pl.ds(yq, 3)].reshape(3 * cin, wt + 4)
            u3e = ueq_t[pl.ds(yq, 3)].reshape(3 * cin, wt + 4)
            a0 = doti(w1d[0], u3o)
            a2 = doti(w1d[2], u3o)
            a1 = doti(w1d[1], u3e)
            ye = (a0[:, 0:wt + 2] + (a1 + a2)[:, 1:wt + 3]
                  ).astype(f32) * sc1u + b1
            d0 = doti(w1d[0], u3e)
            d1 = doti(w1d[1], u3o)
            d2 = doti(w1d[2], u3e)
            yo = ((d0 + d1)[:, 1:wt + 3] + d2[:, 2:wt + 4]
                  ).astype(f32) * sc1u + b1
            ye = jnp.where(ye >= 0, ye, 0.1 * ye) * (rv * colmask_y)
            yo = jnp.where(yo >= 0, yo, 0.1 * yo) * (rv * colmask_y)
            yeq_t[pl.ds(yq, 1)] = jnp.clip(
                jnp.round(ye * inv_y2), -127, 127).astype(jnp.int8)[None]
            yoq_t[pl.ds(yq, 1)] = jnp.clip(
                jnp.round(yo * inv_y2), -127, 127).astype(jnp.int8)[None]
            return jnp.maximum(amax, jnp.maximum(
                jnp.max(jnp.abs(ye)), jnp.max(jnp.abs(yo))))

        y2_max = jax.lax.fori_loop(0, 2 * R + 2, y2_row, f32(0),
                                   unroll=(2 * R + 2) if unroll else 1)

        def y1_row(yq, amax):
            r = r0 - 1 + yq
            rv = jnp.where((r >= 0) & (r < h), 1.0, 0.0).astype(f32)
            x3 = xmq_t[pl.ds(yq, 3)].reshape(3 * cin, wt + 4)
            p0 = doti(w1d[0], x3)
            p1 = doti(w1d[1], x3)
            p2 = doti(w1d[2], x3)
            y = (p0[:, 0:wt + 2] + p1[:, 1:wt + 3] + p2[:, 2:wt + 4]
                 ).astype(f32) * sc1x + b1
            y = jnp.where(y >= 0, y, 0.1 * y) * (rv * colmask_y)
            y1q_t[pl.ds(yq, 1)] = jnp.clip(
                jnp.round(y * inv_y1), -127, 127).astype(jnp.int8)[None]
            return jnp.maximum(amax, jnp.max(jnp.abs(y)))

        y1_max = jax.lax.fori_loop(0, R + 2, y1_row, f32(0),
                                   unroll=(R + 2) if unroll else 1)

        # ---- 0.5x branch: unchanged bf16 (6% of FLOPs) ------------------
        def d_row(dj, c):
            jp = r0 // 2 - 3 + dj
            rv = jnp.where((jp >= 0) & (jp < h2), 1.0, 0.0).astype(f32)
            xa = 0.5 * (x_t[slot, pl.ds(2 * dj, 1), :, 0:wt + 12][0]
                        .astype(f32)
                        + x_t[slot, pl.ds(2 * dj + 1, 1), :, 0:wt + 12][0]
                        .astype(f32))
            dpre = dot(kdT, xa.astype(kdT.dtype))
            drow = dot(dpre.astype(pmat.dtype), pmat) + bd
            d_t[pl.ds(dj, 1)] = (drow * (rv * colmask_d)
                                 ).astype(d_t.dtype)[None]
            return c

        jax.lax.fori_loop(0, Rh + 6, d_row, 0,
                          unroll=(Rh + 6) if unroll else 1)

        def y5_row(yj, c):
            j = r0 // 2 - 2 + yj
            rv = jnp.where((j >= 0) & (j < h2), 1.0, 0.0).astype(f32)
            d3 = d_t[pl.ds(yj, 3)].reshape(3 * cin, wd + 6)
            p0 = dot(w1b[0], d3)
            p1 = dot(w1b[1], d3)
            p2 = dot(w1b[2], d3)
            y = (p0[:, 0:wd + 4] + p1[:, 1:wd + 5] + p2[:, 2:wd + 6] + b1)
            y = jnp.where(y >= 0, y, 0.1 * y) * (rv * colmask_y5)
            y5_t[pl.ds(yj, 1)] = y.astype(y5_t.dtype)[None]
            return c

        jax.lax.fori_loop(0, Rh + 4, y5_row, 0,
                          unroll=(Rh + 4) if unroll else 1)

        def e_row(bj, c):
            y3 = y5_t[pl.ds(bj, 3)].reshape(3 * cmid, wd + 4)
            z0 = dot(w2b[0], y3)
            z1 = dot(w2b[1], y3)
            z2 = dot(w2b[2], y3)
            brow = z0[:, 0:wd + 2] + z1[:, 1:wd + 3] + z2[:, 2:wd + 4] + b2
            erow = dot(kuT, brow.astype(kuT.dtype)) + bu
            e_t[pl.ds(bj, 1)] = erow.astype(e_t.dtype)[None]
            return c

        jax.lax.fori_loop(0, Rh + 2, e_row, 0,
                          unroll=(Rh + 2) if unroll else 1)

        @pl.when(i >= 2)
        def _wait_out():
            out_copy(i - 2, slot).wait()

        def out_row(ri, c):
            y3 = y1q_t[pl.ds(ri, 3)].reshape(3 * cmid, wt + 2)
            z0 = doti(w2d[0], y3)
            z1 = doti(w2d[1], y3)
            z2 = doti(w2d[2], y3)
            body = (z0[:, 0:wt] + z1[:, 1:wt + 1] + z2[:, 2:wt + 2]
                    ).astype(f32) * sc2 + b2
            ye4 = yeq_t[pl.ds(2 * ri, 4)].reshape(4 * cmid, wt + 2)
            yo4 = yoq_t[pl.ds(2 * ri, 4)].reshape(4 * cmid, wt + 2)
            ge0 = doti(w2f[0], ye4)
            ge1 = doti(w2f[1], ye4)
            gm1 = doti(w2f[2], yo4)
            go0 = doti(w2f[3], yo4)
            upres = (ge0[:, 1:wt + 1] + ge1[:, 2:wt + 2]
                     + gm1[:, 0:wt] + go0[:, 1:wt + 1]
                     ).astype(f32) * sc2f + b2
            upres = dot(kdT, upres.astype(kdT.dtype)) + bd
            mh = r0 // 2 + ri // 2
            par = ri % 2
            ra = jnp.clip(mh - 1 + par, 0, h2 - 1) - (r0 // 2 - 1)
            rb = jnp.clip(mh + par, 0, h2 - 1) - (r0 // 2 - 1)
            wa = 0.25 + 0.5 * jnp.asarray(par, f32)
            wb = 0.75 - 0.5 * jnp.asarray(par, f32)
            eh = (wa * e_t[pl.ds(ra, 1)][0].astype(f32)
                  + wb * e_t[pl.ds(rb, 1)][0].astype(f32))
            dres = dot(eh.astype(qmat.dtype), qmat)
            acc = (body + upres + dres
                   + x_t[slot, pl.ds(ri + 6, 1), :, 6:wt + 6][0].astype(f32))
            o_t[slot, pl.ds(ri, 1)] = acc.astype(out_dtype)[None]
            return c

        jax.lax.fori_loop(0, R, out_row, 0, unroll=R if unroll else 1)
        out_copy(i, slot).start()
        return (jnp.maximum(ay1_run, y1_max), jnp.maximum(ay2_run, y2_max))

    jax.lax.fori_loop(0, nsteps, step, (f32(0), f32(0)), unroll=False)

    last = nsteps - 1
    out_copy(last, jax.lax.rem(last, 2)).wait()

    @pl.when(nsteps >= 2)
    def _drain():
        out_copy(last - 1, jax.lax.rem(last - 1, 2)).wait()


def scale_block_hcw_q(x_pad: jnp.ndarray,
                      w1d, b1, w2d, b2, w2f, ku, bu, kd, bd, *,
                      img_h: int, img_w: int,
                      rows: int = 16, wt: int = 512,
                      unroll: bool = True) -> jnp.ndarray:
    """int8-turbo twin of ``scale_block_hcw`` — same inputs (float dual
    weights; quantization happens here), approximate output."""
    b, hp, cin, wpp = x_pad.shape
    h, wp = hp - 12, wpp - 128
    cmid = w1d.shape[0]
    assert wp % wt == 0 and h % rows == 0 and rows % 2 == 0
    assert img_h % 2 == 0 and img_w % 2 == 0
    ntiles = wp // wt
    R = rows
    Rh = R // 2
    wd = wt // 2
    kernel = functools.partial(
        _kernel, rows=R, wt=wt, cin=cin, cmid=cmid,
        h=img_h, w=img_w, nsteps=h // R,
        unroll=unroll, out_dtype=x_pad.dtype)
    dt = x_pad.dtype
    w1q, s1 = quant_weight(w1d)
    w2q, s2 = quant_weight(w2d)
    w2fq, s2f = quant_weight(w2f)
    # analytic step-0 bootstrap bound pieces: maxrowsum of the dequantized
    # |W1| and max|b1| (see the y-scale comment in the kernel)
    w1f = w1q.astype(jnp.float32) * s1
    rs1 = jnp.max(jnp.sum(jnp.abs(w1f), axis=1))
    rn1 = jnp.sqrt(jnp.max(jnp.sum(w1f * w1f, axis=1)))
    bnd = jnp.stack([rs1, jnp.max(jnp.abs(b1.astype(jnp.float32))), rn1]
                    ).reshape(1, 3)
    pmat = jnp.asarray(_pair_matrix(wt))
    qall = jnp.asarray(_up_matrices(wt, img_w, ntiles))
    i8 = jnp.int8
    out = pl.pallas_call(
        kernel,
        grid=(b, ntiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * 14 +
                 [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((b, h, cin, wp), dt),
        scratch_shapes=[
            pltpu.VMEM((2, R + 12, cin, wt + 128), dt),     # x_t
            pltpu.VMEM((R + 4, cin, wt + 6), dt),           # z_t
            pltpu.VMEM((2 * R + 4, cin, wt + 4), i8),       # ueq_t
            pltpu.VMEM((2 * R + 4, cin, wt + 4), i8),       # uoq_t
            pltpu.VMEM((2 * R + 2, cmid, wt + 2), i8),      # yeq_t
            pltpu.VMEM((2 * R + 2, cmid, wt + 2), i8),      # yoq_t
            pltpu.VMEM((R + 2, cmid, wt + 2), i8),          # y1q_t
            pltpu.VMEM((R + 4, cin, wt + 4), i8),           # xmq_t
            pltpu.VMEM((Rh + 6, cin, wd + 6), dt),          # d_t
            pltpu.VMEM((Rh + 4, cmid, wd + 4), dt),         # y5_t
            pltpu.VMEM((Rh + 2, cin, wd + 2), dt),          # e_t
            pltpu.VMEM((2, R, cin, wt), dt),                # o_t
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(x_pad, w1q, s1, b1.astype(jnp.float32), w2q, s2,
      b2.astype(jnp.float32), w2fq, s2f, ku.T, bu, kd.T, bd, pmat, qall,
      bnd)
    return out


def fused_scale_block_q(x_nhwc: jnp.ndarray, w1_hwio, b1, w2_hwio, b2,
                        kd_hwio, bd, ku_hwio, bu,
                        *, rows: int = 16, wt: int = 512) -> jnp.ndarray:
    """NHWC wrapper for the int8-turbo Block_ (mirror of
    ``fused_block2.fused_scale_block``)."""
    b, h, w, cin = x_nhwc.shape
    x = jnp.transpose(x_nhwc, (0, 1, 3, 2))
    wp = -(-w // wt) * wt
    rpad = (-h) % rows
    x = jnp.pad(x, ((0, 0), (6, 6), (0, 0), (6, 6)), mode="edge")
    x = jnp.pad(x, ((0, 0), (0, rpad), (0, 0), (0, 116 + wp - w)))
    out = scale_block_hcw_q(
        x, dual_weights(w1_hwio), b1.reshape(-1, 1),
        dual_weights(w2_hwio), b2.reshape(-1, 1),
        fold_down_conv2(w2_hwio),
        ku_hwio[0, 0], bu.reshape(-1, 1), kd_hwio[0, 0], bd.reshape(-1, 1),
        img_h=h, img_w=w, rows=rows, wt=wt)
    out = out[:, :h, :, :w]
    return jnp.transpose(out, (0, 1, 3, 2))
