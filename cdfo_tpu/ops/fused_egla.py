"""Fused EGLA kernels (expected-mask eval path).

`LLongRangAttention` (`/root/reference/arch/SIDECVSR_our.py:2141-2249`)
runs, per neighbour frame: a 1x1 q/v projection, a binary residual mask,
9-tap "band" convs along the channel and H axes, per-row and per-column
1-D self-attention, an inverse-masked 8x8 window attention, and a 1x1
fusion — a dozen full-resolution XLA passes around the two existing
attention kernels. In 'expected' mask mode the gumbel mask is spatially
CONSTANT per (frame, channel), so the mask multiply and the channel-band
conv COMPOSE into the q projection:

    sparse_q = ((x @ Wq + bq) * m) @ Mc + b9
             = x @ (Wq diag(m) Mc) + ((bq * m) @ Mc + b9)

(Mc = the (C, C) banded matrix of the 9-tap channel conv). Two kernels
then cover the whole module:

* :func:`eg1_rows` — one read of ``x`` (with a one-block halo for the
  H-band): computes sparse_q and the band-projected v on the fly, runs
  the per-row softmax(q q^T) v attention, and emits BOTH column-stage
  operands: ``q_c`` (H-band of sparse_q) and ``v_r`` (row-attended v).
  The existing `column_self_attention` kernel consumes them unchanged.
* :func:`eg2_local_fuse` — one read of ``x`` and the column output:
  recomputes q/v (flops are free, traffic is not), runs the
  inverse-masked 8x8 window attention entirely in VMEM (windows are
  free leading-dim reshapes of an 8-row slab), applies the fusion conv
  and the residual add, and writes the final EGLA output.

Together they replace ~1.3 GB/step of XLA glue passes with ~0.7 GB of
kernel traffic at the headline geometry.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _softmax_rows(s):
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _eg1_kernel(xp_ref, xc_ref, xn_ref, aq_ref, cq_ref, bv_ref, cv_ref,
                h9_ref, qc_ref, vr_ref, qs_t, *,
                rows, h, cin, nsteps, wpix):
    i = pl.program_id(1)
    f32 = jnp.float32
    aq = aq_ref[0]                   # (C, C) per-frame composed q proj
    cq = cq_ref[0, 0]                # (C,) row bias
    bv = bv_ref[:]                   # (C, C) shared v proj
    cv = cv_ref[0]
    R = rows

    # q_s slab: rows j in [0, R+8) <-> image row g = i*R + j - 4.
    # j < 4 reads the previous block's last rows; j >= R+4 the next
    # block's first rows (index maps clamp at the boundary; the rv mask
    # zeroes out-of-image rows, so clamped garbage never contributes).
    for j in range(R + 8):
        if j < 4:
            src = xp_ref[0, R - 4 + j]
        elif j < R + 4:
            src = xc_ref[0, j - 4]
        else:
            src = xn_ref[0, j - R - 4]
        g = i * R + j - 4
        rv = jnp.where((g >= 0) & (g < h), 1.0, 0.0).astype(f32)
        q = _dot(src, aq) + cq.astype(f32)
        qs_t[pl.ds(j, 1)] = (q * rv).astype(qs_t.dtype)[None]

    h9 = [h9_ref[d] for d in range(10)]   # 9 taps + bias (SMEM scalars)

    for j in range(R):
        q = qs_t[4 + j]                                  # (W, C)
        s = jax.lax.dot_general(q, q, (((1,), (1,)), ((), ())),
                                preferred_element_type=f32)
        p = _softmax_rows(s)
        v = _dot(xc_ref[0, j], bv) + cv.astype(f32)
        o = jax.lax.dot_general(p.astype(q.dtype), v.astype(q.dtype),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=f32)
        vr_ref[0, pl.ds(j, 1)] = o.astype(vr_ref.dtype)[None]
        qc = h9[0] * qs_t[j].astype(f32)
        for d in range(1, 9):
            qc = qc + h9[d] * qs_t[j + d].astype(f32)
        qc_ref[0, pl.ds(j, 1)] = (qc + h9[9]).astype(qc_ref.dtype)[None]


def eg1_rows(x, aq, cq, bv, cv, h9, *, img_h: int, rows: int = 16):
    """Row stage of EGLA: (q_c, v_r) in one read of x.

    x: (M, Hp, W, C), Hp % rows == 0 (rows beyond img_h arbitrary).
    aq: (M, C, C) composed q projection (Wq diag(mask) Mc, f32-composed);
    cq: (M, C) its bias row. bv: (C, C) = Wv Mc; cv: (1, C).
    h9: (10,) f32 — the 9 H-band taps + bias.
    Returns (q_c, v_r), both (M, Hp, W, C).
    """
    m, hp, w, cin = x.shape
    assert hp % rows == 0
    nsteps = hp // rows
    kernel = functools.partial(_eg1_kernel, rows=rows, h=img_h, cin=cin,
                               nsteps=nsteps, wpix=w)
    dt = x.dtype
    blk = pl.BlockSpec((1, rows, w, cin), lambda b, i: (b, i, 0, 0))
    blk_p = pl.BlockSpec((1, rows, w, cin),
                         lambda b, i: (b, jnp.maximum(i - 1, 0), 0, 0))
    blk_n = pl.BlockSpec(
        (1, rows, w, cin),
        lambda b, i: (b, jnp.minimum(i + 1, nsteps - 1), 0, 0))
    return pl.pallas_call(
        kernel,
        grid=(m, nsteps),
        in_specs=[blk_p, blk, blk_n,
                  pl.BlockSpec((1, cin, cin), lambda b, i: (b, 0, 0)),
                  # per-frame vectors ride as (M, 1, C): a (1, C) block
                  # over (M, C) is illegal on hardware (sublane block 1
                  # is neither 8-divisible nor the full M extent)
                  pl.BlockSpec((1, 1, cin), lambda b, i: (b, 0, 0)),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[blk, blk],
        out_shape=[jax.ShapeDtypeStruct((m, hp, w, cin), dt),
                   jax.ShapeDtypeStruct((m, hp, w, cin), dt)],
        scratch_shapes=[pltpu.VMEM((rows + 8, w, cin), dt)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(x, x, x, aq, cq.reshape(m, 1, cin), bv, cv, h9.astype(jnp.float32))


def _eg2_kernel(x_ref, lg_ref, wq_ref, bq_ref, wv_ref, bvv_ref,
                mi_ref, fa_ref, fb_ref, bf_ref, out_ref, *,
                rows, h, cin, ws, wpix):
    i = pl.program_id(1)
    f32 = jnp.float32
    wq = wq_ref[:]
    wv = wv_ref[:]
    bq = bq_ref[0].astype(f32)
    bvv = bvv_ref[0].astype(f32)
    mi = mi_ref[0, 0].astype(f32)    # (C,) inverse mask (1 - m)
    fa = fa_ref[:]                   # (C, C) fuse rows for long
    fb = fb_ref[:]                   # (C, C) fuse rows for local
    bf = bf_ref[0].astype(f32)
    R = rows
    dt = x_ref.dtype

    # q/v for the whole slab in two dots (free leading-dim merge)
    xs = x_ref[0].reshape(R * wpix, cin)
    q = (_dot(xs, wq) + bq) * mi     # masked q, f32 (R*W, C)
    v = (_dot(xs, wv) + bvv).astype(dt)
    q = q.astype(dt)
    qw = q.reshape(R, wpix, cin)
    vw = v.reshape(R, wpix, cin)

    parts = []
    for t in range(wpix // ws):
        qt = qw[:, t * ws:(t + 1) * ws].reshape(R * ws, cin)
        vt = vw[:, t * ws:(t + 1) * ws].reshape(R * ws, cin)
        s = jax.lax.dot_general(qt, qt, (((1,), (1,)), ((), ())),
                                preferred_element_type=f32)
        p = _softmax_rows(s)
        o = jax.lax.dot_general(p.astype(dt), vt, (((1,), (0,)), ((), ())),
                                preferred_element_type=f32)
        parts.append(o.reshape(R, ws, cin))
    loc = jnp.concatenate(parts, axis=1)

    lg = lg_ref[0].reshape(R * wpix, cin)
    fused = (_dot(lg, fa) + _dot(loc.astype(dt).reshape(R * wpix, cin), fb)
             + bf)
    outv = fused + xs.astype(f32)
    out_ref[0] = outv.astype(dt).reshape(R, wpix, cin)


def eg2_local_fuse(x, long_out, wq, bq, wv, bv, mask_inv, fa, fb, bf, *,
                   img_h: int, ws: int = 8):
    """Window stage + fusion + residual: the final EGLA output.

    x, long_out: (M, Hp, W, C); Hp % ws == 0, W % ws == 0.
    wq/wv: (C, C) q/v projections, bq/bv (M? no — shared) (1, C).
    mask_inv: (M, C) = 1 - mask. fa/fb: (C, C) halves of the fuse conv;
    bf: (1, C). Returns (M, Hp, W, C) = fuse([long, local]) + x.
    """
    m, hp, w, cin = x.shape
    assert hp % ws == 0 and w % ws == 0
    kernel = functools.partial(_eg2_kernel, rows=ws, h=img_h, cin=cin,
                               ws=ws, wpix=w)
    dt = x.dtype
    blk = pl.BlockSpec((1, ws, w, cin), lambda b, i: (b, i, 0, 0))
    return pl.pallas_call(
        kernel,
        grid=(m, hp // ws),
        in_specs=[blk, blk,
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  # (M, 1, C) for the same hardware block rule as eg1's cq
                  pl.BlockSpec((1, 1, cin), lambda b, i: (b, 0, 0)),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((m, hp, w, cin), dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(x, long_out, wq, bq, wv, bv, mask_inv.reshape(m, 1, cin), fa, fb, bf)
