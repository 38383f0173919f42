"""Fused dual-MSA alignment kernels (streaming CVSR_V8 path).

The active ``DualAttAlignment`` (`/root/reference/arch/SIDECVSR_our.py:
3427-3496`) is flow-warp + two gated cross-MSAs + fusion. At the headline
geometry its operands are 24 neighbour-frames of (272, 480, 64) — every
XLA pass over them is ~400 MB, and the round-2 algebraic fusion still left
~6 GB of HBM traffic per step (center broadcast, concat+1x1, GAP gates,
norms, gram, apply, project, fusion, CALayer — BENCH_NOTES). Channel
attention needs global statistics before any output pixel, so the chain
splits into exactly two passes:

* :func:`msa_stage1` — reads warped / pred / center ONCE, computes the
  fused key ``k = relu(Wf [warped; pred])`` on the fly, and accumulates
  the global statistics: q k^T / q q^T / k k^T grams (f32) plus the GAP
  sums of warped and pred (the v-gates). Writes only a (5, C, C) stats
  block per frame.
* XLA glue (a few kB): per-head softmax attention (reusing
  :func:`fused_mdta.attention_matrix`), sigmoid v-gates, and the gates
  FOLDED into the attention matrix — ``A (g_w.w + g_p.p)`` =
  ``(A diag(g_w)) w + (A diag(g_p)) p``, so stage 2 needs no v_sum pass.
* :func:`msa_stage2` — second read of warped / pred / center, applies the
  folded attention, the output projection, the shared ``fusion_out_0``
  (weight sharing is the reference's), accumulates the CALayer GAP, and
  writes the result directly in row-major (B, H, C, W) — the layout the
  fused alignment tail (`ops/fused_tail.py`) consumes — via an in-VMEM
  transpose.

Both kernels work W-MAJOR: rows are (W, C) planes exactly as the NHWC
warp gather produces them, so no HBM transposes of the 400 MB operands
exist anywhere; per-pixel channel maps are right-multiplications by
(in, out) matrices on the MXU.

Blocks stream through Pallas BlockSpec pipelining (R-row slabs; one grid
step covers ALL ``nbr`` neighbour frames of an output frame, so the
center slab is fetched once per group — never broadcast to the neighbour
batch, never re-fetched per neighbour). Manual HBM DMA cannot be used
here: Mosaic rejects
row-slices of a C=64-lane NHWC HBM array ("slice shape along dimension 3
must be aligned to tiling (128)") — BlockSpec with full-size trailing
dims is the supported path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _s1_kernel(w_ref, p_ref, c_ref, wf_ref, st_ref, g_t, *,
               rows, h, cin, nbr, nsteps, unroll):
    i = pl.program_id(1)
    f32 = jnp.float32

    def dotT(a, b):  # sublane contraction: a^T @ b -> (C, C)
        return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    wfA = wf_ref[0:cin]            # (C, C) fusion rows for warped
    wfB = wf_ref[cin:2 * cin]      # (C, C) fusion rows for pred

    @pl.when(i == 0)
    def _first():
        g_t[:] = jnp.zeros_like(g_t)
        st_ref[:] = jnp.zeros_like(st_ref)

    r0 = i * rows

    # all nbr neighbour frames of one output frame per grid step: the
    # center row slab is fetched ONCE for the whole group (it used to be
    # re-fetched per neighbour — 6x the HBM traffic on the 400 MB operand)
    for f in range(nbr):
        def row(rr, c, f=f):
            rv = jnp.where(r0 + rr < h, 1.0, 0.0).astype(f32)
            wr = w_ref[f, rr]                      # (W, C)
            pr = p_ref[f, rr]
            qr = c_ref[0, rr]
            kr = dot(wr, wfA) + dot(pr, wfB)
            kr = (jnp.maximum(kr, 0.0) * rv).astype(wr.dtype)
            qv = (qr.astype(f32) * rv).astype(qr.dtype)
            st_ref[f, 0] += dotT(qv, kr)
            st_ref[f, 1] += dotT(qv, qv)
            st_ref[f, 2] += dotT(kr, kr)
            g_t[2 * f:2 * f + 1] += (jnp.sum(wr.astype(f32), axis=0,
                                             keepdims=True) * rv)
            g_t[2 * f + 1:2 * f + 2] += (jnp.sum(pr.astype(f32), axis=0,
                                                 keepdims=True) * rv)
            return c

        jax.lax.fori_loop(0, rows, row, 0, unroll=rows if unroll else 1)

    @pl.when(i == nsteps - 1)
    def _flush():
        for f in range(nbr):
            st_ref[f, 3] = jnp.broadcast_to(g_t[2 * f:2 * f + 1],
                                            (cin, cin))
            st_ref[f, 4] = jnp.broadcast_to(g_t[2 * f + 1:2 * f + 2],
                                            (cin, cin))


def msa_stage1(warped, pred, center, wfuse, *,
               img_h: int, img_w: int, nbr: int, rows: int = 16,
               unroll: bool = True):
    """Global MSA statistics in one read of the big operands.

    warped/pred: (B, H, W, C) NHWC (W zero-padded beyond img_w, rows
      beyond img_h arbitrary — masked). center: (B//nbr, H, W, C).
    wfuse: (2C, C) = fusion_out_0 kernel[0, 0] (in, out).
    Returns stats (B, 5, C, C) f32: [q k^T, q q^T, k k^T, GAP-sum(warped)
    broadcast, GAP-sum(pred) broadcast] over in-image pixels.
    """
    b, hp, wp, cin = warped.shape
    assert hp % rows == 0 and b % nbr == 0
    nsteps = hp // rows
    kernel = functools.partial(
        _s1_kernel, rows=rows, h=img_h, cin=cin, nbr=nbr, nsteps=nsteps,
        unroll=unroll)
    blk = pl.BlockSpec((nbr, rows, wp, cin), lambda b_, i: (b_, i, 0, 0))
    cblk = pl.BlockSpec((1, rows, wp, cin), lambda b_, i: (b_, i, 0, 0))
    return pl.pallas_call(
        kernel,
        grid=(b // nbr, nsteps),
        in_specs=[blk, blk, cblk, pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((nbr, 5, cin, cin),
                               lambda b_, i: (b_, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 5, cin, cin), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2 * nbr, cin), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(warped, pred, center, wfuse)


def _s2_kernel(w_ref, p_ref, c_ref, awt_ref, apt_ref, wproj_ref, wf_ref,
               fo_ref, st2_ref, g_t, *, rows, h, cin, nbr, nsteps, unroll,
               lpad=0, rpad=0):
    i = pl.program_id(1)
    f32 = jnp.float32

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    wproj = wproj_ref[:]           # (C, C) (in, out)
    wfA = wf_ref[0:cin]
    wfB = wf_ref[cin:2 * cin]

    @pl.when(i == 0)
    def _first():
        g_t[:] = jnp.zeros_like(g_t)
        st2_ref[:] = jnp.zeros_like(st2_ref)

    r0 = i * rows

    for f in range(nbr):
        awt = awt_ref[f]           # (C, C): diag(g_w) A^T, right-mult form
        apt = apt_ref[f]

        def row(rr, c, f=f, awt=awt, apt=apt):
            rv = jnp.where(r0 + rr < h, 1.0, 0.0).astype(f32)
            wr = w_ref[f, rr]                      # (W, C)
            pr = p_ref[f, rr]
            qr = c_ref[0, rr]
            o = dot(wr, awt) + dot(pr, apt)        # attn @ gated v, f32
            po = dot(o.astype(wr.dtype), wproj)
            fu = dot(po.astype(wr.dtype), wfA) + dot(qr, wfB)
            fu = jnp.maximum(fu, 0.0) * rv
            g_t[2 * f:2 * f + 1] += jnp.sum(fu, axis=0, keepdims=True)
            fut = jnp.transpose(fu.astype(fo_ref.dtype), (1, 0))
            if lpad or rpad:
                fut = jnp.pad(fut, ((0, 0), (lpad, rpad)))
            fo_ref[f, pl.ds(rr, 1)] = fut[None]
            return c

        jax.lax.fori_loop(0, rows, row, 0, unroll=rows if unroll else 1)

    @pl.when(i == nsteps - 1)
    def _drain():
        for f in range(nbr):
            st2_ref[f, 0] = jnp.broadcast_to(g_t[2 * f:2 * f + 1],
                                             (cin, cin))


def msa_stage2(warped, pred, center, awt, apt, wproj, wfuse, *,
               img_h: int, img_w: int, nbr: int, rows: int = 16,
               unroll: bool = True, out_wpp: int | None = None):
    """Apply the folded attention and fusion; emit row-major output.

    awt/apt: (B, C, C) = diag(gate) @ A^T per frame (right-mult form),
    compute dtype. wproj: (C, C) project_out (in, out); wfuse as stage 1.
    Returns (fo, st2 (B, 1, C, C) f32 GAP-sum of fo).

    Default: fo (B, H, C, W) row-major = relu(fusion_out_0([project(
    attn @ v_sum); center])).
    With ``out_wpp``: fo is written DIRECTLY in the fused-tail slab
    layout (B, H + 2*rows, C, out_wpp) — image row 0 at slab row
    ``rows``, image col 0 at lane 4, zero lanes elsewhere; the top and
    bottom ``rows``-row slabs are UNWRITTEN (the tail where-masks them).
    This elides the full-res XLA gate-multiply+pad pass between the MSA
    and the tail (~0.9 GB/step at the headline geometry).
    """
    b, hp, wp, cin = warped.shape
    assert hp % rows == 0 and b % nbr == 0
    nsteps = hp // rows
    lpad = 4 if out_wpp else 0
    rpad = (out_wpp - wp - 4) if out_wpp else 0
    assert rpad >= 0
    kernel = functools.partial(
        _s2_kernel, rows=rows, h=img_h, cin=cin, nbr=nbr, nsteps=nsteps,
        unroll=unroll, lpad=lpad, rpad=rpad)
    dt = warped.dtype
    blk = pl.BlockSpec((nbr, rows, wp, cin), lambda b_, i: (b_, i, 0, 0))
    cblk = pl.BlockSpec((1, rows, wp, cin), lambda b_, i: (b_, i, 0, 0))
    mblk = pl.BlockSpec((nbr, cin, cin), lambda b_, i: (b_, 0, 0))
    if out_wpp:
        fo_spec = pl.BlockSpec((nbr, rows, cin, out_wpp),
                               lambda b_, i: (b_, i + 1, 0, 0))
        fo_shape = jax.ShapeDtypeStruct((b, hp + 2 * rows, cin, out_wpp),
                                        dt)
    else:
        fo_spec = pl.BlockSpec((nbr, rows, cin, wp),
                               lambda b_, i: (b_, i, 0, 0))
        fo_shape = jax.ShapeDtypeStruct((b, hp, cin, wp), dt)
    return pl.pallas_call(
        kernel,
        grid=(b // nbr, nsteps),
        in_specs=[blk, blk, cblk, mblk, mblk,
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[
            fo_spec,
            pl.BlockSpec((nbr, 1, cin, cin), lambda b_, i: (b_, 0, 0, 0)),
        ],
        out_shape=[
            fo_shape,
            jax.ShapeDtypeStruct((b, 1, cin, cin), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2 * nbr, cin), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(warped, pred, center, awt, apt, wproj, wfuse)
