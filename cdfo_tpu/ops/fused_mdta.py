"""Fused GCPI-round kernels: the MDTA transformer round of
``PartitionTransformerSA2`` in row-major (B, H, C, W) layout.

One reference round (`/root/reference/arch/SIDECVSR_our.py:1451-1475` with
MDTA `:1545-1576`) is

    x1 = x1 + attn(norm1(x1))          # channel attention over heads
    x1 = x1 + conv3x3(norm2(x1)) + x2  # conv round + side injection

In XLA/NHWC this is ~15 separate HBM passes per round (LN, qkv 1x1,
depthwise 3x3, head split/norms/gram, apply, project, LN, C=64 3x3 conv
— the last runs at 4-29 TF/s on this chip, BENCH_NOTES) costing ~4 ms per
round per frame at the headline geometry. Here it is TWO Pallas passes +
a tiny XLA softmax on (B, heads, 8, 8) blocks:

* :func:`mdta_stage1` — LN1, the 1x1 qkv projection, the depthwise 3x3
  and the GLOBAL gram/norm statistics (q k^T, q q^T, k k^T accumulated
  over all pixels, f32) in one pass; writes only ``v`` and the (3, C, C)
  stats to HBM. The channel attention matrix is a per-(batch, head)
  (8, 8) softmax — a few kB — computed between the passes in XLA
  (:func:`attention_matrix`).
* :func:`mdta_stage2` — applies the block-diagonal attention (one
  (C, C) matmul per row), the output projection, the first residual,
  LN2, the dual-form 3x3 conv, and both skips (t and x2) in one pass.

The channel attention needs every pixel before any output pixel can be
produced, so two passes over HBM is the structural minimum; everything
else (masks for the conv zero-padding, f32 LN, bf16 gram inputs) matches
the XLA path bit-for-bit in fp32.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_rows(x, lnw, lnb):
    """Channel LayerNorm of a (C, W) row in f32: per-lane over sublanes."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=0, keepdims=True)
    var = jnp.mean(xf * xf, axis=0, keepdims=True) - mu * mu
    return (xf - mu) * jax.lax.rsqrt(var + 1e-5) * lnw + lnb


def _stage1_kernel(x_ref, lnw_ref, lnb_ref, wqkv_ref, dwk_ref,
                   v_ref, st_ref,
                   x_t, qkv_t, v_t, in_sems, out_sems, *,
                   rows, wt, cin, h, w, nsteps, unroll, out_dtype):
    bi = pl.program_id(0)
    R = rows
    f32 = jnp.float32
    c3 = 3 * cin

    def in_copy(i, slot):
        return pltpu.make_async_copy(
            x_ref.at[bi, pl.ds(i * R, R + 2), :, pl.ds(0, wt + 128)],
            x_t.at[slot], in_sems.at[slot])

    def out_copy(i, slot):
        return pltpu.make_async_copy(
            v_t.at[slot],
            v_ref.at[bi, pl.ds(i * R, R), :, pl.ds(0, wt)],
            out_sems.at[slot])

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    def gram(a, b):  # lanes x lanes contraction: a @ b^T
        return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32)

    wqkv = wqkv_ref[:]                 # (3c, c) pre-transposed (out, in)
    dwk = dwk_ref[:]                   # (3c, 9) f32, taps dy*3+dx
    lnw = lnw_ref[:]                   # (c, 1) f32
    lnb = lnb_ref[:]

    # slab lane l <-> image col l - 2 (x data starts at lane 2)
    gl = jax.lax.broadcasted_iota(jnp.int32, (1, wt + 4), 1) - 2
    colmask_in = ((gl >= 0) & (gl < w)).astype(f32)
    go = jax.lax.broadcasted_iota(jnp.int32, (1, wt), 1)
    colmask_out = (go < w).astype(f32)

    @pl.when(pl.program_id(1) == 0)
    def _init_stats():
        st_ref[:] = jnp.zeros_like(st_ref)

    i = pl.program_id(1)
    slot = jax.lax.rem(i, 2)
    nxt = 1 - slot

    @pl.when(i == 0)
    def _first():
        in_copy(0, 0).start()

    @pl.when(i + 1 < nsteps)
    def _prefetch():
        in_copy(i + 1, nxt).start()

    in_copy(i, slot).wait()
    r0 = i * R

    # ---- LN1 + qkv 1x1, rows r0-1 .. r0+R (zero outside the image) ------
    def qkv_row(rr, c):
        r = r0 + rr - 1
        rv = jnp.where((r >= 0) & (r < h), 1.0, 0.0).astype(f32)
        xr = x_t[slot, pl.ds(rr, 1), :, 0:wt + 4][0]
        y = _ln_rows(xr, lnw, lnb).astype(xr.dtype)
        qkv = dot(wqkv, y) * (rv * colmask_in)
        qkv_t[pl.ds(rr, 1)] = qkv.astype(qkv_t.dtype)[None]
        return c

    jax.lax.fori_loop(0, R + 2, qkv_row, 0, unroll=(R + 2) if unroll else 1)

    # ---- depthwise 3x3 + gram/norm statistics + v out -------------------
    def dw_row(rr, c):
        acc = jnp.zeros((c3, wt), f32)
        for dy in range(3):
            row = qkv_t[pl.ds(rr + dy, 1)][0].astype(f32)
            for dx in range(3):
                # out col c (lane c+2 of slab) tap dx -> lane c+1+dx
                acc = acc + dwk[:, 3 * dy + dx:3 * dy + dx + 1] \
                    * row[:, 1 + dx:1 + dx + wt]
        # H-pad rows below img_h have real taps (row h-1) — mask them so
        # the gram/norm statistics see only in-image pixels
        rv = jnp.where(r0 + rr < h, 1.0, 0.0).astype(f32)
        acc = acc * (rv * colmask_out)
        q = acc[0:cin].astype(out_dtype)
        k = acc[cin:2 * cin].astype(out_dtype)
        v = acc[2 * cin:c3].astype(out_dtype)
        v_t[slot, pl.ds(rr, 1)] = v[None]
        st_ref[0, 0] += gram(q, k)
        st_ref[0, 1] += gram(q, q)
        st_ref[0, 2] += gram(k, k)
        return c

    @pl.when(i >= 2)
    def _wait_out():
        out_copy(i - 2, slot).wait()

    jax.lax.fori_loop(0, R, dw_row, 0, unroll=R if unroll else 1)
    out_copy(i, slot).start()

    @pl.when(i == nsteps - 1)
    def _drain():
        out_copy(i, slot).wait()

        @pl.when(nsteps >= 2)
        def _drain_prev():
            out_copy(i - 1, nxt).wait()


def mdta_stage1(x_pad, lnw, lnb, wqkv_t, dwk, *,
                img_h: int, img_w: int, rows: int = 16, wt: int = 512,
                unroll: bool = True):
    """LN1 + qkv 1x1 + depthwise 3x3 + global attention statistics.

    x_pad: (B, H+2, C, wt+128) — 1 zero row each side, x at lane offset 2,
      H % rows == 0 (pad rows beyond img_h are masked).
    lnw/lnb: (C, 1) f32 norm1 params; wqkv_t: (3C, C) = qkv 1x1 kernel
      transposed; dwk: (3C, 9) f32 depthwise taps, dy*3+dx.
    Returns (v (B, H, C, wt), stats (B, 3, C, C) f32): stats[b] =
    [sum q k^T, sum q q^T, sum k k^T] over all in-image pixels.
    """
    b, hp2, cin, wpp = x_pad.shape
    h = hp2 - 2
    assert wpp == wt + 128 and h % rows == 0
    kernel = functools.partial(
        _stage1_kernel, rows=rows, wt=wt, cin=cin, h=img_h, w=img_w,
        nsteps=h // rows, unroll=unroll, out_dtype=x_pad.dtype)
    dt = x_pad.dtype
    return pl.pallas_call(
        kernel,
        grid=(b, h // rows),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, 3, cin, cin), lambda b_, i: (b_, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, cin, wt), dt),
            jax.ShapeDtypeStruct((b, 3, cin, cin), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, rows + 2, cin, wt + 128), dt),   # x_t
            pltpu.VMEM((rows + 2, 3 * cin, wt + 4), dt),    # qkv_t
            pltpu.VMEM((2, rows, cin, wt), dt),             # v_t
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(x_pad, lnw, lnb, wqkv_t, dwk)


def attention_matrix(stats, temperature, num_heads: int):
    """(B, 3, C, C) f32 stats -> (B, C, C) block-diagonal channel-attention
    matrix: per head, softmax over the L2-normalised q k^T gram times the
    learnable temperature — exactly the MDTA formula (`:1563-1570`), with
    the normalisation factored out of the gram (q_hat k_hat^T =
    (q k^T)/(|q||k|))."""
    b, _, c, _ = stats.shape
    ch = c // num_heads
    g = stats[:, 0]
    nq = jnp.sqrt(jnp.maximum(jnp.diagonal(stats[:, 1], axis1=1, axis2=2),
                              0.0))
    nk = jnp.sqrt(jnp.maximum(jnp.diagonal(stats[:, 2], axis1=1, axis2=2),
                              0.0))
    nq = jnp.maximum(nq, 1e-12)
    nk = jnp.maximum(nk, 1e-12)
    blocks = []
    for hd in range(num_heads):
        sl = slice(hd * ch, (hd + 1) * ch)
        gb = g[:, sl, sl] / (nq[:, sl, None] * nk[:, None, sl])
        blocks.append(jax.nn.softmax(
            gb * temperature[hd].reshape(1, 1, 1), axis=-1))
    amat = jnp.zeros((b, c, c), jnp.float32)
    for hd, blk in enumerate(blocks):
        sl = slice(hd * ch, (hd + 1) * ch)
        amat = amat.at[:, sl, sl].set(blk)
    return amat


def _stage2_kernel(x_ref, v_ref, x2_ref, amat_ref, wproj_ref,
                   ln2w_ref, ln2b_ref, wconv_ref, bconv_ref, out_ref,
                   x_t, v_t, x2_t, t_t, tl_t, o_t,
                   xin_sems, vin_sems, x2_sems, out_sems, *,
                   rows, wt, cin, h, w, nsteps, unroll, out_dtype):
    bi = pl.program_id(0)
    R = rows
    f32 = jnp.float32

    def x_copy(i, slot):
        return pltpu.make_async_copy(
            x_ref.at[bi, pl.ds(i * R, R + 2), :, pl.ds(0, wt + 128)],
            x_t.at[slot], xin_sems.at[slot])

    def v_copy(i, slot):
        return pltpu.make_async_copy(
            v_ref.at[bi, pl.ds(i * R, R + 2), :, pl.ds(0, wt + 128)],
            v_t.at[slot], vin_sems.at[slot])

    def x2_copy(i, slot):
        return pltpu.make_async_copy(
            x2_ref.at[bi, pl.ds(i * R, R), :, pl.ds(0, wt)],
            x2_t.at[slot], x2_sems.at[slot])

    def out_copy(i, slot):
        return pltpu.make_async_copy(
            o_t.at[slot],
            out_ref.at[bi, pl.ds(i * R, R), :, pl.ds(0, wt)],
            out_sems.at[slot])

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    amat = amat_ref[0]                 # (c, c) this batch's attention
    wproj = wproj_ref[:]               # (c, c) pre-transposed (out, in)
    ln2w = ln2w_ref[:]
    ln2b = ln2b_ref[:]
    wconv = wconv_ref[:]               # (c, 9c) dual, dx-major
    wd = [wconv[:, d * 3 * cin:(d + 1) * 3 * cin] for d in range(3)]
    bconv = bconv_ref[:]

    gl = jax.lax.broadcasted_iota(jnp.int32, (1, wt + 4), 1) - 2
    colmask_in = ((gl >= 0) & (gl < w)).astype(f32)
    go = jax.lax.broadcasted_iota(jnp.int32, (1, wt), 1)
    colmask_out = (go < w).astype(f32)

    i = pl.program_id(1)
    slot = jax.lax.rem(i, 2)
    nxt = 1 - slot

    @pl.when(i == 0)
    def _first():
        x_copy(0, 0).start()
        v_copy(0, 0).start()
        x2_copy(0, 0).start()

    @pl.when(i + 1 < nsteps)
    def _prefetch():
        x_copy(i + 1, nxt).start()
        v_copy(i + 1, nxt).start()
        x2_copy(i + 1, nxt).start()

    x_copy(i, slot).wait()
    v_copy(i, slot).wait()
    x2_copy(i, slot).wait()
    r0 = i * R

    # ---- t = x1 + project(attn @ v); LN2(t); rows r0-1 .. r0+R ----------
    def t_row(rr, c):
        r = r0 + rr - 1
        rv = jnp.where((r >= 0) & (r < h), 1.0, 0.0).astype(f32)
        vr = v_t[slot, pl.ds(rr, 1), :, 0:wt + 4][0]
        o = dot(amat, vr)
        po = dot(wproj, o.astype(vr.dtype))
        xr = x_t[slot, pl.ds(rr, 1), :, 0:wt + 4][0]
        t = (xr.astype(f32) + po) * (rv * colmask_in)
        t_t[pl.ds(rr, 1)] = t.astype(t_t.dtype)[None]
        tl = _ln_rows(t, ln2w, ln2b) * (rv * colmask_in)
        tl_t[pl.ds(rr, 1)] = tl.astype(tl_t.dtype)[None]
        return c

    jax.lax.fori_loop(0, R + 2, t_row, 0, unroll=(R + 2) if unroll else 1)

    @pl.when(i >= 2)
    def _wait_out():
        out_copy(i - 2, slot).wait()

    # ---- out = t + conv3x3(LN2(t)) + x2 ---------------------------------
    def out_row(rr, c):
        t3 = tl_t[pl.ds(rr, 3)].reshape(3 * cin, wt + 4)
        z0 = dot(wd[0], t3)
        z1 = dot(wd[1], t3)
        z2 = dot(wd[2], t3)
        conv = (z0[:, 1:wt + 1] + z1[:, 2:wt + 2] + z2[:, 3:wt + 3]
                + bconv) * colmask_out
        acc = (conv + t_t[pl.ds(rr + 1, 1), :, 2:wt + 2][0].astype(f32)
               + x2_t[slot, pl.ds(rr, 1)][0].astype(f32))
        o_t[slot, pl.ds(rr, 1)] = acc.astype(out_dtype)[None]
        return c

    jax.lax.fori_loop(0, R, out_row, 0, unroll=R if unroll else 1)
    out_copy(i, slot).start()

    @pl.when(i == nsteps - 1)
    def _drain():
        out_copy(i, slot).wait()

        @pl.when(nsteps >= 2)
        def _drain_prev():
            out_copy(i - 1, nxt).wait()


def mdta_stage2(x_pad, v_pad, x2, amat, wproj_t, ln2w, ln2b,
                wconv_dual, bconv, *,
                img_h: int, img_w: int, rows: int = 16, wt: int = 512,
                unroll: bool = True):
    """out = t + conv3x3(LN2(t)) + x2 with t = x1 + project(attn @ v).

    x_pad/v_pad: (B, H+2, C, wt+128) — 1 zero row each side, data at lane
      offset 2. x2: (B, H, C, wt). amat: (B, C, C) from
      :func:`attention_matrix` (cast to the compute dtype by the caller).
    wproj_t: (C, C) project_out kernel transposed; wconv_dual: (C, 9C)
      dual-form round-conv weights; bconv: (C, 1).
    Returns (B, H, C, wt).
    """
    b, hp2, cin, wpp = x_pad.shape
    h = hp2 - 2
    assert wpp == wt + 128 and h % rows == 0
    kernel = functools.partial(
        _stage2_kernel, rows=rows, wt=wt, cin=cin, h=img_h, w=img_w,
        nsteps=h // rows, unroll=unroll, out_dtype=x_pad.dtype)
    dt = x_pad.dtype
    return pl.pallas_call(
        kernel,
        grid=(b, h // rows),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 3 +
                 [pl.BlockSpec((1, cin, cin), lambda b_, i: (b_, 0, 0))] +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((b, h, cin, wt), dt),
        scratch_shapes=[
            pltpu.VMEM((2, rows + 2, cin, wt + 128), dt),   # x_t
            pltpu.VMEM((2, rows + 2, cin, wt + 128), dt),   # v_t
            pltpu.VMEM((2, rows, cin, wt), dt),             # x2_t
            pltpu.VMEM((rows + 2, cin, wt + 4), dt),        # t_t
            pltpu.VMEM((rows + 2, cin, wt + 4), dt),        # tl_t
            pltpu.VMEM((2, rows, cin, wt), dt),             # o_t
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(x_pad, v_pad, x2, amat, wproj_t, ln2w, ln2b, wconv_dual, bconv)
