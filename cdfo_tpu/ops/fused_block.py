"""Fused Pallas kernel for the SCNet ``Block_`` body — the per-frame hot op.

The reference trunk body (`/root/reference/arch/SIDECVSR_our.py:378-406`)
is ``conv3x3(64->256) -> lrelu -> conv3x3(256->64)`` run 63 times per frame
(7 groups x 3 blocks x 3 scales). Plain XLA NHWC convs reach ~29 TF/s on
v5e at this geometry: with C=64 the channel (lane) dimension only half-fills
the 128-wide MXU/VREG lanes.

This kernel runs the pair in a **row-major (H, C, W) layout** and computes
both convs as *dual-form* matmuls — channels live in sublanes and the W
axis provides the 128-lane dimension:

    y[yr]  = lrelu(W1d (256,576)  @ P1 (576, Wt+2))     per intermediate row
    out[r] =        W2d (64,2304) @ P2 (2304, Wt)       per output row

where P1/P2 are tap-stacked row triples: f[r:r+3] -> (3C, W') reshaped for
free (leading-dim collapse), then three lane-shifted STORES into a scratch
patch buffer (vector concat of tiles with different lane offsets is not
supported by Mosaic). K and N are large and 128-aligned for BOTH matmuls
(the 64-channel output of conv2 sits in the M dimension, which streams).

The two convs are fused — the 4x-wide intermediate never touches HBM — and
row-blocks are processed by an in-kernel double-buffered DMA pipeline (the
naive one-DMA-per-grid-step version was latency-bound: ~50us/step of
serialized start->wait round trips vs ~30us of compute).

Input must be pre-padded: x_pad (B, H+4, C, Wp+128) with zeros (2 rows each
side; cols: 2 left, the rest right), Wp a multiple of the W tile (DMA lane
slices must be 128-aligned, so each row-block reads a wt+128 slab).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def dual_weights(w_hwio: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, cin, cout) HWIO -> (cout, 9*cin) with row index
    dx*(3*cin) + dy*cin + ci — the P-buffer tap order."""
    _, _, cin, cout = w_hwio.shape
    # (dy, dx, ci, co) -> (dx, dy, ci, co)
    w = jnp.transpose(w_hwio, (1, 0, 2, 3)).reshape(9 * cin, cout)
    return jnp.transpose(w, (1, 0))


def _body_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
                 x_t, y_t, o_t, p1_t, in_sems, out_sems, *, rows, wt,
                 cin, cmid, h, w, nsteps, add_residual, unroll_rows, out_dtype):
    bi = pl.program_id(0)
    ci = pl.program_id(1)
    c0 = ci * wt

    def in_copy(i, slot):
        return pltpu.make_async_copy(
            x_ref.at[bi, pl.ds(i * rows, rows + 4), :, pl.ds(c0, wt + 128)],
            x_t.at[slot], in_sems.at[slot])

    def out_copy(i, slot):
        return pltpu.make_async_copy(
            o_t.at[slot],
            out_ref.at[bi, pl.ds(i * rows, rows), :, pl.ds(c0, wt)],
            out_sems.at[slot])

    w1 = w1_ref[:]   # (cmid, 9*cin)
    # conv2 runs as 3 per-dx matmuls on the UNSHIFTED row-triple, with the
    # dx shift applied to the (tiny) outputs instead of the (huge) K-stacked
    # patch: out[:, c] = sum_d (W2_d @ y3)[:, c+d]. This removes the
    # 3x(3*cmid x wt) VPU patch copies per row that dominated v1.
    w2s = [w2_ref[:, d * 3 * cmid:(d + 1) * 3 * cmid] for d in range(3)]

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    # conv2 sees ZERO-padded y at image borders (padding=1 semantics): mask
    # halo rows/cols that fall outside the real (h, w) image, where conv1
    # would otherwise produce extended-support values.
    gcol = jax.lax.broadcasted_iota(jnp.int32, (1, wt + 2), 1) + (c0 - 1)
    colmask = ((gcol >= 0) & (gcol < w)).astype(jnp.float32)

    in_copy(0, 0).start()

    def step(i, _):
        slot = jax.lax.rem(i, 2)
        nxt = 1 - slot
        r0 = i * rows

        @pl.when(i + 1 < nsteps)
        def _prefetch():
            in_copy(i + 1, nxt).start()

        in_copy(i, slot).wait()

        # conv1: intermediate rows yr = 0..rows+1 (row r needs y[r..r+2])
        def conv1_row(yr, c):
            x3 = x_t[slot, pl.ds(yr, 3)].reshape(3 * cin, wt + 128)
            for d in range(3):
                p1_t[d * 3 * cin:(d + 1) * 3 * cin] = x3[:, d:d + wt + 2]
            acc = dot(w1, p1_t[:]) + b1_ref[:]
            acc = jnp.where(acc >= 0, acc, 0.1 * acc)
            grow = r0 + yr - 1
            rowmask = ((grow >= 0) & (grow < h)).astype(jnp.float32)
            y_t[pl.ds(yr, 1)] = (acc * (rowmask * colmask)).astype(
                y_t.dtype)[None]
            return c

        jax.lax.fori_loop(0, rows + 2, conv1_row, 0,
                          unroll=(rows + 2) if unroll_rows else 1)

        # this slot's previous out-DMA must land before conv2 overwrites o_t
        @pl.when(i >= 2)
        def _wait_out():
            out_copy(i - 2, slot).wait()

        def conv2_row(r, c):
            y3 = y_t[pl.ds(r, 3)].reshape(3 * cmid, wt + 2)
            z0 = dot(w2s[0], y3)
            z1 = dot(w2s[1], y3)
            z2 = dot(w2s[2], y3)
            acc = (z0[:, 0:wt] + z1[:, 1:wt + 1] + z2[:, 2:wt + 2]
                   + b2_ref[:])
            if add_residual:
                acc = acc + x_t[slot, pl.ds(r + 2, 1), :,
                                2:wt + 2][0].astype(jnp.float32)
            o_t[slot, pl.ds(r, 1)] = acc.astype(out_dtype)[None]
            return c

        jax.lax.fori_loop(0, rows, conv2_row, 0,
                          unroll=rows if unroll_rows else 1)
        out_copy(i, slot).start()
        return _

    jax.lax.fori_loop(0, nsteps, step, 0, unroll=False)

    # drain the last (up to) two out-DMAs
    last = nsteps - 1
    out_copy(last, jax.lax.rem(last, 2)).wait()

    @pl.when(nsteps >= 2)
    def _drain():
        out_copy(last - 1, jax.lax.rem(last - 1, 2)).wait()


def block_body_hcw(x_pad: jnp.ndarray, w1d, b1, w2d, b2, *,
                   rows: int = 8, wt: int = 512,
                   img_h: int | None = None,
                   img_w: int | None = None,
                   add_residual: bool = False,
                   unroll_rows: bool = False) -> jnp.ndarray:
    """Fused body on row-major features.

    x_pad: (B, H+4, cin, Wp+128), zero-padded (2 rows each side; columns:
      2 left + the rest right), Wp % wt == 0.
    w1d: (cmid, 9*cin) from :func:`dual_weights`; b1 (cmid, 1).
    w2d: (cin, 9*cmid); b2 (cin, 1).
    img_h/img_w: true image extent (defaults: full padded extent) — used to
      zero conv2's halo at image borders.
    Returns (B, H, cin, Wp).
    """
    b, hp4, cin, wpp = x_pad.shape
    h, wp = hp4 - 4, wpp - 128
    cmid = w1d.shape[0]
    assert wp % wt == 0 and h % rows == 0, (h, wp, rows, wt)

    grid = (b, wp // wt)
    kernel = functools.partial(
        _body_kernel, rows=rows, wt=wt, cin=cin, cmid=cmid,
        h=img_h if img_h is not None else h,
        w=img_w if img_w is not None else wp,
        nsteps=h // rows,
        add_residual=add_residual,
        unroll_rows=unroll_rows,
        out_dtype=x_pad.dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((b, h, cin, wp), x_pad.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, rows + 4, cin, wt + 128), x_pad.dtype),
            pltpu.VMEM((rows + 2, cmid, wt + 2), x_pad.dtype),
            pltpu.VMEM((2, rows, cin, wt), x_pad.dtype),
            pltpu.VMEM((9 * cin, wt + 2), x_pad.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # v5e physical VMEM is far above the 16 MB scoped default; the
            # unrolled row loops need headroom for in-flight accumulators
            vmem_limit_bytes=100 * 1024 * 1024),
        # CPU (tests / virtual mesh) runs the kernel in interpret mode
        interpret=jax.default_backend() == "cpu",
    )(x_pad, w1d, b1, w2d, b2)


def fused_block_body(x_nhwc: jnp.ndarray, w1_hwio, b1, w2_hwio, b2,
                     *, rows: int = 8, wt: int = 512,
                     residual: bool = True) -> jnp.ndarray:
    """NHWC wrapper (for tests / drop-in use): transposes to (H, C, W),
    pads, runs the fused kernel, transposes back. Production use should
    keep the whole trunk in HCW layout instead (see trunk_fast.py)."""
    b, h, w, cin = x_nhwc.shape
    x = jnp.transpose(x_nhwc, (0, 1, 3, 2))  # (B, H, C, W)
    wp = -(-w // wt) * wt
    rpad = (-h) % rows
    x = jnp.pad(x, ((0, 0), (2, 2 + rpad), (0, 0), (2, 126 + wp - w)))
    out = block_body_hcw(
        x, dual_weights(w1_hwio), b1.reshape(-1, 1),
        dual_weights(w2_hwio), b2.reshape(-1, 1), rows=rows, wt=wt,
        img_h=h, img_w=w, add_residual=residual)
    out = out[:, :h, :, :w]
    return jnp.transpose(out, (0, 1, 3, 2))
