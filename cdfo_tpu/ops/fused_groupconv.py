"""Small fused kernel: 3x3 conv (zero-padded) + residual skip-add on
row-major (B, H, C, W) features — the SCGroup tail (`conv` + ``x + g``,
`/root/reference/arch/SIDECVSR_our.py:430-444`) and SCNet tail.

The XLA path (`trunk_fast._conv3x3_hcw`) materialises a (B, H, 3C, W+2)
row-triple concat in HBM (~50 MB/frame at the headline geometry) plus the
einsum output — ~1 ms per group conv. Here the 3-row K-stack is a free
leading-dim reshape of VMEM rows, and the skip tensor rides the same DMA.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, skip_ref, w_ref, b_ref, out_ref,
            x_t, s_t, o_t, in_sems, sk_sems, out_sems, *,
            rows, wt, cin, h, w, nsteps, unroll, out_dtype):
    bi = pl.program_id(0)
    ci = pl.program_id(1)
    c0 = ci * wt
    R = rows
    f32 = jnp.float32

    def in_copy(i, slot):
        return pltpu.make_async_copy(
            x_ref.at[bi, pl.ds(i * R, R + 2), :, pl.ds(c0, wt + 128)],
            x_t.at[slot], in_sems.at[slot])

    def sk_copy(i, slot):
        return pltpu.make_async_copy(
            skip_ref.at[bi, pl.ds(i * R, R), :, pl.ds(c0, wt)],
            s_t.at[slot], sk_sems.at[slot])

    def out_copy(i, slot):
        return pltpu.make_async_copy(
            o_t.at[slot],
            out_ref.at[bi, pl.ds(i * R, R), :, pl.ds(c0, wt)],
            out_sems.at[slot])

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    wv = w_ref[:]                      # (cin, 9*cin) dual, dx-major
    wd = [wv[:, d * 3 * cin:(d + 1) * 3 * cin] for d in range(3)]
    b = b_ref[:]

    g1 = jax.lax.broadcasted_iota(jnp.int32, (1, wt + 4), 1) + (c0 - 2)
    colmask = ((g1 >= 0) & (g1 < w)).astype(f32)

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

        @pl.when(i >= 2)
        def _wait_out():
            out_copy(i - 2, slot).wait()

        def out_row(ri, c):
            # masked row triple around 1x row r0 + ri
            parts = []
            for d in range(3):
                r = r0 + ri + d - 1
                rv = jnp.where((r >= 0) & (r < h), 1.0, 0.0).astype(f32)
                xr = x_t[slot, pl.ds(ri + d, 1), :, 0:wt + 4][0]
                parts.append((xr.astype(f32) * (rv * colmask)
                              ).astype(xr.dtype))
            x3 = jnp.concatenate(parts, axis=0)          # (3cin, wt+4)
            z0 = dot(wd[0], x3)
            z1 = dot(wd[1], x3)
            z2 = dot(wd[2], x3)
            acc = (z0[:, 1:wt + 1] + z1[:, 2:wt + 2] + z2[:, 3:wt + 3]
                   + b + s_t[slot, pl.ds(ri, 1)][0].astype(f32))
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


def conv3x3_residual_hcw(x_pad: jnp.ndarray, skip: jnp.ndarray,
                         wdual, bias, *, img_h: int, img_w: int,
                         rows: int = 16, wt: int = 512,
                         unroll: bool = True) -> jnp.ndarray:
    """out = skip + conv3x3(x) on row-major features.

    x_pad: (B, H+2, cin, Wp+128), 1 row pad each side, 2 cols left (pad
      values arbitrary — masked). skip: (B, H, cin, Wp).
    wdual: (cin, 9*cin) from ``dual_weights``; bias (cin, 1).
    """
    bsz, hp2, cin, wpp = x_pad.shape
    h, wp = hp2 - 2, wpp - 128
    assert wp % wt == 0 and h % rows == 0
    kernel = functools.partial(
        _kernel, rows=rows, wt=wt, cin=cin, h=img_h, w=img_w,
        nsteps=h // rows, unroll=unroll, out_dtype=x_pad.dtype)
    dt = x_pad.dtype
    return pl.pallas_call(
        kernel,
        grid=(bsz, wp // wt),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((bsz, h, cin, wp), dt),
        scratch_shapes=[
            pltpu.VMEM((2, rows + 2, cin, wt + 128), dt),
            pltpu.VMEM((2, rows, cin, wt), dt),
            pltpu.VMEM((2, rows, cin, wt), dt),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(x_pad, skip, wdual, bias)
