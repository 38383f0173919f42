#!/usr/bin/env python
"""Small-DMA throughput probe — sizes the Pallas block-gather warp.

The shipped warp (`ops/warp.py::flow_warp_ring`) is an XLA per-pixel
row-gather measured at 11.8 ns/index (~43 GB/s on 512 B rows,
BENCH_NOTES). HEVC flows are constant over 4x4 blocks, so a kernel that
issues ONE patch DMA per 4x4 output block — (5, 5*C) strided rows from
an UNPACKED (H, W, C) ring — would move 2.5x fewer bytes than the quad
gather and 16x fewer "indices". Whether that wins is purely a question
of per-DMA overhead with many copies in flight, which this tool
measures:

  mode=patch : N independent (8, 6*C)-shaped strided copies — the
               smallest LEGAL block-gather unit (HBM DMA slices must
               align to the (8, 128) tile, so the ideal (5, 5*C) patch
               rounds up; the overshoot is real cost a kernel would pay)
  mode=run16 : N/16 copies of (8, 66*C) — a merged run of 16 blocks
               sharing one integer motion vector (HEVC uniform regions)
  mode=row   : N contiguous (8, 4*C) segments (the 4 KB aligned unit)
  mode=big   : one contiguous copy of the same total bytes (BW ceiling)

Timing discipline: REPS chained kernel calls with a data link (the
checksum output feeds the next call's offset base) and ONE readback;
two rep counts differenced so the ~38 ms readback floor cancels
(`tools/microbench_dots.py` discipline).

Run:  python tools/microbench_dma.py [--nblocks 8160] [--c 64]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


NSLOTS = 8  # outstanding DMAs


def _gather_kernel(starts_ref, ring_ref, out_ref, stage, sems, *,
                   nblk, ph, pw, c, mode):
    """Issue nblk patch DMAs of (ph, pw*c) from ring (H, W*C) at
    prefetched (y, x) starts, NSLOTS in flight; checksum one lane."""

    def get_dma(i, slot):
        # starts are host-guaranteed tile-aligned; the hints let Mosaic
        # prove it ("Failed to prove a tile index is divisible" otherwise)
        y = pl.multiple_of(starts_ref[2 * i], 8)
        x = pl.multiple_of(starts_ref[2 * i + 1], 128)
        return pltpu.make_async_copy(
            ring_ref.at[pl.ds(y, ph), pl.ds(x, pw * c)],
            stage.at[slot], sems.at[slot])

    for s in range(min(NSLOTS, nblk)):
        get_dma(s, s).start()

    def body(i, acc):
        slot = jax.lax.rem(i, NSLOTS)
        get_dma(i, slot).wait()
        # vector checksum (scalar VMEM reads do not lower on TPU)
        acc = acc + stage[slot, 0:1, 0:128].astype(jnp.float32)

        @pl.when(i + NSLOTS < nblk)
        def _():
            get_dma(i + NSLOTS, slot).start()

        return acc

    acc = jax.lax.fori_loop(0, nblk, body,
                            jnp.zeros((1, 128), jnp.float32))
    out_ref[:] = acc


def _big_kernel(starts_ref, ring_ref, out_ref, stage, sems, *, rows, c):
    dma = pltpu.make_async_copy(
        ring_ref.at[pl.ds(starts_ref[0], rows)], stage, sems)
    dma.start()
    dma.wait()
    out_ref[:] = stage[0:1, 0:128].astype(jnp.float32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--h", type=int, default=272)
    p.add_argument("--w", type=int, default=480)
    p.add_argument("--c", type=int, default=64)
    p.add_argument("--nblocks", type=int, default=68 * 120,
                   help="patch DMAs per call (one 272x480 frame = 8160)")
    p.add_argument("--modes", default="patch,row,big")
    p.add_argument("--reps", type=int, default="8")
    args = p.parse_args()

    from cdfo_tpu.utils import apply_platform_env, enable_compilation_cache
    apply_platform_env()
    enable_compilation_cache()

    h, w, c = args.h, args.w, args.c
    nblk = args.nblocks
    rng = np.random.RandomState(0)
    ring = jnp.asarray(rng.randn(h + 8, (w + 8) * c).astype(np.float32),
                       jnp.bfloat16)
    def mk_starts(pw):
        # tile-aligned starts: 8-row and 128-lane (= 2-pixel) multiples
        ys = (rng.randint(0, (h + 8 - 8) // 8, size=nblk) * 8).astype(np.int32)
        xmax = max(1, (w + 8 - pw) // 2)
        xs = (rng.randint(0, xmax, size=nblk) * 2 * c).astype(np.int32)
        return jnp.asarray(np.stack([ys, xs], 1).reshape(-1))

    def make(mode):
        if mode in ("patch", "row", "run16"):
            ph, pw = {"patch": (8, 6), "row": (8, 4),
                      "run16": (8, 66)}[mode]
            nb = nblk // 16 if mode == "run16" else nblk
            kern = functools.partial(_gather_kernel, nblk=nb, ph=ph,
                                     pw=pw, c=c, mode=mode)
            scratch = [pltpu.VMEM((NSLOTS, ph, pw * c), ring.dtype),
                       pltpu.SemaphoreType.DMA((NSLOTS,))]
            nbytes = nb * ph * pw * c * 2
        else:
            rows = min(h, max(1, nblk * 5 * 5 // (w + 8)))
            nb = 1
            kern = functools.partial(_big_kernel, rows=rows, c=c)
            scratch = [pltpu.VMEM((rows, (w + 8) * c), ring.dtype),
                       pltpu.SemaphoreType.DMA(())]
            nbytes = rows * (w + 8) * c * 2

        call = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=scratch),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )

        def chain(reps_dummy, s0):
            # data-link: fold the previous checksum into the (unused tail
            # of the) starts so XLA cannot hoist/dedupe the calls
            acc = jnp.float32(0)
            s = s0
            for _ in range(int(reps_dummy)):
                r = call(s, ring)[0, 0]
                acc = acc + r
                s = s.at[-1].add(jnp.int32(r) - jnp.int32(r))
            return acc, s

        return chain, nbytes, nb

    for mode in args.modes.split(","):
        starts = mk_starts({"patch": 6, "row": 4, "run16": 66}.get(mode, 6))
        chain, nbytes, nb = make(mode)
        times = {}
        for reps in (args.reps, 2 * args.reps):
            f = jax.jit(functools.partial(chain, reps))
            out, _ = f(starts)
            float(out)  # compile + warm
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                out, _ = f(starts)
                float(out)
                best = min(best, time.perf_counter() - t0)
            times[reps] = best
        dt = (times[2 * args.reps] - times[args.reps]) / args.reps
        if mode in ("patch", "row", "run16"):
            print(f"{mode}: {dt*1e3:.2f} ms/call  {dt/nb*1e9:.0f} ns/DMA  "
                  f"{nbytes/dt/1e9:.1f} GB/s  ({nb} DMAs, "
                  f"{nbytes//nb} B each)")
        else:
            print(f"{mode}: {dt*1e3:.2f} ms/call  {nbytes/dt/1e9:.1f} GB/s  "
                  f"({nbytes/1e6:.1f} MB contiguous)")


if __name__ == "__main__":
    main()
