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

  mode=patch : N independent (5, 5*C)-shaped strided copies (the
               block-gather unit) from pseudo-random ring offsets
  mode=run16 : N/16 copies of (5, 65*C) — a merged run of 16 blocks
               sharing one integer motion vector (HEVC uniform regions)
  mode=row   : N contiguous (1, 4*C) row segments (the 2 KB unit)
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
        y = starts_ref[2 * i]
        x = starts_ref[2 * i + 1]
        return pltpu.make_async_copy(
            ring_ref.at[pl.ds(y, ph), pl.ds(x, pw * c)],
            stage.at[slot], sems.at[slot])

    for s in range(min(NSLOTS, nblk)):
        get_dma(s, s).start()

    def body(i, acc):
        slot = jax.lax.rem(i, NSLOTS)
        get_dma(i, slot).wait()
        acc = acc + stage[slot, 0, 0]

        @pl.when(i + NSLOTS < nblk)
        def _():
            get_dma(i + NSLOTS, slot).start()

        return acc

    acc = jax.lax.fori_loop(0, nblk, body, jnp.float32(0))
    out_ref[0, 0] = acc


def _big_kernel(starts_ref, ring_ref, out_ref, stage, sems, *, rows, c):
    dma = pltpu.make_async_copy(
        ring_ref.at[pl.ds(starts_ref[0], rows)], stage, sems)
    dma.start()
    dma.wait()
    out_ref[0, 0] = stage[0, 0]


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
        ys = rng.randint(0, h + 8 - 5, size=nblk).astype(np.int32)
        xmax = max(1, (w + 8 - pw))
        xs = (rng.randint(0, xmax // 4, size=nblk) * 4 * c).astype(np.int32)
        return jnp.asarray(np.stack([ys, xs], 1).reshape(-1))

    def make(mode):
        if mode in ("patch", "row", "run16"):
            ph, pw = {"patch": (5, 5), "row": (1, 4),
                      "run16": (5, 65)}[mode]
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
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
                scratch_shapes=scratch),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )

        @jax.jit
        def chain(reps_dummy, s0):
            # data-link: fold the previous checksum into the (unused tail
            # of the) starts so XLA cannot hoist/dedupe the calls
            acc = jnp.float32(0)
            s = s0
            for _ in range(int(reps_dummy)):
                r = call(s, ring)[0, 0]
                acc = acc + r
                s = s.at[-1].add(jnp.int32(r) & 0)
            return acc, s

        return chain, nbytes, nb

    for mode in args.modes.split(","):
        starts = mk_starts({"patch": 5, "row": 4, "run16": 65}.get(mode, 5))
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
