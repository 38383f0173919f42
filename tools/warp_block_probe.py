#!/usr/bin/env python
"""A/B the Pallas block-gather warp (`ops/warp_block.py`) against the
shipped XLA quad-ring gather at the headline geometry (k=4 centers x 6
neighbours = 24 warped images, 272x480, nf=64, 4x4-blockwise flows).

Chain discipline as tools/warp_probe.py: CH chained applications with
data-linked inputs, one readback; reported as (call - 38 ms floor)/CH.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ch", type=int, default=8)
    p.add_argument("--h", type=int, default=272)
    p.add_argument("--w", type=int, default=480)
    p.add_argument("--c", type=int, default=64)
    p.add_argument("--b", type=int, default=24)
    p.add_argument("--l", type=int, default=8)
    args = p.parse_args()

    from cdfo_tpu.utils import apply_platform_env, enable_compilation_cache
    apply_platform_env()
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    from cdfo_tpu.ops.warp import quad_pack, flow_warp_ring
    from cdfo_tpu.ops.warp_block import pad_ring_frame, flow_warp_ring_block

    h, w, c, b, l = args.h, args.w, args.c, args.b, args.l
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.rand(l, h, w, c).astype(np.float32),
                         jnp.bfloat16)
    blk = (rng.randn(b, h // 4, w // 4, 2) * 6.0).astype(np.float32)
    flow = jnp.asarray(np.repeat(np.repeat(blk, 4, 1), 4, 2))
    fidx = jnp.asarray(rng.randint(0, l, size=b).astype(np.int32))

    quad = quad_pack(frames)
    ringb = pad_ring_frame(frames)

    def chain(fn, ring0):
        def run(ring, flow):
            out = None
            f = flow
            for _ in range(args.ch):
                out = fn(ring, fidx, f)
                # data link: next flow depends on the output
                f = f + 0.0 * out[..., :1].mean() * jnp.ones_like(f)
            return out

        jfn = jax.jit(run)
        t0 = time.perf_counter()
        o = jfn(ring0, flow)
        float(jnp.sum(o.astype(jnp.float32)))
        print(f"  compile+first: {time.perf_counter() - t0:.1f} s")
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            o = jfn(ring0, flow)
            float(jnp.sum(o.astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        return (best * 1e3 - 38.0) / args.ch

    print("quad ring (shipped XLA gather):")
    tq = chain(flow_warp_ring, quad)
    print(f"  {tq:.2f} ms/step ({tq / (b / 6):.2f} ms/frame at k={b // 6})")
    print("block-gather kernel:")
    tb = chain(flow_warp_ring_block, ringb)
    print(f"  {tb:.2f} ms/step ({tb / (b / 6):.2f} ms/frame)")
    # numerics cross-check on-chip
    o1 = np.asarray(flow_warp_ring(quad, fidx, flow).astype(jnp.float32))
    o2 = np.asarray(flow_warp_ring_block(ringb, fidx, flow)
                    .astype(jnp.float32))
    d = np.abs(o1 - o2).max()
    print(f"max |quad - block| on-chip: {d}")


if __name__ == "__main__":
    main()
