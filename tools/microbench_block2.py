#!/usr/bin/env python
"""Micro-bench for the FULL fused Block_ kernel (`ops/fused_block2.py`)
at the headline geometry — for A/B-ing kernel scheduling experiments
(M-stacking, fold-up, row-block size) without running the whole engine.

Block_ exact FLOPs (after the down.conv2 fold, cin=64, cmid=256):
conv1@1x 38.5 + conv2@1x 38.5 + conv1@2x 154 + folded 68.5 + 0.5x 19.3
+ 1x1s ~4  ->  ~323 GFLOP/frame at 272x480.

Run on the real chip:  python tools/microbench_block2.py [--b 4] [--rows 16]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--h", type=int, default=272)
    p.add_argument("--w", type=int, default=480)
    p.add_argument("--b", type=int, default=4)
    p.add_argument("--rows", type=int, default=16)
    p.add_argument("--wt", type=int, default=512)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--int8", action="store_true",
                   help="use the int8-turbo kernel (fused_block2_q)")
    args = p.parse_args()

    from cdfo_tpu.utils import apply_platform_env, enable_compilation_cache
    apply_platform_env()
    enable_compilation_cache()

    from cdfo_tpu.ops.fused_block2 import fused_scale_block

    dt = jnp.dtype(args.dtype)
    r = np.random.RandomState(0)
    b, h, w = args.b, args.h, args.w
    x = jnp.asarray(r.randn(b, h, w, 64), dt)
    w1 = jnp.asarray(r.randn(3, 3, 64, 256) * 0.05, dt)
    b1 = jnp.asarray(r.randn(256) * 0.05, dt)
    w2 = jnp.asarray(r.randn(3, 3, 256, 64) * 0.02, dt)
    b2 = jnp.asarray(r.randn(64) * 0.05, dt)
    kd = jnp.asarray(r.randn(1, 1, 64, 64) * 0.1, dt)
    bd = jnp.asarray(r.randn(64) * 0.05, dt)
    ku = jnp.asarray(r.randn(1, 1, 64, 64) * 0.1, dt)
    bu = jnp.asarray(r.randn(64) * 0.05, dt)

    if args.int8:
        from cdfo_tpu.ops.fused_block2_q import fused_scale_block_q

        @jax.jit
        def run(x):
            return fused_scale_block_q(x, w1, b1, w2, b2, kd, bd, ku, bu,
                                       rows=args.rows, wt=args.wt)
    else:
        @jax.jit
        def run(x):
            return fused_scale_block(x, w1, b1, w2, b2, kd, bd, ku, bu,
                                     rows=args.rows, wt=args.wt)

    # FLOP count per frame (exact-path accounting, see module docstring)
    px = h * w
    gf = (2 * 256 * 576 * px            # conv1 1x
          + 2 * 64 * 9 * 256 * px       # conv2 1x
          + 4 * 2 * 256 * 576 * px      # conv1 2x
          + 2 * 64 * 16 * 256 * px      # folded down.conv2
          + (2 * 256 * 576 + 2 * 64 * 9 * 256) * px // 4   # 0.5x branch
          + 3 * 2 * 64 * 64 * px) / 1e9  # 1x1s (approx)

    t0 = time.perf_counter()
    out = run(x)
    float(jnp.sum(out.astype(jnp.float32)))
    print(f"first call (compile): {time.perf_counter() - t0:.1f} s")
    for _ in range(2):
        out = run(x)
    float(jnp.sum(out.astype(jnp.float32)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = run(out[..., :64])
        float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / args.iters)
    tfs = gf * b / best / 1e3
    print(f"rows={args.rows} wt={args.wt} b={b} int8={args.int8}: {best*1e3:.2f} ms/call "
          f"({best*1e3/b:.2f} ms/frame)  {tfs:.1f} TF/s "
          f"({tfs/197*100:.0f}% MFU)")


if __name__ == "__main__":
    main()
