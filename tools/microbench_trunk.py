#!/usr/bin/env python
"""Micro-bench for the SCNet Block_ body pair — the per-frame hot spot
(VERDICT round 1: trunk = 172 ms of a 341 ms frame; C=64 conv lane ceiling).

Candidates, all computing  y = conv3x3_{256->64}( lrelu(conv3x3_{64->256}(x)) ):
  xla_nhwc    - plain lax.conv NHWC (status quo inside BlockS)
  xla_im2col  - explicit 9-tap patch concat (B,H,W,576) + one dot
  pallas      - fused dual-form kernel (see cdfo_tpu/ops/fused_block.py)

Run on the real TPU chip:  python tools/microbench_trunk.py
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


def timed(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    float(jnp.sum(out))  # force completion (axon block_until_ready no-ops)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters


def body_flops(b, h, w, cin=64, cmid=256):
    return 2 * b * h * w * 9 * (cin * cmid + cmid * cin)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--h", type=int, default=272)
    p.add_argument("--w", type=int, default=480)
    p.add_argument("--b", type=int, default=1)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--which", default="all")
    args = p.parse_args()

    dt = jnp.dtype(args.dtype)
    r = np.random.RandomState(0)
    b, h, w = args.b, args.h, args.w
    x = jnp.asarray(r.randn(b, h, w, 64), dt)
    w1 = jnp.asarray(r.randn(3, 3, 64, 256) * 0.05, dt)
    b1 = jnp.asarray(r.randn(256) * 0.05, dt)
    w2 = jnp.asarray(r.randn(3, 3, 256, 64) * 0.02, dt)
    b2 = jnp.asarray(r.randn(64) * 0.05, dt)
    fl = body_flops(b, h, w)

    results = {}

    @jax.jit
    def xla_nhwc(x):
        y = jax.lax.conv_general_dilated(
            x, w1, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b1
        y = jnp.where(y >= 0, y, 0.1 * y)
        y = jax.lax.conv_general_dilated(
            y, w2, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b2
        return x + y

    @jax.jit
    def xla_im2col(x):
        def conv(t, wk, cin, cout):
            tp = jnp.pad(t, ((0, 0), (1, 1), (1, 1), (0, 0)))
            cols = jnp.concatenate(
                [tp[:, dy:dy + h, dx:dx + w, :] for dy in range(3)
                 for dx in range(3)], axis=-1)
            return jnp.einsum("bhwk,ko->bhwo", cols,
                              wk.reshape(9 * cin, cout),
                              preferred_element_type=jnp.float32)
        y = conv(x, w1, 64, 256) + b1.astype(jnp.float32)
        y = jnp.where(y >= 0, y, 0.1 * y).astype(dt)
        y = conv(y, w2, 256, 64) + b2.astype(jnp.float32)
        return x + y.astype(dt)

    cands = {"xla_nhwc": (xla_nhwc, (x,)), "xla_im2col": (xla_im2col, (x,))}

    if args.which in ("all", "pallas"):
        from cdfo_tpu.ops.fused_block import fused_block_body

        @jax.jit
        def pallas(x):
            return fused_block_body(x, w1, b1, w2, b2)

        cands["pallas"] = (pallas, (x,))

    ref = None
    for name, (fn, a) in cands.items():
        if args.which not in ("all", name, "pallas" if name == "pallas" else args.which):
            pass
        try:
            t = timed(fn, *a)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}")
            continue
        out = np.asarray(fn(*a), np.float32)
        if ref is None:
            ref = out
            err = 0.0
        else:
            err = float(np.max(np.abs(out - ref)) / (np.abs(ref).max() + 1e-6))
        results[name] = t
        print(f"{name:12s} {t*1e3:8.2f} ms   {fl/t/1e12:6.1f} TF/s   relerr {err:.2e}")


if __name__ == "__main__":
    main()
