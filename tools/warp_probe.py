"""Warp-gather cost probe: is the quad gather's (B, H, W, 4C) output
materialised by XLA, or fused into the bilinear blend?

The ring quad gather reads ~512 B of taps per output pixel (3.13M pixels
per k=4 step at the headline geometry -> ~1.6 GB/step, the HBM floor).
If XLA materialises the gathered quad before the blend, the pass costs an
extra 1.6 GB write + 1.6 GB read. This probe chain-times:

  ring       — the shipped flow_warp_ring (take + split bilerp)
  ring_fma   — same take, blend written as one (N, 4, C) weighted sum
               (fusion-friendlier form: no jnp.split)
  take_only  — the gather alone (floor: is the blend free?)
  blend_only — the blend on a pre-materialised quad (the cost the
               non-fused form adds)

Each variant runs as a CH-long data-linked chain in one jit (BENCH_NOTES
measurement traps: the flow input is tapped so nothing hoists; scalar
readback as sync; ~38 ms/call readback floor — compare (call-38)/CH).

Usage: python tools/warp_probe.py [k]
"""
import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

_cache = os.path.expanduser("~/.cache/jax_cdfo")
os.makedirs(_cache, exist_ok=True)
try:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass

from cdfo_tpu.ops.warp import (QUAD_PAD, _quad_bilerp, _quad_coords,
                               flow_warp_ring, quad_pack)


def timeit(f, *args, n_warm=1, n_rep=3):
    for _ in range(n_warm):
        out = f(*args)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    best = 1e9
    for _ in range(n_rep):
        t0 = time.perf_counter()
        out = f(*args)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best


def ring_fma(quad_ring, frame_idx, flow):
    """flow_warp_ring semantics with the blend as one weighted sum."""
    l, hp, wp, c4 = quad_ring.shape
    qp = QUAD_PAD
    h, w = hp - 2 * qp, wp - 2 * qp
    b = flow.shape[0]
    c = c4 // 4
    x0i, y0i, wx1, wy1 = _quad_coords(flow, h, w)
    flat = quad_ring.reshape(l * hp * wp, c4)
    fr = frame_idx.reshape(b, 1, 1)
    py = jnp.clip(y0i + qp, 0, hp - 1)
    px = jnp.clip(x0i + qp, 0, wp - 1)
    idx = fr * (hp * wp) + py * wp + px
    q = jnp.take(flat, idx.reshape(-1), axis=0).reshape(b, h, w, 4, c)
    keep = (((y0i >= -1) & (y0i <= h - 1) & (x0i >= -1) & (x0i <= w - 1))
            .astype(wx1.dtype))
    w4 = jnp.stack([(1 - wy1) * (1 - wx1), (1 - wy1) * wx1,
                    wy1 * (1 - wx1), wy1 * wx1], axis=-1) * keep[..., None]
    out = jnp.sum(q.astype(wx1.dtype) * w4[..., None], axis=3)
    return out.astype(quad_ring.dtype)


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    H, W, nf, nbr = 272, 480, 64, 6
    L = 12
    CH = 4
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16

    # build the big operands ON DEVICE — uploading them through the
    # ~45 MB/s tunnel dominates the probe (q_mat alone is 3.2 GB as fp32)
    print("building device operands ...", flush=True)
    t0 = time.perf_counter()

    @jax.jit
    def _mk_ring(key):
        x = jax.random.uniform(key, (L, H, W, nf), jnp.float32)
        return quad_pack(x).astype(dt)

    ring = _mk_ring(jax.random.PRNGKey(0))
    float(jnp.sum(ring[0, 0, 0].astype(jnp.float32)))
    print(f"ring ready in {time.perf_counter() - t0:.1f}s", flush=True)
    # 4x4-blockwise flows like the coding priors, moderate range
    blk = rng.randn(k * nbr, H // 4, W // 4, 2).astype(np.float32) * 8
    flow = jnp.asarray(np.repeat(np.repeat(blk, 4, axis=1), 4, axis=2))
    fidx = jnp.asarray(rng.randint(0, L, size=(k * nbr,)).astype(np.int32))

    hp, wp = H + 2 * QUAD_PAD, W + 2 * QUAD_PAD

    def chain(body):
        # ring/fidx ride as ARGUMENTS: a closed-over device array becomes
        # a jit constant serialised into the axon remote-compile request
        # (168 MB ring -> HTTP 413)
        def f(ring, fidx, flow):
            out = jnp.float32(0)
            for _ in range(CH):
                o = body(ring, fidx,
                         flow + out.astype(flow.dtype) * 1e-20)
                out = jnp.sum(o.astype(jnp.float32))
            return out
        return jax.jit(f)

    ring_v = chain(flow_warp_ring)
    fma_v = chain(ring_fma)

    def take_only(ring, fidx, fl):
        x0i, y0i, _, _ = _quad_coords(fl, H, W)
        flat = ring.reshape(L * hp * wp, 4 * nf)
        fr = fidx.reshape(k * nbr, 1, 1)
        py = jnp.clip(y0i + QUAD_PAD, 0, hp - 1)
        px = jnp.clip(x0i + QUAD_PAD, 0, wp - 1)
        idx = fr * (hp * wp) + py * wp + px
        return jnp.take(flat, idx.reshape(-1), axis=0)

    take_v = chain(take_only)

    q_mat = jax.jit(lambda key: jax.random.uniform(
        key, (k * nbr, H, W, 4 * nf), jnp.float32).astype(dt)
    )(jax.random.PRNGKey(1))
    float(jnp.sum(q_mat[0, 0, 0].astype(jnp.float32)))
    print("q_mat ready", flush=True)

    def blend_only(q, _fidx, fl):
        x0i, y0i, wx1, wy1 = _quad_coords(fl, H, W)
        return _quad_bilerp(q.reshape(k * nbr, H, W, 4 * nf),
                            x0i, y0i, wx1, wy1, H, W)

    blend_v = chain(blend_only)

    # numerical identity check first (one jit, not eager: each eager op is
    # a separate tunnel roundtrip)
    print("compiling identity check ...", flush=True)

    @jax.jit
    def _diff(ring, fidx, flow):
        a = flow_warp_ring(ring, fidx, flow)
        bq = ring_fma(ring, fidx, flow)
        return jnp.max(jnp.abs(a.astype(jnp.float32)
                               - bq.astype(jnp.float32)))

    print(f"ring vs ring_fma max|diff| = {float(_diff(ring, fidx, flow)):.3e}",
          flush=True)

    print(f"k={k} ({k * nbr} images/step, CH={CH}; ms/call and "
          f"(call-38)/CH ms/step)")
    for name, f, a0 in [("ring", ring_v, ring), ("ring_fma", fma_v, ring),
                        ("take_only", take_v, ring),
                        ("blend_only", blend_v, q_mat)]:
        print(f"  {name} ...", flush=True)
        t = timeit(f, a0, fidx, flow) * 1e3
        print(f"  {name:10s} {t:8.1f}   {(t - 38) / CH:7.1f}", flush=True)


if __name__ == "__main__":
    main()
