"""Per-stage cost breakdown of the streaming forward at the headline
geometry (Kimono1-class: 480x272 LR -> 1920x1080 SR, k frames per step).

Each stage is timed as an n-long chain inside ONE jit (the axon tunnel
adds ~1 ms of fixed dispatch per jit call — BENCH_NOTES), with a scalar
readback as the sync (block_until_ready is a no-op on axon).

Usage: python tools/stage_profile.py [k]
"""
import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache (same as bench.py): the per-stage jits cost
# minutes of Mosaic/XLA compile cold; cached reruns skip them entirely
_cache = os.path.expanduser("~/.cache/jax_cdfo")
os.makedirs(_cache, exist_ok=True)
try:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass

from cdfo_tpu.config import ModelConfig
from cdfo_tpu.models.cvsr import CVSRV8


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


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    H, W, nf, nbr = 272, 480, 64, 6
    fused = "--fused" in sys.argv
    cfg = ModelConfig(mask_mode="expected", compute_dtype=jnp.bfloat16,
                      fused_trunk=True, fused_embed=fused,
                      fused_align=fused, fused_egla=fused)
    model = CVSRV8(cfg)
    rng = np.random.RandomState(0)

    def t(*shape):
        return jnp.asarray(rng.rand(*shape).astype(np.float32))

    lrs, pms, rms, ufs = (t(k, H, W, 1) for _ in range(4))
    small = jnp.zeros((1, 7, 16, 16, 1))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), small, jnp.zeros((1, 7, 16, 16, 2)),
        jnp.zeros((1, 7, 16, 16, 2)), small, small, small)
    params = jax.device_put(params)

    CH = 4  # chain length per stage

    # --- stage 1: per-frame compensation (embed + EGLA + projections) ----
    @jax.jit
    def comp(p, lrs, pms, rms, ufs):
        out = jnp.float32(0)
        for i in range(CH):
            # chain through a scalar so XLA cannot dead-code-eliminate
            l1, fi, uf = model.apply(p, lrs + out * 1e-20,
                                     pms + out * 1e-20, rms + out * 1e-20,
                                     ufs + out * 1e-20,
                                     method="compensate_frames")
            out = jnp.sum(fi).astype(jnp.float32)
        return out

    dt_comp = timeit(comp, params, lrs, pms, rms, ufs) / CH

    # --- stage 2: alignment (warp + dual-MSA, k*6 neighbours) ------------
    cl1 = t(k, H, W, nf)
    nfi = t(k, nbr, H, W, nf)
    nuf = t(k, nbr, H, W, nf)
    nmv = jnp.asarray(rng.randn(k, nbr, H, W, 2).astype(np.float32))

    # EVERY input must be data-linked to the chain tap: XLA loop-hoists
    # any subgraph that depends only on un-tapped inputs (the warp was
    # silently hoisted out of this chain for a whole round, reading 4x
    # too cheap — ROUND3_NOTES measurement traps).
    if fused:
        from cdfo_tpu.ops.warp import flow_warp

        @jax.jit
        def align(p, cl1, nfi, nuf, nmv):
            dt = cfg.compute_dtype
            out = jnp.float32(0)
            for i in range(CH):
                tap = out.astype(dt) * 1e-20
                c = cl1.astype(dt) + tap
                chcw = jnp.transpose(c, (0, 1, 3, 2))
                warped = flow_warp(
                    nfi.astype(dt).reshape(k * nbr, H, W, nf) + tap,
                    nmv.astype(dt).reshape(k * nbr, H, W, 2) + tap)
                a = model.apply(
                    p, None, None,
                    nuf.astype(dt).reshape(k * nbr, H, W, nf) + tap,
                    None, warped, chcw, c,
                    method=lambda m, *ar: m.mv_deform_align(*ar))
                out = jnp.sum(a).astype(jnp.float32)
            return out
    else:
        @jax.jit
        def align(p, cl1, nfi, nuf, nmv):
            dt = cfg.compute_dtype
            out = jnp.float32(0)
            for i in range(CH):
                tap = out.astype(dt) * 1e-20
                center_rep = jnp.broadcast_to(
                    cl1.astype(dt)[:, None] + tap,
                    (k, nbr, H, W, nf)).reshape(k * nbr, H, W, nf)
                a = model.apply(
                    p, center_rep,
                    nfi.astype(dt).reshape(k * nbr, H, W, nf) + tap,
                    nuf.astype(dt).reshape(k * nbr, H, W, nf) + tap,
                    nmv.astype(dt).reshape(k * nbr, H, W, 2) + tap,
                    method=lambda m, *a: m.mv_deform_align(*a))
                out = jnp.sum(a).astype(jnp.float32)
            return out

    dt_align = timeit(align, params, cl1, nfi, nuf, nmv) / CH

    # --- stage 3: trunk ---------------------------------------------------
    fused = t(k, H, W, nf)

    @jax.jit
    def trunk(p, x):
        dt = cfg.compute_dtype
        out = x.astype(dt)
        for i in range(CH):
            out = model.apply(p, out, method=lambda m, v: m.recon_trunk(v))
        return out

    dt_trunk = timeit(trunk, params, fused) / CH

    # --- stage 4: upsample head (upconv1/2 + conv_last + base) -----------
    @jax.jit
    def head(p, x, lr):
        dt = cfg.compute_dtype
        out = jnp.float32(0)
        for i in range(CH):
            hcw = jnp.transpose(x.astype(dt) + out.astype(dt) * 1e-20,
                                (0, 1, 3, 2))
            o = model.apply(p, hcw, lr,
                            method=lambda m, v, c: m.head_from_trunk(v, c))
            out = jnp.sum(o).astype(jnp.float32)
        return out

    dt_head = timeit(head, params, fused, lrs) / CH

    # --- whole per-center stage (align + fuse + trunk + head) ------------
    from cdfo_tpu.ops.warp import quad_pack

    qring = quad_pack(t(k + nbr, H, W, nf).astype(cfg.compute_dtype))
    nidx = jnp.asarray(
        np.stack([np.arange(nbr)] * k).astype(np.int32))

    @jax.jit
    def arec(p, cl1, qring, nuf, nmv, lr):
        out = jnp.float32(0)
        for i in range(CH):
            o = model.apply(p, cl1 + out * 1e-20, lr,
                            qring + out.astype(qring.dtype) * 1e-20,
                            nuf + out * 1e-20, nmv + out * 1e-20, nidx,
                            method="align_reconstruct")
            out = jnp.sum(o).astype(jnp.float32)
        return out

    dt_arec = timeit(arec, params, cl1, qring, nuf, nmv, lrs) / CH

    tot = dt_comp + dt_align + dt_trunk + dt_head
    print(f"k={k}  (ms per k-frame step / per frame)")
    for name, v in [("compensate", dt_comp), ("alignment", dt_align),
                    ("trunk", dt_trunk), ("head", dt_head),
                    ("align_rec", dt_arec),
                    ("TOTAL", tot)]:
        print(f"  {name:11s} {v * 1e3:8.1f}  {v * 1e3 / k:6.1f}")
    print(f"  implied fps: {k / tot:.2f}")


if __name__ == "__main__":
    main()
