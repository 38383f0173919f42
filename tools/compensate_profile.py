"""Sub-stage cost breakdown of the per-frame compensation path at the
headline geometry: embed (conv_first/second + 3-round GCPI), EGLA,
the expand projections, and the quad-pack.

Each sub-stage is timed as a CH-long data-dependent chain inside ONE jit
(see BENCH_NOTES: chained measurements must be data-linked through a
scalar tap or XLA dead-code-eliminates / loop-hoists them), scalar
readback as the sync.

Usage: python tools/compensate_profile.py [k]
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from cdfo_tpu.utils import apply_platform_env, enable_compilation_cache
apply_platform_env()
enable_compilation_cache()

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
    pos = [a for a in sys.argv[1:] if not a.startswith("-")]
    k = int(pos[0]) if pos else 4
    H, W, nf = 272, 480, 64
    cfg = ModelConfig(mask_mode="expected", compute_dtype=jnp.bfloat16,
                      fused_trunk=True,
                      fused_embed="--fused-embed" in sys.argv,
                      fused_egla="--fused-egla" in sys.argv)
    model = CVSRV8(cfg)
    rng = np.random.RandomState(0)

    def t(*shape):
        return jnp.asarray(rng.rand(*shape).astype(np.float32))

    lrs, pms, rms, ufs = (t(k, H, W, 1) for _ in range(4))
    fea = t(k, H, W, nf)
    small = jnp.zeros((1, 7, 16, 16, 1))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), small, jnp.zeros((1, 7, 16, 16, 2)),
        jnp.zeros((1, 7, 16, 16, 2)), small, small, small)
    params = jax.device_put(params)

    CH = 4
    dt = cfg.compute_dtype

    def chain(body, x0, *rest):
        out = jnp.float32(0)
        for _ in range(CH):
            o = body(x0 + out.astype(x0.dtype) * 1e-20, *rest)
            out = jnp.sum(o).astype(jnp.float32)
        return out

    # -- embed: conv_first/second + 3-round GCPI transformer --------------
    @jax.jit
    def embed(p, lrs, pms):
        return chain(lambda a, b: model.apply(p, a, b, method="embed"),
                     lrs.astype(dt), pms.astype(dt))

    # -- EGLA alone (rdab) -------------------------------------------------
    @jax.jit
    def egla(p, res, x):
        return chain(
            lambda a, b: model.apply(
                p, a, b, method=lambda m, r, v: m.rdab(r, v)),
            t(k, H, W, nf).astype(dt), x.astype(dt))

    # -- compensate minus embed: rms expand + EGLA + fea_r projection -----
    @jax.jit
    def comp_tail(p, fea, rms):
        return chain(
            lambda a, b: model.apply(
                p, a, b, method=lambda m, f, r: m._compensate(f, r)),
            fea.astype(dt), rms.astype(dt))

    # -- quad-pack + ufs expand -------------------------------------------
    from cdfo_tpu.ops.warp import quad_pack

    @jax.jit
    def pack_ufs(p, fea, ufs):
        out = jnp.float32(0)
        for _ in range(CH):
            qp = quad_pack(fea.astype(dt) + out.astype(dt) * 1e-20)
            up = model.apply(p, ufs.astype(dt),
                             method=lambda m, u: m.conv_expand_ufs(u))
            out = (jnp.sum(qp) + jnp.sum(up)).astype(jnp.float32)
        return out

    # -- whole compensate_frames ------------------------------------------
    @jax.jit
    def comp(p, lrs, pms, rms, ufs):
        out = jnp.float32(0)
        for _ in range(CH):
            l1, fi, uf = model.apply(p, lrs + out * 1e-20, pms, rms, ufs,
                                     method="compensate_frames")
            out = jnp.sum(fi).astype(jnp.float32)
        return out

    print(f"k={k}  (ms per k-frame call / per frame)", flush=True)
    for name, fn, args in [
        ("embed", embed, (params, lrs, pms)),
        ("egla", egla, (params, rms, fea)),
        ("comp_tail", comp_tail, (params, fea, rms)),
        ("pack+ufs", pack_ufs, (params, fea, ufs)),
        ("FULL comp", comp, (params, lrs, pms, rms, ufs)),
    ]:
        t0 = time.perf_counter()
        v = timeit(fn, *args) / CH
        print(f"  {name:10s} {v * 1e3:8.1f}  {v * 1e3 / k:6.1f}"
              f"   (wall {time.perf_counter() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
