"""Hardware validation for the round-3 gated features (tiled warp +
fused EGLA): run the full streaming engine in-program on the real chip
with both gates ON and compare against the shipped configuration.

Both engines run in ONE process at the exact headline geometry
(272x480 -> 1080p, bf16, k=4, mask_mode='expected'); the persistent
compile cache is enabled so the follow-up `bench.py` runs are warm.

Pass criterion: the gated path completes end-to-end and matches the
shipped path within bf16 reorder tolerance (the interpret-mode tests
in tests/test_fused_egla.py / test_warp_ring.py already pin exactness
in fp32; this run validates Mosaic compilation + execution on TPU).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    cache = os.path.expanduser("~/.cache/jax_cdfo")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from cdfo_tpu.config import ModelConfig
    from cdfo_tpu.models import CVSRV8
    from cdfo_tpu.infer.engine import BatchedStreamingEngine
    from cdfo_tpu.infer.pipeline import synthetic_sequence

    h, w, t, k = 272, 480, 16, 4
    data = synthetic_sequence(t=t, h=h, w=w, seed=0)

    dummy = np.zeros((1, 7, h, w, 1), np.float32)
    dummy_mv = np.zeros((1, 7, h, w, 2), np.float32)

    outs = {}
    for tag, egla, tiled in (("shipped", False, False),
                             ("gated", True, True)):
        os.environ["CDFO_TILED_WARP"] = "1" if tiled else "0"
        cfg = ModelConfig(mask_mode="expected",
                          compute_dtype=jax.numpy.bfloat16,
                          fused_trunk=True, fused_embed=True,
                          fused_align=True, fused_egla=egla)
        model = CVSRV8(cfg)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), dummy,
                                     dummy_mv, dummy_mv, dummy, dummy,
                                     dummy)
        eng = BatchedStreamingEngine(model, params, k=k)
        t0 = time.time()
        frames, fps = eng.run_sequence(data, collect_timing=True)
        print(f"[{tag}] egla={egla} tiled={tiled} "
              f"fps={float(fps):.3f} wall={time.time()-t0:.1f}s",
              flush=True)
        outs[tag] = np.asarray(frames, np.float32)

    a, b = outs["shipped"], outs["gated"]
    mad = float(np.abs(a - b).max())
    mean = float(np.abs(a - b).mean())
    print(f"max|diff|={mad:.6f}  mean|diff|={mean:.8f} (frames in [0,1])")
    # bf16 op-reorder tolerance: a couple of bf16 ulps at O(1) magnitude
    ok = mad < 0.02 and mean < 1e-3
    print("VALIDATION", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
