"""Hardware validation for the gated round-3 features (tiled warp, fused
EGLA): run the full streaming engine ON THE REAL CHIP for one gate
configuration per process and dump the output frames, so a TPU-worker
crash in one configuration cannot take the whole A/B down (both prior
crash events happened mid-program; see ROUND3_NOTES).

Usage:
    python tools/validate_gates.py --tag shipped
    python tools/validate_gates.py --tag egla  --egla 1
    python tools/validate_gates.py --tag tiled --tiled 1
    python tools/validate_gates.py --compare shipped egla

Each run writes /tmp/gates_<tag>.npz (frames + fps). --compare loads two
dumps and checks bf16-reorder tolerance (interpret-mode tests already pin
fp32 exactness; this validates Mosaic compilation + execution on TPU).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_config(tag: str, egla: bool, tiled: int,
               t: int = 16) -> str:
    import jax

    cache = os.path.expanduser("~/.cache/jax_cdfo")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    os.environ["CDFO_TILED_WARP"] = str(int(tiled))  # 0 off, 1 guarded, 2 no-cond

    from cdfo_tpu.config import ModelConfig
    from cdfo_tpu.models import CVSRV8
    from cdfo_tpu.infer.engine import BatchedStreamingEngine
    from cdfo_tpu.infer.pipeline import synthetic_sequence

    h, w, k = 272, 480, 4
    data = synthetic_sequence(t=t, h=h, w=w, seed=0)

    dummy = np.zeros((1, 7, h, w, 1), np.float32)
    dummy_mv = np.zeros((1, 7, h, w, 2), np.float32)

    cfg = ModelConfig(mask_mode="expected",
                      compute_dtype=jax.numpy.bfloat16,
                      fused_trunk=True, fused_embed=True,
                      fused_align=True, fused_egla=egla)
    model = CVSRV8(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), dummy,
                                 dummy_mv, dummy_mv, dummy, dummy, dummy)
    eng = BatchedStreamingEngine(model, params, k=k)
    # warm-up compiles both graphs so the timed fps below is comparable
    # to bench.py (compile excluded); frames equality is unaffected
    warm = synthetic_sequence(t=2 * k, h=h, w=w, seed=1)
    eng.run_sequence(warm)
    t0 = time.time()
    frames, fps = eng.run_sequence(data, collect_timing=True)
    print(f"[{tag}] egla={egla} tiled={tiled} "
          f"fps={float(fps):.3f} "
          f"wall={time.time()-t0:.1f}s", flush=True)
    path = f"/tmp/gates_{tag}.npz"
    np.savez(path, frames=np.asarray(frames, np.float32), fps=float(fps))
    print(f"saved {path}")
    return path


def compare(tag_a: str, tag_b: str) -> int:
    a = np.load(f"/tmp/gates_{tag_a}.npz")
    b = np.load(f"/tmp/gates_{tag_b}.npz")
    fa, fb = a["frames"] / 255.0, b["frames"] / 255.0
    mad = float(np.abs(fa - fb).max())
    mean = float(np.abs(fa - fb).mean())
    print(f"{tag_a} (fps={float(a['fps']):.3f}) vs "
          f"{tag_b} (fps={float(b['fps']):.3f}): "
          f"max|diff|={mad:.6f} mean|diff|={mean:.8f} (frames in [0,1])")
    ok = mad < 0.02 and mean < 1e-3  # a couple of bf16 ulps at O(1)
    print("VALIDATION", "PASS" if ok else "FAIL")
    return 0 if ok else 1


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tag", default="shipped")
    p.add_argument("--egla", type=int, default=0)
    p.add_argument("--tiled", type=int, default=0)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--compare", nargs=2, default=None,
                   help="two tags to diff (no TPU run)")
    args = p.parse_args()
    if args.compare:
        return compare(*args.compare)
    run_config(args.tag, bool(args.egla), args.tiled,
               t=args.frames)
    return 0


if __name__ == "__main__":
    sys.exit(main())
