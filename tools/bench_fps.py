#!/usr/bin/env python
"""Multi-sequence FPS harness — `test_LD_22_FPS.py` semantics: per-sequence
frames / sum(forward-only time) with frame 0 included (`:185-192`),
streaming cache, three geometry classes (PeopleOnStreet 640x400 ->
2560x1600, Johnny 320x184 -> 1280x720, Kimono1 480x272 -> 1920x1080).

With --data-root, runs real sequences; otherwise synthetic data at the same
geometries (compute-identical; the reference excludes I/O from the timer
anyway — `test_LD_22_FPS.py:183-189`).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

GEOMETRIES = {
    "PeopleOnStreet_640x400": (400, 640),
    "Johnny_320x184": (184, 320),
    "Kimono1_480x272": (272, 480),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", default=32, type=int)
    p.add_argument("--k", default=4, type=int, help="centers per dispatch")
    p.add_argument("--data-root", default="")
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--fp32", dest="bf16", action="store_false")
    p.add_argument("--no-fused-trunk", dest="fused", action="store_false",
                   default=True)
    p.add_argument("--int8", action="store_true",
                   help="int8-turbo trunk (the bench.py headline config)")
    p.add_argument("--model", default="cvsr_v8",
                   choices=["cvsr_v8", "cvsr_v7"],
                   help="cvsr_v7 uses the plain streaming Inferencer "
                        "(XLA path; the DCN-era model has no fused-"
                        "kernel engine)")
    args = p.parse_args()
    from cdfo_tpu.utils import apply_platform_env, enable_compilation_cache
    apply_platform_env()
    enable_compilation_cache()

    import jax
    from cdfo_tpu.config import ModelConfig
    from cdfo_tpu.models import CVSRV8
    from cdfo_tpu.infer.engine import BatchedStreamingEngine
    from cdfo_tpu.infer.pipeline import synthetic_sequence

    dt = jax.numpy.bfloat16 if args.bf16 else jax.numpy.float32
    if args.model == "cvsr_v7":
        from cdfo_tpu.infer.pipeline import Inferencer
        from cdfo_tpu.models.cvsr_variants import CVSRV7

        model = CVSRV7(ModelConfig(name="cvsr_v7", mask_mode="expected",
                                   compute_dtype=dt))
    else:
        # same kernel set as the headline bench.py
        model = CVSRV8(ModelConfig(mask_mode="expected", compute_dtype=dt,
                                   fused_trunk=args.fused,
                                   fused_embed=args.fused,
                                   fused_align=args.fused,
                                   fused_egla=args.fused,
                                   trunk_int8=args.int8))

    results = {}
    for name, (h, w) in GEOMETRIES.items():
        data = synthetic_sequence(t=args.frames, h=h, w=w, seed=0)
        dummy = np.zeros((1, 7, h, w, 1), np.float32)
        dmv = np.zeros((1, 7, h, w, 2), np.float32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), dummy, dmv, dmv,
                                     dummy, dummy, dummy)
        if args.model == "cvsr_v7":
            eng = Inferencer(model, params)
        else:
            eng = BatchedStreamingEngine(model, params, k=args.k)
        eng.run_sequence(synthetic_sequence(t=2 * args.k, h=h, w=w, seed=1))
        _, fps = eng.run_sequence(data, collect_timing=True)
        results[name] = round(float(fps), 3)
        print(f"{name}: {fps:.3f} fps")
    print(json.dumps({"metric": "fps_by_sequence", "value": results,
                      "model": args.model, "int8": bool(args.int8)}))


if __name__ == "__main__":
    main()
