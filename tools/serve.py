#!/usr/bin/env python
"""Sharded streaming-serving demo/benchmark.

Runs the streaming engine over ALL available devices with the k output
frames of each step sharded over a 'data' mesh axis
(`cdfo_tpu/parallel/serving.py`) — the production deployment shape for
>30 fps 1080p x4 serving on a TPU pod slice. On a single-device host it
falls back to the plain engine; with --cpu-mesh N it demonstrates the
sharded path on a virtual CPU mesh (correctness, not speed).

Examples:
  python tools/serve.py --frames 64                 # real devices
  python tools/serve.py --cpu-mesh 4 --frames 16    # virtual 4-dev mesh
  python tools/serve.py --ckpt <orbax dir> --lr-dir <pngs> ...
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", default=32, type=int)
    p.add_argument("--height", default=272, type=int)
    p.add_argument("--width", default=480, type=int)
    p.add_argument("--k-per-device", default=4, type=int)
    p.add_argument("--cpu-mesh", default=0, type=int,
                   help="force an N-device virtual CPU mesh")
    p.add_argument("--ckpt", default="", help="orbax checkpoint dir")
    p.add_argument("--lr-dir", default="",
                   help="serve a real sequence: LR PNG dir (with "
                        "--side-dir), JCT-VC grammar as tools/test_sr.py")
    p.add_argument("--side-dir", default="")
    p.add_argument("--save-dir", default="",
                   help="write SR PNGs here (with --lr-dir)")
    p.add_argument("--fp32", dest="bf16", action="store_false", default=True)
    args = p.parse_args()
    if args.lr_dir and not args.side_dir:
        p.error("--lr-dir requires --side-dir (the coding-priors tree; "
                "JCT-VC grammar as tools/test_sr.py)")

    # env mutations MUST precede any jax import (tests/conftest.py:3 —
    # XLA flags are read at backend init): set the virtual-mesh flags
    # first, then let apply_platform_env() re-assert JAX_PLATFORMS
    # through jax.config for the deployment whose sitecustomize ignores
    # the env var.
    if args.cpu_mesh:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu_mesh}"
        ).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"

    from cdfo_tpu.utils import apply_platform_env, enable_compilation_cache
    apply_platform_env()
    enable_compilation_cache()

    import jax
    from cdfo_tpu.config import ModelConfig
    from cdfo_tpu.infer.engine import BatchedStreamingEngine
    from cdfo_tpu.infer.pipeline import synthetic_sequence
    from cdfo_tpu.models import CVSRV8
    from cdfo_tpu.parallel.mesh import make_mesh
    from cdfo_tpu.parallel.serving import ShardedServingEngine

    devs = jax.devices()
    dt = jax.numpy.bfloat16 if args.bf16 else jax.numpy.float32
    fused = jax.default_backend() == "tpu"
    # real checkpoints need the full-depth trunk; the synthetic demo on
    # CPU keeps the 1-group trunk for compile speed
    full_depth = fused or bool(args.ckpt) or bool(args.lr_dir)
    cfg = ModelConfig(mask_mode="expected", compute_dtype=dt,
                      fused_trunk=fused, fused_embed=fused,
                      fused_align=fused,
                      scn_groups=7 if full_depth else 1)
    model = CVSRV8(cfg)
    if args.lr_dir:
        from cdfo_tpu.data.io import load_eval_sequence
        data = load_eval_sequence(args.lr_dir, args.side_dir,
                                  args.frames or None)
        h, w = data.lr.shape[1:]
    else:
        h, w = args.height, args.width
        data = synthetic_sequence(t=args.frames, h=h, w=w, seed=0)

    dummy = np.zeros((1, 7, h, w, 1), np.float32)
    dmv = np.zeros((1, 7, h, w, 2), np.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), dummy, dmv, dmv,
                                 dummy, dummy, dummy)
    if args.ckpt:
        from cdfo_tpu.train.loop import restore_params
        params = restore_params(args.ckpt, params)

    if len(devs) > 1:
        mesh = make_mesh((len(devs),), ("data",))
        eng = ShardedServingEngine(model, params, mesh,
                                   k_per_device=args.k_per_device)
        mode = f"sharded over {len(devs)} devices (k={eng.k})"
    else:
        eng = BatchedStreamingEngine(model, params, k=args.k_per_device)
        mode = f"single device (k={eng.k})"

    warm = synthetic_sequence(t=2 * eng.k, h=h, w=w, seed=1)
    eng.run_sequence(warm)
    frames, fps = eng.run_sequence(data, collect_timing=True)
    if args.save_dir:
        from cdfo_tpu.data.io import write_gray
        os.makedirs(args.save_dir, exist_ok=True)
        for i in range(frames.shape[0]):
            write_gray(os.path.join(args.save_dir, "%05d.png" % i),
                       frames[i])
    print(json.dumps({
        "mode": mode, "devices": len(devs),
        "geometry": f"{h}x{w} -> {4 * h}x{4 * w}",
        "frames": int(frames.shape[0]),
        "fps": round(float(fps), 3),
        **({"saved": args.save_dir} if args.save_dir else {}),
    }))


if __name__ == "__main__":
    main()
