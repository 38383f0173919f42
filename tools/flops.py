#!/usr/bin/env python
"""FLOPs / parameter counting harness (the `CVSR_V8_flops` wrapper +
`np.prod(p.size())` prints of the reference, done properly via XLA cost
analysis).

  python tools/flops.py --model cvsr_v8 --hw 272 480
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="cvsr_v8")
    p.add_argument("--hw", nargs=2, type=int, default=[64, 96])
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    from cdfo_tpu.config import ModelConfig
    from cdfo_tpu.models import build_model
    from cdfo_tpu.utils import count_params, estimate_flops

    h, w = args.hw
    cfg = ModelConfig(name=args.model, mask_mode="expected")
    model = build_model(args.model, cfg)
    r = np.random.RandomState(0)
    xs = (r.rand(1, 7, h, w, 1).astype(np.float32),
          r.randn(1, 7, h, w, 2).astype(np.float32),
          r.randn(1, 7, h, w, 2).astype(np.float32),
          r.rand(1, 7, h, w, 1).astype(np.float32),
          r.rand(1, 7, h, w, 1).astype(np.float32),
          r.rand(1, 7, h, w, 1).astype(np.float32))
    if args.model == "sidecvsr":
        xs = xs[:2] + xs[3:]
    rngs = {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)}
    params = jax.jit(model.init)(rngs, *xs)
    print(f"params: {count_params(params):,}")
    fl = estimate_flops(lambda *a: model.apply(params, *a)[0], *xs)
    print(f"forward flops @ {h}x{w}: {fl/1e9:.2f} GFLOP")


if __name__ == "__main__":
    main()
