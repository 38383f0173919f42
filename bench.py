"""Headline benchmark: streaming 1080p x4 SR throughput on one TPU chip.

Reproduces the reference FPS protocol (`test_LD_22_FPS.py:183-197`): only the
model forward is timed (host-side window prep and PNG work excluded); the
sliding window runs in streaming mode with the recurrent L1-feature cache.
Input 480x272 LR (Kimono1-class geometry) -> 1920x1088 output.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 30 fps — the north-star ">30 fps 1080p x4 on one
v5e chip" from BASELINE.md (the reference publishes no absolute numbers).
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax

    from cdfo_tpu.config import ModelConfig
    from cdfo_tpu.models import CVSRV8
    from cdfo_tpu.infer.pipeline import StreamingInferencer, synthetic_sequence

    cfg = ModelConfig(mask_mode="expected",
                      compute_dtype=jax.numpy.bfloat16)
    model = CVSRV8(cfg)

    h, w, t = 272, 480, 12
    data = synthetic_sequence(t=t, h=h, w=w, seed=0)

    dummy = np.zeros((1, 7, h, w, 1), np.float32)
    dummy_mv = np.zeros((1, 7, h, w, 2), np.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), dummy, dummy_mv,
                                 dummy_mv, dummy, dummy, dummy)

    inf = StreamingInferencer(model, params)
    # warm-up pass compiles both graphs
    inf.run_sequence(data)
    frames, fps = inf.run_sequence(data, collect_timing=True)
    assert frames.shape == (t, 1080, 1920)  # 1088-row output cropped to 1080

    print(json.dumps({
        "metric": "1080p_x4_streaming_fps",
        "value": round(float(fps), 3),
        "unit": "frames/s",
        "vs_baseline": round(float(fps) / 30.0, 4),
    }))


if __name__ == "__main__":
    main()
