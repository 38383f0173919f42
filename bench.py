"""Headline benchmark: streaming 1080p x4 SR throughput on one TPU chip.

Reproduces the reference FPS protocol (`test_LD_22_FPS.py:183-197`): only
device-side model forwards are timed (host-side window prep and PNG work
excluded); `FPS = len(frames)/Sumtime` with frame 0 INCLUDED, exactly the
reference boundary (`:185-192`). 100 synthetic frames so the first-window
embed amortises as it does on real sequences.

Production path: BatchedStreamingEngine (per-frame compensation ring,
k-batched centers) + fused Pallas trunk, bf16 compute.
Input 480x272 LR (Kimono1-class geometry) -> 1920x1088 output.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 30 fps — the north-star ">30 fps 1080p x4 on one
v5e chip" from BASELINE.md (the reference publishes no absolute numbers).
"""
from __future__ import annotations

import json

import numpy as np


def main():
    import jax

    # persistent compilation cache: the fused kernels cost ~8-10 min of
    # Mosaic compiles cold; cached runs skip them entirely
    from cdfo_tpu.utils import apply_platform_env, enable_compilation_cache
    apply_platform_env()
    enable_compilation_cache()

    from cdfo_tpu.config import ModelConfig
    from cdfo_tpu.models import CVSRV8
    from cdfo_tpu.infer.engine import BatchedStreamingEngine
    from cdfo_tpu.infer.pipeline import synthetic_sequence

    # Headline config: int8-turbo trunk (quantize-in-epilogue Pallas
    # kernel, `ops/fused_block2_q.py`). Accuracy vs the exact bf16 path
    # is -0.007 dB end-to-end on a trained model (tools/int8_delta.py,
    # BENCH_NOTES "int8 turbo" section) — 7x inside the 0.05 dB parity
    # budget. The exact-path fps is measured and disclosed alongside.
    # NOTE: block_warp (ops/warp_block.py) measures 1.19x on the warp
    # standalone but FAULTS the TPU worker inside the full engine
    # program on the current toolchain (BENCH_NOTES round-5 warp
    # section) — kept opt-in/off here until that is root-caused.
    kw = dict(mask_mode="expected", compute_dtype=jax.numpy.bfloat16,
              fused_trunk=True, fused_embed=True, fused_align=True,
              fused_egla=True)
    model = CVSRV8(ModelConfig(trunk_int8=True, **kw))
    model_exact = CVSRV8(ModelConfig(**kw))

    h, w, t, k = 272, 480, 100, 4
    data = synthetic_sequence(t=t, h=h, w=w, seed=0)

    dummy = np.zeros((1, 7, h, w, 1), np.float32)
    dummy_mv = np.zeros((1, 7, h, w, 2), np.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), dummy, dummy_mv,
                                 dummy_mv, dummy, dummy, dummy)

    eng = BatchedStreamingEngine(model, params, k=k)
    eng_exact = BatchedStreamingEngine(model_exact, params, k=k)
    # warm-up on a short prefix compiles both graphs
    import time
    t_start = time.monotonic()
    warm = synthetic_sequence(t=2 * k, h=h, w=w, seed=1)
    eng.run_sequence(warm)
    eng_exact.run_sequence(warm)
    # three timed runs; the HEADLINE is the median, comparable to the
    # reference's single-pass measurement (run-to-run spread through the
    # axon tunnel is ~±15% for an identical program, so best-of would
    # report the optimistic tail — ADVICE r2). All runs are disclosed.
    # Soft deadline (CDFO_BENCH_DEADLINE seconds, default 480): when the
    # warm-up ate the budget (cold Mosaic compiles on an uncached machine,
    # or a degraded tunnel), report the median of however many timed runs
    # fit instead of timing out with nothing on stdout (BENCH_r03 was a
    # driver rc=124 with zero output during the round-3 tunnel outage).
    import os
    deadline = float(os.environ.get("CDFO_BENCH_DEADLINE", "480"))
    runs, runs_exact = [], []
    for _ in range(3):
        frames, f = eng.run_sequence(data, collect_timing=True)
        runs.append(float(f))
        if time.monotonic() - t_start > deadline:
            break
    assert frames.shape == (t, 1080, 1920)  # 1088-row output cropped to 1080
    for _ in range(3):
        if time.monotonic() - t_start > deadline:
            break
        _, f = eng_exact.run_sequence(data, collect_timing=True)
        runs_exact.append(float(f))
    fps = sorted(runs)[(len(runs) - 1) // 2]  # lower median: no optimism

    out = {
        "metric": "1080p_x4_streaming_fps",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 4),
        "trunk": "int8-turbo (-0.007 dB end-to-end, tools/int8_delta.py)",
        "runs": [round(r, 3) for r in runs],
        "runs_completed": len(runs),
        "deadline_hit": len(runs) < 3,
        "best": round(max(runs), 3),
    }
    if runs_exact:
        out["exact_fps"] = round(
            sorted(runs_exact)[(len(runs_exact) - 1) // 2], 3)
        out["exact_runs"] = [round(r, 3) for r in runs_exact]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
