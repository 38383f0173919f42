"""Batched streaming engine == per-window reference-semantics forward.

The engine restructures the computation (per-frame compensation ring,
k-batched centers, fused trunk option) — these tests pin that the OUTPUT
is unchanged (deterministic 'expected' mask mode) for k spanning edge
cases, including sequence-boundary windows and the max(1,i) prior rule.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cdfo_tpu.config import ModelConfig
from cdfo_tpu.models import CVSRV8
from cdfo_tpu.infer.pipeline import StreamingInferencer, synthetic_sequence
from cdfo_tpu.infer.engine import BatchedStreamingEngine


@pytest.fixture(scope="module")
def setup():
    model = CVSRV8(ModelConfig(scn_groups=2, mask_mode="expected"))
    data = synthetic_sequence(t=9, h=16, w=24, seed=3)
    dummy = np.zeros((1, 7, 16, 24, 1), np.float32)
    dmv = np.zeros((1, 7, 16, 24, 2), np.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), dummy, dmv, dmv,
                                 dummy, dummy, dummy)
    ref_frames, _ = StreamingInferencer(model, params).run_sequence(data)
    return model, params, data, ref_frames


@pytest.mark.parametrize("k", [1, 3, 4])
def test_engine_matches_per_window_forward(setup, k):
    model, params, data, ref_frames = setup
    eng = BatchedStreamingEngine(model, params, k=k)
    frames, _ = eng.run_sequence(data)
    # uint8 after float32 pipelines: allow 1 LSB of rounding skew
    diff = np.abs(frames.astype(np.int32) - ref_frames.astype(np.int32))
    assert diff.max() <= 1, (k, diff.max(), (diff > 1).sum())


def test_engine_fused_trunk_matches(setup):
    model, params, data, ref_frames = setup
    fused_model = CVSRV8(ModelConfig(scn_groups=2, mask_mode="expected",
                                     fused_trunk=True))
    eng = BatchedStreamingEngine(fused_model, params, k=4)
    frames, _ = eng.run_sequence(data)
    diff = np.abs(frames.astype(np.int32) - ref_frames.astype(np.int32))
    assert diff.max() <= 1, (diff.max(), (diff > 1).sum())


def test_engine_block_warp_matches(setup):
    """block_warp=True (Pallas patch-DMA warp from the unpacked padded
    ring, `ops/warp_block.py`) == per-window forward; the synthetic MVs
    are 4x4-blockwise so the kernel fast path is exercised, and the
    engine's zero-padded MV rows route through the bottom-band pixel
    path."""
    model, params, data, ref_frames = setup
    bw_model = CVSRV8(ModelConfig(scn_groups=2, mask_mode="expected",
                                  block_warp=True))
    eng = BatchedStreamingEngine(bw_model, params, k=4)
    frames, _ = eng.run_sequence(data)
    diff = np.abs(frames.astype(np.int32) - ref_frames.astype(np.int32))
    assert diff.max() <= 1, (diff.max(), (diff > 1).sum())


def test_engine_timing_counts_all_frames(setup):
    model, params, data, _ = setup
    eng = BatchedStreamingEngine(model, params, k=4)
    frames, fps = eng.run_sequence(data, collect_timing=True)
    assert fps is not None and fps > 0
    assert frames.shape[0] == data.num_frames


def test_eval_mask_mode_default_is_expected():
    """Pin the documented eval default: deterministic 'expected' gumbel mode.

    Measured on a synthetic-trained CVSR_V8 with exercised residual masks
    (tools/gumbel_variance.py): sample-mode PSNR spread sigma = 0.0012 dB
    across 8 seeds, expected-vs-sample delta = -0.0014 dB — negligible vs
    the 0.05 dB parity budget, so the deterministic mode is the eval
    default everywhere (the reference samples gumbel noise at eval,
    `SIDECVSR_our.py:2168-2177`, making its own evals nondeterministic).
    """
    import pathlib

    for tool in ("tools/eval_jctvc.py", "bench.py", "tools/bench_fps.py"):
        src = pathlib.Path(tool).read_text()
        assert 'mask_mode="expected"' in src, tool


@pytest.mark.parametrize("ablation", [
    dict(use_mv=False),            # woMV: no warp branch in streaming
    dict(use_pd=False),            # woPd: no pred branch / no ufs prior
    dict(use_la=False),            # woLA: EGLA variant, no rms branch
])
def test_engine_ablations_match_per_window(ablation):
    """The streaming fast paths (quad ring, ring warp, fused tail) keep
    the ablation branches output-identical to the per-window forward."""
    cfg = ModelConfig(scn_groups=2, mask_mode="expected",
                      fused_trunk=True, **ablation)
    model = CVSRV8(cfg)
    data = synthetic_sequence(t=6, h=16, w=24, seed=5)
    dummy = np.zeros((1, 7, 16, 24, 1), np.float32)
    dmv = np.zeros((1, 7, 16, 24, 2), np.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), dummy, dmv, dmv,
                                 dummy, dummy, dummy)
    ref_frames, _ = StreamingInferencer(model, params).run_sequence(data)
    eng = BatchedStreamingEngine(model, params, k=2)
    frames, _ = eng.run_sequence(data)
    diff = np.abs(frames.astype(np.int32) - ref_frames.astype(np.int32))
    assert diff.max() <= 1, (ablation, diff.max())
