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


def test_engine_timing_counts_all_frames(setup):
    model, params, data, _ = setup
    eng = BatchedStreamingEngine(model, params, k=4)
    frames, fps = eng.run_sequence(data, collect_timing=True)
    assert fps is not None and fps > 0
    assert frames.shape[0] == data.num_frames
