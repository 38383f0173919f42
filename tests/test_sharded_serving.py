"""Sharded streaming serving (`parallel/serving.py`): the k-frame axis
sharded over the mesh 'data' axis must be EXACTLY the single-chip
engine — same rings, same math, same uint8 frames (fp32, CPU mesh)."""
import jax
import numpy as np
import pytest

from cdfo_tpu.config import ModelConfig
from cdfo_tpu.infer.engine import BatchedStreamingEngine
from cdfo_tpu.infer.pipeline import synthetic_sequence
from cdfo_tpu.models import CVSRV8
from cdfo_tpu.parallel.mesh import make_mesh
from cdfo_tpu.parallel.serving import ShardedServingEngine


@pytest.mark.parametrize("fused,t", [(False, 10), (True, 10), (False, 5)])
def test_sharded_serving_matches_single_chip(fused, t):
    """t=10 exercises the non-multiple-of-k tail (k=8 -> steps [0, 8));
    t=5 < k exercises a sequence SHORTER than one sharded step."""
    if len(jax.devices()) < 4:
        pytest.skip("needs the 8-device CPU mesh (conftest)")
    h, w = 16, 24
    data = synthetic_sequence(t=t, h=h, w=w, seed=5)
    cfg = ModelConfig(mask_mode="expected", scn_groups=1,
                      fused_trunk=fused, fused_embed=fused,
                      fused_align=fused)
    model = CVSRV8(cfg)
    dummy = np.zeros((1, 7, h, w, 1), np.float32)
    dummy_mv = np.zeros((1, 7, h, w, 2), np.float32)
    params = model.init(jax.random.PRNGKey(0), dummy, dummy_mv, dummy_mv,
                        dummy, dummy, dummy)

    mesh = make_mesh((4,), ("data",))
    sharded = ShardedServingEngine(model, params, mesh, k_per_device=2)
    assert sharded.k == 8
    frames_s, _ = sharded.run_sequence(data)

    single = BatchedStreamingEngine(model, params, k=8)
    frames_1, _ = single.run_sequence(data)

    np.testing.assert_array_equal(frames_s, frames_1)
