"""Parity of the fused dual-MSA alignment (`ops/fused_align.py`) against
the XLA DualAttAlignment path, fp32 CPU interpret mode."""
import jax
import jax.numpy as jnp
import numpy as np

from cdfo_tpu.models.alignment import DualAttAlignment
from cdfo_tpu.ops.warp import flow_warp


def test_fused_msa_matches_xla_path():
    rng = np.random.RandomState(0)
    bc, nbr, h, w, c = 2, 3, 24, 40, 64
    b = bc * nbr
    center = jnp.asarray(rng.randn(bc, h, w, c).astype(np.float32) * 0.5)
    extra = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32) * 0.5)
    pred = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32) * 0.5)
    flow = jnp.asarray(rng.randn(b, h, w, 2).astype(np.float32) * 2.0)

    mod = DualAttAlignment(c, 4)
    center_rep = jnp.broadcast_to(
        center[:, None], (bc, nbr, h, w, c)).reshape(b, h, w, c)
    params = mod.init(jax.random.PRNGKey(0), center_rep, extra, pred, flow)

    warped = flow_warp(extra, flow)
    center_hcw = jnp.transpose(center, (0, 1, 3, 2))
    ref = mod.apply(params, center_rep, None, pred, flow,
                    warped_feat=warped, center_hcw=center_hcw)
    out = mod.apply(params, None, None, pred, flow,
                    warped_feat=warped, center_hcw=center_hcw,
                    center_nhwc=center)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_engine_fused_align_equivalence():
    """BatchedStreamingEngine with fused_align+fused_embed matches the
    plain per-window forward (same guarantee the round-2 engine tests
    pin), small geometry, fp32."""
    from cdfo_tpu.config import ModelConfig
    from cdfo_tpu.infer.engine import BatchedStreamingEngine
    from cdfo_tpu.infer.pipeline import StreamingInferencer, synthetic_sequence
    from cdfo_tpu.models import CVSRV8

    t, h, w = 6, 16, 24
    data = synthetic_sequence(t=t, h=h, w=w, seed=3)
    cfg = ModelConfig(mask_mode="expected", scn_groups=1,
                      fused_trunk=True, fused_embed=True, fused_align=True)
    model = CVSRV8(cfg)
    dummy = np.zeros((1, 7, h, w, 1), np.float32)
    dummy_mv = np.zeros((1, 7, h, w, 2), np.float32)
    params = model.init(jax.random.PRNGKey(0), dummy, dummy_mv, dummy_mv,
                        dummy, dummy, dummy)

    eng = BatchedStreamingEngine(model, params, k=2)
    frames, _ = eng.run_sequence(data)

    base = CVSRV8(ModelConfig(mask_mode="expected", scn_groups=1))
    ref_frames, _ = StreamingInferencer(base, params).run_sequence(data)
    diff = np.abs(frames.astype(np.int32) - ref_frames.astype(np.int32))
    assert diff.max() <= 1, (diff.max(), (diff > 1).sum())
