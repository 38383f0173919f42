"""Parity of the fused EGLA path (`ops/fused_egla.py`) against the
standard EGLA module, fp32 CPU interpret mode, expected-mask eval."""
import jax
import jax.numpy as jnp
import numpy as np

from cdfo_tpu.models.attention import EGLA


def test_fused_egla_matches_standard():
    rng = np.random.RandomState(0)
    b, h, w, c = 2, 24, 32, 64
    # residuals with real structure so the mask is non-degenerate
    res = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32) * 0.3)
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32) * 0.5)

    std = EGLA(c, mask_mode="expected")
    params = std.init(jax.random.PRNGKey(0), res, x)
    ref = std.apply(params, res, x)

    fused = EGLA(c, mask_mode="expected", fused=True)
    out = fused.apply(params, res, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_egla_param_tree_identical():
    b, h, w, c = 1, 16, 16, 64
    res = jnp.zeros((b, h, w, c))
    x = jnp.zeros((b, h, w, c))
    p_std = EGLA(c, mask_mode="expected").init(jax.random.PRNGKey(0), res, x)
    p_fus = EGLA(c, mask_mode="expected", fused=True).init(
        jax.random.PRNGKey(0), res, x)
    flat_s = jax.tree_util.tree_leaves_with_path(p_std)
    flat_f = jax.tree_util.tree_leaves_with_path(p_fus)
    keys_s = {jax.tree_util.keystr(k): v.shape for k, v in flat_s}
    keys_f = {jax.tree_util.keystr(k): v.shape for k, v in flat_f}
    assert keys_s == keys_f


def test_engine_full_fused_equivalence():
    """BatchedStreamingEngine with EVERY fused kernel enabled (trunk,
    embed, align, egla) matches the plain per-window forward."""
    from cdfo_tpu.config import ModelConfig
    from cdfo_tpu.infer.engine import BatchedStreamingEngine
    from cdfo_tpu.infer.pipeline import StreamingInferencer, synthetic_sequence
    from cdfo_tpu.models import CVSRV8

    t, h, w = 6, 16, 24
    data = synthetic_sequence(t=t, h=h, w=w, seed=3)
    cfg = ModelConfig(mask_mode="expected", scn_groups=1,
                      fused_trunk=True, fused_embed=True, fused_align=True,
                      fused_egla=True)
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
