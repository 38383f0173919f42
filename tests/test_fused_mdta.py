"""Parity of the fused GCPI embed path (`ops/fused_mdta.py` +
`PartitionTransformerSA2Fast`) against the XLA reference modules, fp32 on
CPU interpret mode — same guarantees as the other fused-kernel tests."""
import jax
import jax.numpy as jnp
import numpy as np

from cdfo_tpu.models.prior_encoder import (PartitionTransformerSA2,
                                           PartitionTransformerSA2Fast)


def _rand(rng, *shape):
    return jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.5)


def test_fast_rounds_match_reference_modules():
    rng = np.random.RandomState(0)
    m, h, w, c = 2, 24, 40, 64
    x1 = _rand(rng, m, h, w, c)
    x2 = _rand(rng, m, h, w, c)

    slow = PartitionTransformerSA2(c, 8)
    fast = PartitionTransformerSA2Fast(c, 8)
    params = slow.init(jax.random.PRNGKey(0), x1, x2)
    # identical param trees (checkpoint converter compatibility)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(
                fast.init(jax.random.PRNGKey(0), x1, x2)))

    ref = slow.apply(params, x1, x2)
    out = fast.apply(params, x1, x2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_embed_model_path():
    """CVSRV8 with fused_embed=True matches the plain model (embed only
    differs; full forward compared at small scale)."""
    from cdfo_tpu.config import ModelConfig
    from cdfo_tpu.models import CVSRV8

    rng = np.random.RandomState(1)
    b, n, h, w = 1, 7, 16, 24
    lrs = jnp.asarray(rng.rand(b, n, h, w, 1).astype(np.float32))
    mv = jnp.asarray(rng.randn(b, n, h, w, 2).astype(np.float32) * 0.5)
    pm = jnp.asarray(rng.rand(b, n, h, w, 1).astype(np.float32))
    rm = jnp.asarray(rng.rand(b, n, h, w, 1).astype(np.float32))
    uf = jnp.asarray(rng.rand(b, n, h, w, 1).astype(np.float32))

    base = CVSRV8(ModelConfig(mask_mode="expected", scn_groups=1))
    fast = CVSRV8(ModelConfig(mask_mode="expected", scn_groups=1,
                              fused_embed=True))
    params = base.init(jax.random.PRNGKey(0), lrs, mv, mv, pm, rm, uf)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(
                fast.init(jax.random.PRNGKey(0), lrs, mv, mv, pm, rm, uf)))

    sr0, l10 = base.apply(params, lrs, mv, mv, pm, rm, uf)
    sr1, l11 = fast.apply(params, lrs, mv, mv, pm, rm, uf)
    np.testing.assert_allclose(np.asarray(l11), np.asarray(l10),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(sr1), np.asarray(sr0),
                               rtol=5e-4, atol=5e-4)
