"""Smoke tests for the library extras (AGG/RiR trunks, FGSW_MSA, GDN,
EMVNet, LocalCorr, MotionFeaFusion, Ghost, DSTA)."""
import numpy as np
import jax
import jax.numpy as jnp

from cdfo_tpu.models.extras import (
    AGGSCGroup, AGGSCNet, ConvUnit, DSTA, EMVNet, FGSWMSA, GDN,
    GhostModuleMul, LocalCorr, MotionFeaFusion, RinRNet, lower_bound)

KEY = jax.random.PRNGKey(0)


def test_pyramid_trunks():
    xs = [jax.random.normal(KEY, (1, 16, 16, 64)),
          jax.random.normal(KEY, (1, 8, 8, 64)),
          jax.random.normal(KEY, (1, 4, 4, 64))]
    for mod in [AGGSCGroup(64, 1), AGGSCNet(64, 1)]:
        params = mod.init(KEY, xs)
        out = mod.apply(params, xs)
        assert [o.shape for o in out] == [x.shape for x in xs]


def test_rir():
    x = jax.random.normal(KEY, (1, 16, 16, 64))
    mod = RinRNet(64, 2)
    out = mod.apply(mod.init(KEY, x), x)
    assert out.shape == x.shape


def test_fgsw_msa():
    x = jax.random.normal(KEY, (1, 16, 16, 64))
    flow = jax.random.normal(KEY, (1, 16, 16, 2))
    mod = FGSWMSA(64)
    out = mod.apply(mod.init(KEY, x, x, x, flow), x, x, x, flow)
    assert out.shape == x.shape


def test_gdn_forward_and_inverse():
    x = jnp.abs(jax.random.normal(KEY, (1, 8, 8, 16))) + 0.1
    gdn = GDN(16)
    p = gdn.init(KEY, x)
    y = gdn.apply(p, x)
    assert np.isfinite(np.asarray(y)).all()
    igdn = GDN(16, inverse=True)
    yi = igdn.apply(igdn.init(KEY, x), x)
    assert not np.allclose(np.asarray(y), np.asarray(yi))


def test_lower_bound_gradient():
    g = jax.grad(lambda x: jnp.sum(lower_bound(x, 1.0)))(jnp.array([0.5, 2.0]))
    # below bound: gradient blocked (for upward-pushing grads of +1)
    np.testing.assert_array_equal(np.asarray(g), [0.0, 1.0])


def test_emvnet():
    flow = jax.random.normal(KEY, (1, 16, 16, 2))
    mod = EMVNet()
    out = mod.apply(mod.init(KEY, flow), flow)
    assert out.shape == (1, 16, 16, 2)


def test_local_corr():
    ref = jax.random.normal(KEY, (1, 8, 8, 16))
    nbrs = [jax.random.normal(jax.random.PRNGKey(i), (1, 8, 8, 16))
            for i in range(2)]
    mod = LocalCorr(16)
    out = mod.apply(mod.init(KEY, nbrs, ref), nbrs, ref)
    assert out.shape == (1, 3, 8, 8, 16)


def test_motion_fusion_and_ghost_and_convunit():
    x = jax.random.normal(KEY, (1, 8, 8, 64))
    mf = MotionFeaFusion(64)
    assert mf.apply(mf.init(KEY, x, x), x, x).shape == x.shape
    gm = GhostModuleMul(64, 64)
    assert gm.apply(gm.init(KEY, x), x).shape == x.shape
    cu = ConvUnit(32, 3, 1, 1)
    assert cu.apply(cu.init(KEY, x), x).shape == (1, 8, 8, 32)


def test_dsta():
    x = jax.random.normal(KEY, (1, 32, 32, 64))
    mod = DSTA(64)
    out = mod.apply(mod.init(KEY, x), x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
