import jax
import jax.numpy as jnp

from cdfo_tpu.models.attention_variants import CalibResBlock3D


def test_calib_resblock3d_tiling_roundtrip():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 16, 8))
    mod = CalibResBlock3D(12)
    params = mod.init(key, x)
    out = mod.apply(params, x)
    assert out.shape == x.shape
    # zero convs: inner residual passes v through, so out == 2x exactly —
    # proves the 4x4 re-tiling/scatter is a perfect inverse pair
    p0 = jax.tree.map(jnp.zeros_like, params)
    assert jnp.allclose(mod.apply(p0, x), 2 * x)
