"""Shape/behaviour smoke tests for the CVSR_V8 flagship."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cdfo_tpu.config import ModelConfig
from cdfo_tpu.models.cvsr import CVSRV8


def make_inputs(b=1, n=7, h=16, w=24):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    lrs = jax.random.uniform(ks[0], (b, n, h, w, 1))
    mvs0 = jax.random.normal(ks[1], (b, n, h, w, 2)) * 0.5
    mvs1 = jax.random.normal(ks[2], (b, n, h, w, 2)) * 0.5
    pms = jax.random.uniform(ks[3], (b, n, h, w, 1))
    rms = jax.random.uniform(ks[4], (b, n, h, w, 1)) - 0.5
    ufs = jax.random.uniform(ks[5], (b, n, h, w, 1))
    return lrs, mvs0, mvs1, pms, rms, ufs


@pytest.fixture(scope="module")
def model_and_params():
    cfg = ModelConfig(scn_groups=2, mask_mode="expected")
    model = CVSRV8(cfg)
    inputs = make_inputs()
    params = model.init(jax.random.PRNGKey(1), *inputs)
    return model, params, inputs


def test_forward_shapes(model_and_params):
    model, params, inputs = model_and_params
    sr, l1 = model.apply(params, *inputs)
    b, n, h, w, _ = inputs[0].shape
    assert sr.shape == (b, 4 * h, 4 * w, 1)
    assert l1.shape == (b, n, h, w, 64)
    assert np.isfinite(np.asarray(sr)).all()


def test_recurrent_cache_consistency(model_and_params):
    """Feeding the full-window features back as pre_l1 with the same newest
    frame must reproduce the same embedding for frames 1..N-1 shifted."""
    model, params, inputs = model_and_params
    sr0, l1 = model.apply(params, *inputs)
    # shift window by one: drop frame 0, duplicate last frame as "new"
    shifted = []
    for t in inputs:
        shifted.append(jnp.concatenate([t[:, 1:], t[:, -1:]], axis=1))
    sr1, l1_new = model.apply(params, *shifted, pre_l1=l1)
    # cache: frames 0..N-2 of new window == frames 1..N-1 of old window
    np.testing.assert_allclose(np.asarray(l1_new[:, :-1]),
                               np.asarray(l1[:, 1:]), rtol=1e-5, atol=1e-5)
    # and the freshly embedded frame equals embedding it without cache
    sr_full, l1_full = model.apply(params, *shifted)
    np.testing.assert_allclose(np.asarray(l1_new[:, -1]),
                               np.asarray(l1_full[:, -1]), rtol=1e-4, atol=1e-4)


def test_gumbel_mask_mode_sample(model_and_params):
    model_s = CVSRV8(ModelConfig(scn_groups=2, mask_mode="sample"))
    inputs = make_inputs()
    params = model_s.init(
        {"params": jax.random.PRNGKey(1), "gumbel": jax.random.PRNGKey(2)},
        *inputs)
    sr_a, _ = model_s.apply(params, *inputs, rngs={"gumbel": jax.random.PRNGKey(3)})
    sr_b, _ = model_s.apply(params, *inputs, rngs={"gumbel": jax.random.PRNGKey(3)})
    np.testing.assert_allclose(np.asarray(sr_a), np.asarray(sr_b))


def test_jit_compiles(model_and_params):
    model, params, inputs = model_and_params
    fn = jax.jit(lambda p, *a: model.apply(p, *a)[0])
    sr = fn(params, *inputs)
    assert sr.shape[1] == inputs[0].shape[2] * 4


def test_ablation_variants_run():
    inputs = make_inputs(h=8, w=8)
    for kw in [dict(use_pab=False), dict(use_mv=False), dict(use_pd=False),
               dict(use_egla=False)]:
        cfg = ModelConfig(scn_groups=1, mask_mode="expected", **kw)
        model = CVSRV8(cfg)
        params = model.init(jax.random.PRNGKey(0), *inputs)
        sr, _ = model.apply(params, *inputs)
        assert sr.shape == (1, 32, 32, 1)
