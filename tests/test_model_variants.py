"""Compile/shape tests for the non-flagship model family."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cdfo_tpu.config import ModelConfig


def inputs(b=1, n=7, h=16, w=16):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    return (jax.random.uniform(ks[0], (b, n, h, w, 1)),
            jax.random.normal(ks[1], (b, n, h, w, 2)) * 0.3,
            jax.random.normal(ks[2], (b, n, h, w, 2)) * 0.3,
            jax.random.uniform(ks[3], (b, n, h, w, 1)),
            jax.random.uniform(ks[4], (b, n, h, w, 1)) - 0.5,
            jax.random.uniform(ks[5], (b, n, h, w, 1)))


RNGS = {"params": jax.random.PRNGKey(1), "gumbel": jax.random.PRNGKey(2)}


def test_cvsr_v7():
    from cdfo_tpu.models.cvsr_variants import CVSRV7

    model = CVSRV7(ModelConfig(name="cvsr_v7", mask_mode="expected"))
    args = inputs()
    params = model.init(RNGS, *args)
    sr, l1 = model.apply(params, *args)
    assert sr.shape == (1, 64, 64, 1)
    assert l1.shape == (1, 7, 16, 16, 64)
    assert np.isfinite(np.asarray(sr)).all()


def test_cvsr_v7_streaming_cache():
    from cdfo_tpu.models.cvsr_variants import CVSRV7

    model = CVSRV7(ModelConfig(name="cvsr_v7", mask_mode="expected"))
    args = inputs()
    params = model.init(RNGS, *args)
    _, l1 = model.apply(params, *args)
    sr2, l1b = model.apply(params, *args, pre_l1=l1)
    np.testing.assert_allclose(np.asarray(l1b[:, :-1]), np.asarray(l1[:, 1:]),
                               rtol=2e-5, atol=2e-5)


def test_sidecvsr():
    from cdfo_tpu.models.cvsr_variants import SIDECVSRModel

    model = SIDECVSRModel(ModelConfig(name="sidecvsr", scn_groups=2,
                                      mask_mode="expected"))
    lrs, mvs0, mvs1, pms, rms, ufs = inputs()
    params = model.init(RNGS, lrs, mvs0, pms, rms, ufs)
    sr, l1 = model.apply(params, lrs, mvs0, pms, rms, ufs)
    assert sr.shape == (1, 64, 64, 1)
    assert np.isfinite(np.asarray(sr)).all()


def test_cvsr_v9():
    from cdfo_tpu.models.cvsr_variants import CVSRV9

    model = CVSRV9(ModelConfig(name="cvsr_v9", scn_groups=1,
                               mask_mode="expected"))
    args = inputs()
    params = model.init(RNGS, *args)
    sr, _ = model.apply(params, *args)
    assert sr.shape == (1, 64, 64, 1)


def test_stdf_and_skconv():
    from cdfo_tpu.models.alignment_dcn import STDF, DeformableSKConv

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 16, 64))
    mv = jax.random.normal(key, (2, 16, 16, 2)) * 0.5
    stdf = STDF(in_nc=8, out_nc=64, nf=64)
    params = stdf.init(key, x, x, x, mv)
    out = stdf.apply(params, x, x, x, mv)
    assert out.shape == (2, 16, 16, 64)


def test_mv_dual_att_alignment():
    from cdfo_tpu.models.alignment_dcn import MVDualAttAlignment

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 16, 16, 64))
    mv = jax.random.normal(key, (1, 16, 16, 2)) * 0.5
    mod = MVDualAttAlignment(64, 3, 1, 16)
    params = mod.init(key, x, x, x, mv)
    out = mod.apply(params, x, x, x, mv)
    assert out.shape == x.shape
    # zero-init offset head: with zero flow the DCN starts as a plain conv
    assert np.isfinite(np.asarray(out)).all()


def test_mv_local_attn_and_stn():
    from cdfo_tpu.models.alignment_dcn import MVLocalAttn

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 8, 8, 16))
    mv = jnp.zeros((1, 8, 8, 2))
    mod = MVLocalAttn(nf=16)
    params = mod.init(key, x, x, mv)
    out = mod.apply(params, x, x, mv)
    assert out.shape == x.shape


def test_egla_variants_run():
    from cdfo_tpu.models.attention_variants import (
        EGLA1, EGLAwoGA, EGLAwoLA, RDAB, RDABS, RSNLAttention,
        CrissCrossAttention, NonLocalAttention, RCAB, SKFF, ContextBlock,
        PAM, CAMSelf, CAM)

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 16, 16, 64))
    res = jax.random.uniform(key, (1, 16, 16, 64)) * 0.1
    rngs = {"params": key, "gumbel": jax.random.PRNGKey(1)}

    for mod, args in [
        (EGLAwoLA(64), (x,)),
        (EGLAwoGA(64), (res, x)),
        (EGLA1(64), (res, x)),
        (RDAB(64, mask_mode="expected"), (res, x)),
        (RDABS(64, mask_mode="expected"), (res, x)),
        (RSNLAttention(64, mask_mode="expected"), (res, x)),
        (CrissCrossAttention(64), (res, x)),
        (NonLocalAttention(64), (x,)),
        (RCAB(64), (x,)),
        (SKFF(64), (x, x)),
        (ContextBlock(64), (x,)),
        (PAM(64), (x, x)),
        (CAMSelf(), (x,)),
        (CAM(), (x, x, x)),
    ]:
        params = mod.init(rngs, *args)
        out = mod.apply(params, *args)
        assert out.shape[0] == 1 and np.isfinite(np.asarray(out)).all(), type(mod)


def test_sft_stack():
    from cdfo_tpu.models.sft import SideEmbeddedFeatureExtractBlock

    key = jax.random.PRNGKey(0)
    fea = jax.random.normal(key, (2, 8, 8, 64))
    side = jax.random.normal(key, (2, 8, 8, 32))
    mod = SideEmbeddedFeatureExtractBlock(64)
    params = mod.init(key, fea, side)
    out = mod.apply(params, fea, side)
    assert out.shape == fea.shape
