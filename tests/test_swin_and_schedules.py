import numpy as np
import jax
import jax.numpy as jnp

from cdfo_tpu.models.swin import (
    RSTB, SwinTransformerBlock, window_partition, window_reverse)
from cdfo_tpu.train.schedules import (
    cosine_annealing_restart_lr, multi_step_restart_lr)

KEY = jax.random.PRNGKey(0)


def test_window_roundtrip():
    x = jax.random.normal(KEY, (2, 16, 24, 8))
    w = window_partition(x, 8)
    back = window_reverse(w, 8, 16, 24)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_swin_block_shifted_and_not():
    x = jax.random.normal(KEY, (1, 16 * 16, 32))
    for shift in (0, 4):
        blk = SwinTransformerBlock(32, num_heads=4, window_size=8,
                                   shift_size=shift)
        p = blk.init(KEY, x, (16, 16))
        out = blk.apply(p, x, (16, 16))
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()


def test_rstb():
    x = jax.random.normal(KEY, (1, 16 * 16, 32))
    mod = RSTB(32, depth=2, num_heads=4, window_size=8)
    out = mod.apply(mod.init(KEY, x, (16, 16)), x, (16, 16))
    assert out.shape == x.shape


def test_multi_step_restart():
    s = multi_step_restart_lr(1.0, milestones=[10, 20], gamma=0.5,
                              restarts=[0, 15], restart_weights=[1.0, 0.5])
    assert float(s(0)) == 1.0
    assert float(s(10)) == 0.5          # first milestone
    assert float(s(15)) == 0.5          # restart at weight 0.5
    assert float(s(20)) == 0.25         # milestone after restart


def test_cosine_restart():
    s = cosine_annealing_restart_lr(1.0, periods=[10, 10],
                                    restart_weights=[1.0, 0.5], eta_min=0.0)
    np.testing.assert_allclose(float(s(0)), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(s(10)), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(s(11)), 0.5 * 0.5 * (
        1 + np.cos(np.pi * 1 / 10)), rtol=1e-5)
