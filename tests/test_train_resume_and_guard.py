"""Checkpoint resume + non-finite-loss guard tests."""
import numpy as np
import jax
import jax.numpy as jnp

from cdfo_tpu.config import ModelConfig, TrainConfig
from cdfo_tpu.models import CVSRV8
from cdfo_tpu.train.loop import restore_checkpoint, save_checkpoint
from cdfo_tpu.train.state import create_train_state, train_step


def tiny_batch(b=1, h=8, w=8, bad=False):
    r = np.random.RandomState(0)
    hr = r.rand(b, 4 * h, 4 * w, 1).astype(np.float32)
    if bad:
        hr[0, 0, 0, 0] = np.nan
    return {
        "lrs": r.rand(b, 7, h, w, 1).astype(np.float32),
        "mvs0": np.zeros((b, 7, h, w, 2), np.float32),
        "mvs1": np.zeros((b, 7, h, w, 2), np.float32),
        "pms": r.rand(b, 7, h, w, 1).astype(np.float32),
        "rms": np.zeros((b, 7, h, w, 1), np.float32),
        "ufs": r.rand(b, 7, h, w, 1).astype(np.float32),
        "hr": hr,
    }


def test_nan_batch_does_not_corrupt_state():
    model = CVSRV8(ModelConfig(scn_groups=1, mask_mode="expected"))
    batch = tiny_batch()
    state = create_train_state(model, TrainConfig(), batch)
    step = jax.jit(train_step)
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    params_before = jax.tree.map(np.asarray, state.params)
    state_after, loss = step(state, tiny_batch(bad=True), jax.random.PRNGKey(1))
    assert not np.isfinite(float(loss))
    # params unchanged by the poisoned step
    for a, b in zip(jax.tree.leaves(params_before),
                    jax.tree.leaves(state_after.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and a healthy step afterwards still updates
    state_next, loss2 = step(state_after, tiny_batch(), jax.random.PRNGKey(2))
    assert np.isfinite(float(loss2))
    assert not np.allclose(
        np.asarray(jax.tree.leaves(state_next.params)[0]),
        np.asarray(jax.tree.leaves(state_after.params)[0]))


def test_checkpoint_roundtrip(tmp_path):
    model = CVSRV8(ModelConfig(scn_groups=1, mask_mode="expected"))
    batch = tiny_batch()
    state = create_train_state(model, TrainConfig(), batch)
    state, _ = jax.jit(train_step)(state, batch, jax.random.PRNGKey(0))
    path = save_checkpoint(str(tmp_path), state, int(state.step))

    fresh = create_train_state(model, TrainConfig(), batch)
    restored = restore_checkpoint(path, fresh)
    assert int(restored.step) == int(state.step)
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state restored too (reference never saved it)
    for a, b in zip(jax.tree.leaves(state.opt_state),
                    jax.tree.leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))