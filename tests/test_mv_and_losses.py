"""MV expansion, edge fixups, and loss parity tests."""
import numpy as np
import torch
import jax.numpy as jnp

from cdfo_tpu.ops.mv import (
    augment_mv, generate_input_index, modify_mv_for_end_frames, mv2mvs)
from cdfo_tpu.losses import charbonnier_loss, total_variation


def reference_mv2mvs(mv):
    """Reference math (`test_LD_37.py:83-105`), reproduced verbatim in numpy
    as the parity oracle."""
    mv_ = mv.astype(np.float32).copy()[np.newaxis]
    mv_[:, :, :, [0, 1]] = mv_[:, :, :, [1, 0]]
    out = np.zeros([7, mv_.shape[1], mv_.shape[2], 2], np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        fx = mv_[0, :, :, 0] / (mv_[0, :, :, 2] * -1.0)
        fy = mv_[0, :, :, 1] / (mv_[0, :, :, 2] * -1.0)
    out[2, :, :, 0] = np.where(~np.isnan(fx), fx, 0)
    out[2, :, :, 1] = np.where(~np.isnan(fy), fy, 0)
    out[1] = out[2] * 2.0
    out[0] = out[2] * 3.0
    out[4] = out[2] * -1.0
    out[5] = out[2] * -2.0
    out[6] = out[2] * -3.0
    return out / (4.0 * 32.0)


def test_input_index_clamps():
    np.testing.assert_array_equal(generate_input_index(0, 7, 9),
                                  [0, 0, 0, 0, 1, 2, 3])
    np.testing.assert_array_equal(generate_input_index(9, 7, 9),
                                  [6, 7, 8, 9, 9, 9, 9])
    np.testing.assert_array_equal(generate_input_index(5, 7, 9),
                                  [2, 3, 4, 5, 6, 7, 8])


def test_mv2mvs_matches_reference(rng):
    mv = np.zeros((6, 8, 3), np.float32)
    mv[..., 0] = rng.randint(-64, 64, (6, 8))
    mv[..., 1] = rng.randint(-64, 64, (6, 8))
    mv[..., 2] = rng.choice([-4, -2, -1, 0], (6, 8))
    ours = mv2mvs(mv)
    ref = reference_mv2mvs(mv)
    np.testing.assert_allclose(np.nan_to_num(ours, posinf=1e9, neginf=-1e9),
                               np.nan_to_num(ref, posinf=1e9, neginf=-1e9))


def test_modify_mv_edges():
    mvs = np.ones((7, 2, 2, 2), np.float32)
    for i in range(7):
        mvs[i] = i + 1
    out = modify_mv_for_end_frames(0, mvs.copy(), 100)
    assert (out[0] == 0).all() and (out[1] == 0).all() and (out[2] == 0).all()
    out = modify_mv_for_end_frames(1, mvs.copy(), 100)
    assert (out[0] == 3).all() and (out[1] == 3).all()
    out = modify_mv_for_end_frames(99, mvs.copy(), 100)
    assert (out[4] == 0).all() and (out[5] == 0).all() and (out[6] == 0).all()
    out = modify_mv_for_end_frames(98, mvs.copy(), 100)
    assert (out[5] == 5).all() and (out[6] == 5).all()


def test_augment_mv_roundtrip(rng):
    mv = rng.randn(7, 4, 6, 2).astype(np.float32)
    # hflip twice = identity
    out = augment_mv(augment_mv(mv, True, False, False), True, False, False)
    np.testing.assert_allclose(out, mv)
    out = augment_mv(augment_mv(mv, False, True, False), False, True, False)
    np.testing.assert_allclose(out, mv)


def test_charbonnier_matches_torch(rng):
    x = rng.randn(2, 8, 8, 1).astype(np.float32)
    y = rng.randn(2, 8, 8, 1).astype(np.float32)
    ours = float(charbonnier_loss(jnp.asarray(x), jnp.asarray(y)))
    xt, yt = torch.from_numpy(x), torch.from_numpy(y)
    diff = xt - yt
    ref = float(torch.sum(torch.sqrt(diff * diff + 1e-4)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_total_variation_matches_torch(rng):
    x = rng.randn(2, 1, 8, 8).astype(np.float32)
    xt = torch.from_numpy(x)
    hor = xt[..., :-1, :] - xt[..., 1:, :]
    ver = xt[..., :-1] - xt[..., 1:]
    ref = float(torch.sum(torch.abs(hor)) + torch.sum(torch.abs(ver)))
    ours = float(total_variation(jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)
