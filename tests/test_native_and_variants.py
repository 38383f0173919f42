"""Native C++ batcher equivalence + dataset-variant tests."""
import os
import subprocess

import numpy as np
import pytest

from cdfo_tpu.config import DataConfig
from cdfo_tpu.data import CVCPDataset, TrainBatcher, make_synthetic_cvcp_tree
from cdfo_tpu.data.native import NativeBatcher, available


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cvcp_native"))
    # single sequence, exactly 7 frames, crop == frame size -> deterministic
    names = make_synthetic_cvcp_tree(root, num_seqs=1, frames=7, h=32, w=32)
    return root, names


@pytest.fixture(scope="module", autouse=True)
def build_native():
    if not available():
        subprocess.check_call(["sh", "tools/build_native.sh"])


def test_native_matches_python_batcher(tree):
    root, names = tree
    cfg = DataConfig(frames_per_seq=7)
    ds = CVCPDataset(root, cfg, seq_names=names)
    py = TrainBatcher(ds, batch_size=2, crop=32, augment=False)
    nat = NativeBatcher(ds, batch_size=2, crop=32, augment=False)
    bp = py.sample_batch()
    bn = nat.sample_batch()
    for k in ["lrs", "pms", "rms", "ufs", "hr", "mvs0", "mvs1"]:
        assert bp[k].shape == bn[k].shape, k
        np.testing.assert_allclose(
            np.nan_to_num(bn[k], posinf=1e9, neginf=-1e9),
            np.nan_to_num(bp[k], posinf=1e9, neginf=-1e9),
            rtol=1e-5, atol=1e-6, err_msg=k)


def test_native_augment_runs(tree):
    root, names = tree
    cfg = DataConfig(frames_per_seq=7)
    ds = CVCPDataset(root, cfg, seq_names=names)
    nat = NativeBatcher(ds, batch_size=4, crop=16, augment=True)
    b1 = nat.sample_batch()
    b2 = nat.sample_batch()
    assert not np.allclose(b1["lrs"], b2["lrs"])  # seed advances
    assert np.isfinite(b1["hr"]).all()


def test_lr_batcher_variants(tmp_path):
    from cdfo_tpu.data.variants import (
        FramePairDataset, LRBatcher, make_synthetic_frame_tree, single_mv_batch)

    root = str(tmp_path)
    names = make_synthetic_frame_tree(root, num_seqs=2, frames=8, h=24, w=32)
    ds = FramePairDataset(os.path.join(root, "lr"), os.path.join(root, "hr"),
                          names, frames_per_seq=8)
    b = LRBatcher(ds, batch_size=2, crop=16).sample_batch()
    assert b["lrs"].shape == (2, 7, 16, 16, 1)
    assert b["hr"].shape == (2, 64, 64, 1)
    assert np.all(b["mvs1"] == 0)

    # ETC 13-frame window needs >= 13 frames
    names2 = make_synthetic_frame_tree(root + "_etc", num_seqs=1, frames=13,
                                       h=24, w=32)
    ds2 = FramePairDataset(os.path.join(root + "_etc", "lr"),
                           os.path.join(root + "_etc", "hr"), names2, 13)
    b2 = LRBatcher(ds2, batch_size=1, crop=16, nframes=13,
                   all_gt=True).sample_batch()
    assert b2["lrs"].shape == (1, 13, 16, 16, 1)
    assert b2["hr"].shape == (1, 13, 64, 64, 1)

    sm = single_mv_batch(b)
    np.testing.assert_array_equal(sm["mvs1"], sm["mvs0"])
