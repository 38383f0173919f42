"""Data pipeline tests over a synthetic CVCP tree."""
import numpy as np
import pytest

from cdfo_tpu.config import DataConfig
from cdfo_tpu.data import CVCPDataset, TrainBatcher, make_synthetic_cvcp_tree
from cdfo_tpu.data.io import load_eval_sequence, pad_270_to_272


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cvcp"))
    names = make_synthetic_cvcp_tree(root, num_seqs=2, frames=10, h=72, w=96)
    return root, names


def test_dataset_preload_shapes(tree):
    root, names = tree
    cfg = DataConfig(frames_per_seq=10)
    ds = CVCPDataset(root, cfg, seq_names=names)
    assert ds.lr.shape == (2, 10, 72, 96)
    assert ds.hr.shape == (2, 10, 288, 384)
    assert ds.mv0.shape == (2, 10, 72, 96, 3)
    assert ds.rm.dtype == np.int8


def test_dataset_cache_roundtrip(tree, tmp_path):
    root, names = tree
    cfg = DataConfig(frames_per_seq=10)
    cache = str(tmp_path / "cache.npz")
    ds1 = CVCPDataset(root, cfg, seq_names=names, cache_path=cache)
    ds2 = CVCPDataset(root, cfg, seq_names=names, cache_path=cache)
    np.testing.assert_array_equal(np.asarray(ds1.lr), np.asarray(ds2.lr))
    np.testing.assert_array_equal(np.asarray(ds1.mv1), np.asarray(ds2.mv1))


def test_batcher_shapes_and_ranges(tree):
    root, names = tree
    cfg = DataConfig(frames_per_seq=10)
    ds = CVCPDataset(root, cfg, seq_names=names)
    batcher = TrainBatcher(ds, batch_size=3, crop=32)
    batch = batcher.sample_batch()
    assert batch["lrs"].shape == (3, 7, 32, 32, 1)
    assert batch["hr"].shape == (3, 128, 128, 1)
    assert batch["mvs1"].shape == (3, 7, 32, 32, 2)
    assert 0.0 <= batch["lrs"].min() and batch["lrs"].max() <= 1.0
    # LD quirk: mvl1 flows zeroed
    assert np.all(batch["mvs1"] == 0)
    assert not np.all(batch["mvs0"] == 0)
    # MV scale: int8 field / (-refoff=1) / 4 / 32 -> max 127/128
    assert np.abs(batch["mvs0"]).max() <= 127.0 / 128.0 * 3 + 1e-6


def test_batcher_real_mvl1(tree):
    root, names = tree
    cfg = DataConfig(frames_per_seq=10, zero_mvl1_in_train=False)
    ds = CVCPDataset(root, cfg, seq_names=names)
    batch = TrainBatcher(ds, batch_size=2, crop=32).sample_batch()
    assert not np.all(batch["mvs1"] == 0)


def test_host_sharding(tree):
    root, names = tree
    cfg = DataConfig(frames_per_seq=10)
    ds0 = CVCPDataset(root, cfg, seq_names=names, host_id=0, num_hosts=2)
    ds1 = CVCPDataset(root, cfg, seq_names=names, host_id=1, num_hosts=2)
    assert len(ds0) == 1 and len(ds1) == 1
    assert ds0.seq_names != ds1.seq_names


def test_eval_sequence_loader(tree):
    root, names = tree
    # lay out an eval-style tree from the training tree pieces
    import os
    import shutil
    seq = names[0]
    base = os.path.join(root, "eval")
    lr_src = os.path.join(root, "Decoded_LR", "LD", "QP37",
                          f"LD_{seq}_32F_QP37.yuv")
    pri = os.path.join(root, "Coding_Priors", "LD", "QP37",
                       f"LD_{seq}_32F_QP37.priors")
    unf = os.path.join(root, "pred_unfiltered_LD", "QP37",
                       f"LD_{seq}_32F_QP37.priors", "pred_unfiltered")
    side = os.path.join(base, "side", seq)
    os.makedirs(side, exist_ok=True)
    shutil.copytree(lr_src, os.path.join(base, "lr", seq + ".yuv"))
    shutil.copytree(os.path.join(pri, "Partition_Map"), os.path.join(side, "part_m"))
    shutil.copytree(os.path.join(pri, "Residue"), os.path.join(side, "res"))
    shutil.copytree(os.path.join(pri, "MV_l0"), os.path.join(side, "mvl0"))
    shutil.copytree(os.path.join(pri, "MV_l1"), os.path.join(side, "mvl1"))
    os.makedirs(os.path.join(side, "unfiltered"), exist_ok=True)
    for f in os.listdir(unf):
        shutil.copy(os.path.join(unf, f), os.path.join(side, "unfiltered", f))
    # rename prior files to eval naming (already *_mvl0 etc. — same)
    data = load_eval_sequence(os.path.join(base, "lr", seq + ".yuv"), side,
                              max_frames=5)
    assert data.lr.shape == (5, 72, 96)
    assert data.mvl0.shape == (5, 72, 96, 3)


def test_pad_270():
    img = np.ones((270, 480), np.float32)
    out = pad_270_to_272(img)
    assert out.shape == (272, 480)
    assert (out[-2:] == 0).all()
    img2 = np.ones((272, 480), np.float32)
    assert pad_270_to_272(img2).shape == (272, 480)
