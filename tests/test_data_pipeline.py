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
    """Streaming-built per-array memmap cache: build -> reload -> values
    equal the RAM loader's; arrays are TRUE memmaps (np.memmap), so the
    real ~50 GB CVCP set never has to fit in RAM."""
    root, names = tree
    cfg = DataConfig(frames_per_seq=10)
    cache = str(tmp_path / "cache_dir")
    ds_ram = CVCPDataset(root, cfg, seq_names=names)
    ds1 = CVCPDataset(root, cfg, seq_names=names, cache_path=cache)
    ds2 = CVCPDataset(root, cfg, seq_names=names, cache_path=cache)
    assert isinstance(ds2.lr, np.memmap)
    for name in ("lr", "hr", "pm", "rm", "uf", "mv0", "mv1", "qp"):
        np.testing.assert_array_equal(np.asarray(getattr(ds_ram, name)),
                                      np.asarray(getattr(ds2, name)))
        np.testing.assert_array_equal(np.asarray(getattr(ds1, name)),
                                      np.asarray(getattr(ds2, name)))


def test_batch_has_qp_channel(tree):
    """Per-frame QP modality (/52 — `opt/data_LD_bi.py:218,350`); zeros
    when the QP .npy is absent, as the reference de facto serves (its
    loader line is commented out)."""
    root, names = tree
    cfg = DataConfig(frames_per_seq=10)
    ds = CVCPDataset(root, cfg, seq_names=names)
    batch = TrainBatcher(ds, batch_size=2, crop=32).sample_batch()
    assert batch["qp"].shape == (2, 7)
    np.testing.assert_array_equal(batch["qp"], 0.0)


def test_vimeo_layout(tmp_path):
    """Vimeo90K clip/subclip grammar with im1..imN naming
    (`opt/data_LD_Vimeo.py`)."""
    import os
    from cdfo_tpu.data.variants import FramePairDataset

    r = np.random.RandomState(0)
    for kind in ("lr", "hr"):
        sc = 1 if kind == "lr" else 4
        for clip in ("00001", "00002"):
            for sub in ("0266", "0268"):
                d = tmp_path / kind / clip / sub
                os.makedirs(d)
                for i in range(1, 8):
                    from cdfo_tpu.data.io import write_gray
                    write_gray(str(d / f"im{i}.png"),
                               r.randint(0, 255, (24 * sc, 32 * sc),
                                         dtype=np.uint8))
    ds = FramePairDataset(str(tmp_path / "lr"), str(tmp_path / "hr"),
                          ["00001", "00002"], frames_per_seq=7,
                          layout="vimeo")
    assert len(ds) == 4                      # clips expanded to subclips
    assert ds.lr.shape == (4, 7, 24, 32)
    assert ds.hr.shape == (4, 7, 96, 128)


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
