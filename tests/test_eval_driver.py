"""End-to-end test of the JCT-VC eval driver on a synthetic test tree."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def jctvc_tree(tmp_path_factory):
    from cdfo_tpu.data.io import write_gray

    root = str(tmp_path_factory.mktemp("jctvc"))
    seq = "Johnny_320x184_600F.yuv"
    h, w, t = 184, 320, 3
    r = np.random.RandomState(0)
    lr_dir = f"{root}/LD/qp37/lr_grey/{seq}"
    side = f"{root}/LD/qp37/sideInfo_QP37/{seq[:-4]}"
    gt_dir = f"{root}/gt_Y/Johnny_1280x720_60.yuv"
    for d in ["res", "mvl0", "mvl1"]:
        os.makedirs(f"{side}/{d}", exist_ok=True)
    for i in range(t):
        idx = "%05d" % i
        write_gray(f"{lr_dir}/{idx}.png",
                   r.randint(0, 255, (h, w), dtype=np.uint8))
        write_gray(f"{gt_dir}/{idx}.png",
                   r.randint(0, 255, (h * 4, w * 4), dtype=np.uint8))
        pidx = "%05d" % max(1, i)
        write_gray(f"{side}/part_m/{pidx}_M_mask.png",
                   r.randint(0, 255, (h, w), dtype=np.uint8))
        np.save(f"{side}/res/{pidx}_res.npy",
                r.randint(-20, 20, (h, w)).astype(np.int16))
        write_gray(f"{side}/unfiltered/{pidx}_unflt.png",
                   r.randint(0, 255, (h, w), dtype=np.uint8))
        mv = np.zeros((h, w, 3), np.int16)
        mv[..., 2] = -1
        np.save(f"{side}/mvl0/{pidx}_mvl0.npy", mv)
        np.save(f"{side}/mvl1/{pidx}_mvl1.npy", mv)
    return root, seq


def test_eval_jctvc_driver(jctvc_tree, tmp_path):
    root, seq = jctvc_tree
    out = subprocess.run(
        [sys.executable, "tools/eval_jctvc.py", "--test-root", root,
         "--out", str(tmp_path / "out"), "--log", str(tmp_path / "log.txt"),
         "--sequences", seq, "--max-frames", "3"],
        capture_output=True, text=True, timeout=1200,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert out.returncode == 0, out.stderr[-800:]
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    entry = json.loads(lines[0])
    assert entry["seq"] == seq
    assert 0 < entry["psnr"] < 100
    assert 0 <= entry["ssim"] <= 1
    # SR PNGs written with the 736 -> 720 crop rule
    pngs = os.listdir(tmp_path / "out" / "LD_QP37" / seq)
    assert len(pngs) == 3
    from cdfo_tpu.data.io import read_gray
    img = read_gray(str(tmp_path / "out" / "LD_QP37" / seq / "00000.png"))
    assert img.shape == (720, 1280)
