"""Dataset-specific PSNR/SSIM/tOF drivers (`metric/psnr_ssim.py:490-652`)
on fixture trees mirroring each dataset's frame naming and count rules."""
import os

import numpy as np
import pytest

from cdfo_tpu.metrics import (
    cal_psnr_ssim_tof_cvcp,
    cal_psnr_ssim_tof_reds,
    cal_psnr_ssim_tof_vid4,
    calculate_psnr,
    calculate_ssim,
    calculate_tof,
)

cv2 = pytest.importorskip("cv2")


def _write(path, img):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if img.ndim == 3:  # write RGB array as a colour PNG (cv2 wants BGR)
        assert cv2.imwrite(path, img[..., ::-1])
    else:
        assert cv2.imwrite(path, img)


def _make_tree(root, seq, frames, idx_fmt, shape, seed=0):
    r = np.random.RandomState(seed)
    res_imgs, gt_imgs = [], []
    base = r.randint(0, 235, shape).astype(np.uint8)
    for i in range(frames):
        # correlated noisy pairs so PSNR/SSIM/Farneback are non-degenerate
        gt = np.clip(base.astype(int) + r.randint(-10, 10, shape), 0,
                     255).astype(np.uint8)
        res = np.clip(gt.astype(int) + r.randint(-12, 12, shape), 0,
                      255).astype(np.uint8)
        _write(os.path.join(root, "res", seq, idx_fmt % i + ".png"), res)
        _write(os.path.join(root, "gt", seq, idx_fmt % i + ".png"), gt)
        res_imgs.append(res)
        gt_imgs.append(gt)
    return res_imgs, gt_imgs


def _manual(res_imgs, gt_imgs):
    """Reference accounting: frame-0 tOF term vs itself (zero) INCLUDED,
    all three normalised by the frame count."""
    frames = len(res_imgs)
    psnr = ssim = tof = 0.0
    prev_res, prev_gt = res_imgs[0], gt_imgs[0]
    for res, gt in zip(res_imgs, gt_imgs):
        psnr += calculate_psnr(res, gt, 4, test_y_channel=True)
        ssim += calculate_ssim(res, gt, 4, test_y_channel=True)
        tof += calculate_tof(gt, res, prev_gt, prev_res)
        prev_res, prev_gt = res, gt
    return psnr / frames, ssim / frames, tof / frames


def test_cvcp_driver_matches_manual(tmp_path):
    root = str(tmp_path)
    seq = "LD_Johnny_005F.yuv"  # [-8:-5] == '005'
    res_imgs, gt_imgs = _make_tree(root, seq, 5, "%05d", (40, 48))
    out = cal_psnr_ssim_tof_cvcp(os.path.join(root, "res") + os.sep, [seq],
                                 [seq], os.path.join(root, "gt") + os.sep)
    psnr, ssim, tof = _manual(res_imgs, gt_imgs)
    assert out[0] == "%.3f" % psnr
    assert out[1] == "%.5f" % ssim
    assert out[2] == "%.5f" % tof
    assert out[3] == pytest.approx(psnr)
    # the frame-0 self-pair tOF term is INCLUDED in the frames-count mean
    # (reference `:518-524`); the generic driver skips it and divides by
    # frames-1 — on the same tree the two normalisations must agree once
    # the frame-0 term is moved across
    from cdfo_tpu.metrics import cal_psnr_ssim_tof
    generic = cal_psnr_ssim_tof(os.path.join(root, "res"), [seq], [seq],
                                os.path.join(root, "gt"))
    t0 = calculate_tof(gt_imgs[0], res_imgs[0], gt_imgs[0], res_imgs[0])
    assert generic[0][3] == pytest.approx((tof * 5 - t0) / 4, rel=1e-6)


def test_reds_driver_rgb_quirk(tmp_path):
    root = str(tmp_path)
    seq = "000"
    res_imgs, gt_imgs = _make_tree(root, seq, 100, "%08d", (24, 24, 3),
                                   seed=1)
    out = cal_psnr_ssim_tof_reds(os.path.join(root, "res") + os.sep, [seq],
                                 [seq], os.path.join(root, "gt") + os.sep)
    psnr, ssim, tof = _manual(res_imgs, gt_imgs)
    assert out[0] == "%.3f" % psnr
    assert out[1] == "%.5f" % ssim
    assert out[2] == "%.5f" % tof


def test_vid4_city_frame_count(tmp_path):
    root = str(tmp_path)
    # only the 34 frames the reference reads for 'city' exist on disk —
    # the driver must not look past them (`metric/psnr_ssim.py:596-603`)
    res_imgs, gt_imgs = _make_tree(root, "city", 34, "%08d", (32, 32),
                                   seed=2)
    out = cal_psnr_ssim_tof_vid4(os.path.join(root, "res") + os.sep,
                                 ["city"], ["city"],
                                 os.path.join(root, "gt") + os.sep)
    psnr, _, _ = _manual(res_imgs, gt_imgs)
    assert out[0] == "%.3f" % psnr


def test_rgb_y_conversion_mirrors_reference_quirk(tmp_path):
    """The reference feeds PIL-RGB arrays through a BGR-assuming
    to_y_channel (`metric/psnr_ssim.py:211-213` vs the PIL loads at
    `:505-510`); our driver reads in PIL order so the scores match the
    reference bit-for-bit, R/B swap and all."""
    from cdfo_tpu.metrics import bgr2ycbcr
    r = np.random.RandomState(3)
    rgb = r.randint(0, 255, (16, 16, 3)).astype(np.uint8)
    # Y as the reference computes it for a PIL-loaded (RGB) image
    y_ref = bgr2ycbcr(rgb.astype(np.float32) / 255.0, y_only=True)
    # the correct BT.601 Y of that image (coefficients on the right chans)
    from cdfo_tpu.metrics import rgb2ycbcr
    y_true = rgb2ycbcr(rgb.astype(np.float32) / 255.0, y_only=True)
    assert not np.allclose(y_ref, y_true)  # the quirk is real
    from cdfo_tpu.metrics.psnr_ssim import to_y_channel
    assert np.allclose(to_y_channel(rgb), y_ref[..., None] * 255.0,
                       atol=1e-3)
