"""NIQE — Natural Image Quality Evaluator (numpy, float64).

Reimplements the reference's torch version (`/root/reference/metric/niqe.py`
— MSCN normalisation `:800-812`, GGD/AGGD fits `:814-894`, 96x96 blockproc
`:634-684`, two scales with MATLAB bicubic 0.5x between them `:1171-1178`,
MVG distance `:1182-1191`) against the pristine-model parameters shipped as
``niqe_modelparameters.mat`` (loaded at `:1212`).

The .mat path is an argument — the framework ships no binary blobs.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np

from .matlab import fspecial_gaussian, imfilter_replicate, imresize

_GAMMA_RANGE = np.arange(0.2, 10.001, 0.001)
_GAMMA_R = None


def _r_gam_table():
    global _GAMMA_R
    if _GAMMA_R is None:
        from scipy.special import gamma
        g = _GAMMA_RANGE
        _GAMMA_R = (gamma(2 / g) ** 2) / (gamma(1 / g) * gamma(3 / g))
    return _GAMMA_R


def estimate_aggd_param(block: np.ndarray) -> Tuple[float, float, float]:
    """Asymmetric GGD fit (`metric/niqe.py:843-894`): (alpha, beta_l, beta_r)."""
    from scipy.special import gamma

    block = block.flatten()
    left = block[block < 0]
    right = block[block > 0]
    left_std = np.sqrt(np.mean(left ** 2)) if left.size else 0.0
    right_std = np.sqrt(np.mean(right ** 2)) if right.size else 0.0
    gammahat = left_std / right_std if right_std > 0 else np.inf
    rhat = (np.mean(np.abs(block)) ** 2) / np.mean(block ** 2) \
        if np.mean(block ** 2) > 0 else 0.0
    rhatnorm = (rhat * (gammahat ** 3 + 1) * (gammahat + 1)) / \
        ((gammahat ** 2 + 1) ** 2) if np.isfinite(gammahat) else 0.0
    r_gam = _r_gam_table()
    idx = np.argmin((r_gam - rhatnorm) ** 2)
    alpha = _GAMMA_RANGE[idx]
    beta_l = left_std * np.sqrt(gamma(1 / alpha) / gamma(3 / alpha))
    beta_r = right_std * np.sqrt(gamma(1 / alpha) / gamma(3 / alpha))
    return float(alpha), float(beta_l), float(beta_r)


def compute_feature(block: np.ndarray) -> np.ndarray:
    """18 NIQE features per block (`metric/niqe.py:1080-1112`)."""
    from scipy.special import gamma

    feat = []
    alpha, beta_l, beta_r = estimate_aggd_param(block)
    feat.extend([alpha, (beta_l + beta_r) / 2])
    shifts = [(0, 1), (1, 0), (1, 1), (1, -1)]
    for sh in shifts:
        shifted = np.roll(block, sh, axis=(0, 1))
        alpha, beta_l, beta_r = estimate_aggd_param(block * shifted)
        mean = (beta_r - beta_l) * (gamma(2 / alpha) / gamma(1 / alpha))
        feat.extend([alpha, mean, beta_l, beta_r])
    return np.asarray(feat, np.float64)


def mscn_and_sigma(img: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """MSCN coefficients + the local sigma field: 7x7 gaussian (sigma 7/6),
    replicate padding. The sigma field drives the pristine-model block
    sharpness selection (`fit.py`)."""
    kernel = fspecial_gaussian(7, 7.0 / 6.0)
    mu = imfilter_replicate(img, kernel)
    sigma = np.sqrt(np.abs(imfilter_replicate(img * img, kernel) - mu * mu))
    return (img - mu) / (sigma + 1.0), sigma


def normalize_img_with_gauss(img: np.ndarray) -> np.ndarray:
    """MSCN coefficients: 7x7 gaussian (sigma 7/6), replicate padding."""
    return mscn_and_sigma(img)[0]


def niqe(img: np.ndarray, mu_pris: np.ndarray, cov_pris: np.ndarray,
         block_size: int = 96) -> float:
    """img: (H, W) float64 in [0, 255]."""
    h, w = img.shape
    nbh = h // block_size
    nbw = w // block_size
    img = img[: nbh * block_size, : nbw * block_size]

    feats = []
    for scale in (1, 2):
        bs = block_size // scale
        norm = normalize_img_with_gauss(img)
        scale_feats = []
        for by in range(nbh):
            for bx in range(nbw):
                block = norm[by * bs:(by + 1) * bs, bx * bs:(bx + 1) * bs]
                scale_feats.append(compute_feature(block))
        feats.append(np.stack(scale_feats))
        if scale == 1:
            img = imresize(img / 255.0, 0.5, antialiasing=True) * 255.0
    feats = np.concatenate(feats, axis=1)  # (num_blocks, 36)

    mu_dist = np.nanmean(feats, axis=0)
    good = ~np.isnan(feats).any(axis=1)
    cov_dist = np.cov(feats[good], rowvar=False)
    invcov = np.linalg.pinv((cov_pris + cov_dist) / 2)
    diff = (mu_pris - mu_dist)[None]
    quality = (diff @ invcov @ diff.T).item()
    return float(np.sqrt(quality))


def calculate_niqe(img: np.ndarray, params_path: str,
                   crop_border: int = 0) -> float:
    """img: (H, W) or (H, W, 1|3) uint8/float [0,255] (BGR if color)."""
    import scipy.io

    params = scipy.io.loadmat(params_path)
    mu_pris = np.ravel(params["mu_prisparam"]).astype(np.float64)
    cov_pris = params["cov_prisparam"].astype(np.float64)

    img = np.asarray(img, np.float64)
    if img.ndim == 3 and img.shape[2] == 3:
        from .psnr_ssim import bgr2ycbcr
        img = bgr2ycbcr((img / 255.0).astype(np.float32), y_only=True) * 255.0
        img = np.asarray(img, np.float64)
    elif img.ndim == 3:
        img = img[:, :, 0]
    img = np.round(img)
    if crop_border:
        img = img[crop_border:-crop_border, crop_border:-crop_border]
    return niqe(img, mu_pris, cov_pris)
