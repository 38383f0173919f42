"""Pristine-model fitting for the no-reference metrics.

The reference consumes NIQE's ``niqe_modelparameters.mat`` and ILNIQE's
``templateModel`` .mat but ships no way to produce them (the ILNIQE
template is absent from its tree entirely — `metric/niqe.py:1503-1554`
loads a hard-coded path). These fitters implement the published training
procedures (Mittal et al. 2013 for NIQE; Zhang et al. 2015 for IL-NIQE)
on a user-supplied pristine image set, producing parameter files that
:func:`..niqe.calculate_niqe` / :func:`..ilniqe.calculate_ilniqe` load
directly — so both metrics are usable end-to-end without the official
binaries (scores then reflect the user's pristine corpus, not the
official one; for paper-comparable numbers use the official .mat files).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from .ilniqe import ilniqe_features
from .niqe import compute_feature, mscn_and_sigma
from .matlab import imresize


def fit_niqe_params(images: Sequence[np.ndarray], block_size: int = 96,
                    sharpness_threshold: float = 0.75
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Fit the NIQE pristine MVG (mu_prisparam, cov_prisparam).

    Published procedure: per image, compute the local-sigma field at
    scale 1, rank blocks by mean sigma ("sharpness") and keep blocks
    above ``sharpness_threshold * max``; compute the 18 MSCN features
    per kept block at both scales (MATLAB bicubic 0.5x between them);
    fit a multivariate Gaussian over all kept blocks of all images.

    images: grayscale (H, W) arrays in [0, 255] (H, W >= block_size).
    Returns (mu (36,), cov (36, 36)) — the arrays
    ``calculate_niqe(..., params_path)`` reads from the .mat.
    """
    all_feats = []
    for img in images:
        img = np.asarray(img, np.float64)
        h, w = img.shape
        nbh, nbw = h // block_size, w // block_size
        if nbh == 0 or nbw == 0:
            raise ValueError(f"image {img.shape} smaller than one "
                             f"{block_size}x{block_size} block")
        img = img[: nbh * block_size, : nbw * block_size]

        _, sigma = mscn_and_sigma(img)
        sharp = np.array([
            sigma[by * block_size:(by + 1) * block_size,
                  bx * block_size:(bx + 1) * block_size].mean()
            for by in range(nbh) for bx in range(nbw)])
        keep = sharp > sharpness_threshold * sharp.max()

        feats = []
        for scale in (1, 2):
            bs = block_size // scale
            norm = mscn_and_sigma(img)[0]
            feats.append(np.stack([
                compute_feature(
                    norm[by * bs:(by + 1) * bs, bx * bs:(bx + 1) * bs])
                for by in range(nbh) for bx in range(nbw)]))
            if scale == 1:
                img = imresize(img / 255.0, 0.5, antialiasing=True) * 255.0
        all_feats.append(np.concatenate(feats, axis=1)[keep])

    feats = np.concatenate(all_feats, axis=0)
    good = ~np.isnan(feats).any(axis=1)
    mu = np.nanmean(feats, axis=0)
    cov = np.cov(feats[good], rowvar=False)
    return mu, cov


def save_niqe_params(path: str, mu: np.ndarray, cov: np.ndarray) -> None:
    """Write a .mat `calculate_niqe` can load (mu_prisparam/cov_prisparam
    keys, the layout of the official ``niqe_modelparameters.mat``)."""
    import scipy.io

    scipy.io.savemat(path, {"mu_prisparam": np.asarray(mu, np.float64),
                            "cov_prisparam": np.asarray(cov, np.float64)})


def fit_ilniqe_template(images: Sequence[np.ndarray], resize: bool = True,
                        block_size: int = 84,
                        variance_keep: float = 0.9999,
                        n_components: Optional[int] = None
                        ) -> Dict[str, np.ndarray]:
    """Fit the IL-NIQE ``templateModel`` from pristine RGB images.

    Published procedure: extract the per-block quality-aware feature
    vectors from every pristine image (:func:`..ilniqe.ilniqe_features`
    — the identical front half of scoring), learn a PCA basis over them,
    and fit an MVG to the projected features. ``n_components`` overrides
    the ``variance_keep`` cumulative-explained-variance cut.

    images: (H, W, 3) RGB in [0, 255].
    Returns dict(mu_pris (k,), cov_pris (k, k), mean_of_sample (F,),
    principle_vectors (F, k)) — exactly the four ``templateModel`` slots
    ``calculate_ilniqe`` reads.
    """
    feats = np.concatenate([
        ilniqe_features(np.asarray(im, np.float64), resize=resize,
                        block_size=block_size)
        for im in images], axis=0)
    feats = feats[~np.isnan(feats).any(axis=1)]
    if feats.shape[0] < 2:
        raise ValueError("need >= 2 valid pristine blocks to fit a template")

    mean_of_sample = feats.mean(axis=0)
    xc = feats - mean_of_sample[None]
    # PCA via SVD of the centered matrix (F can exceed the block count;
    # eigh on the (F, F) covariance would be rank-deficient and slow)
    _, s, vt = np.linalg.svd(xc, full_matrices=False)
    var = s ** 2
    nz = int(np.sum(var > 1e-12 * var.max()))
    if n_components is None:
        csum = np.cumsum(var) / var.sum()
        n_components = int(np.searchsorted(csum, variance_keep) + 1)
    k = max(1, min(n_components, nz))
    pv = vt[:k].T                                    # (F, k)

    coeffs = xc @ pv                                 # (blocks, k)
    mu_pris = coeffs.mean(axis=0)
    cov_pris = np.cov(coeffs, rowvar=False).reshape(k, k)
    return {"mu_pris": mu_pris, "cov_pris": cov_pris,
            "mean_of_sample": mean_of_sample, "principle_vectors": pv}


def save_ilniqe_template(path: str, template: Dict[str, np.ndarray]) -> None:
    """Write a ``templateModel`` .mat `calculate_ilniqe` can load (the
    official file's cell-array layout: {mu, cov, mean_of_sample, PV})."""
    import scipy.io

    cell = np.empty((1, 4), object)
    cell[0, 0] = np.asarray(template["mu_pris"], np.float64)
    cell[0, 1] = np.asarray(template["cov_pris"], np.float64)
    cell[0, 2] = np.asarray(template["mean_of_sample"], np.float64)
    cell[0, 3] = np.asarray(template["principle_vectors"], np.float64)
    scipy.io.savemat(path, {"templateModel": cell})
