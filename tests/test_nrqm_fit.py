"""`fit_nrqm_forest` (VERDICT r4 Missing #2): train the 3-forest +
linear-blend NRQM model on a synthetic quality-graded corpus, write the
official .mat layout, and score THROUGH the production loader — the
same un-gating story as the ILNIQE template fit."""
import numpy as np
import pytest

from cdfo_tpu.metrics.fit import fit_nrqm_forest, save_nrqm_model

pytestmark = pytest.mark.slow


def _corpus(n, seed, h=64, w=64):
    """Images at graded blur levels; MOS = sharpness grade."""
    from scipy.ndimage import gaussian_filter

    r = np.random.RandomState(seed)
    imgs, mos = [], []
    for i in range(n):
        base = gaussian_filter(r.rand(h, w) * 255.0, 1.0)
        base += 40.0 * np.sin(np.arange(w) / 3.0)[None, :]
        sigma = (i % 4) * 0.8          # 4 quality grades
        img = gaussian_filter(base, sigma) if sigma else base
        imgs.append(np.clip(img, 0, 255))
        mos.append(8.0 - 2.0 * (i % 4))  # sharper = higher score
    return imgs, np.asarray(mos)


def test_fit_nrqm_forest_roundtrip_and_ranks(tmp_path):
    from cdfo_tpu.metrics.nrqm import calculate_nrqm, load_nrqm_params

    imgs, mos = _corpus(24, seed=0)
    model = fit_nrqm_forest(imgs, mos, n_trees=12, seed=0)
    path = str(tmp_path / "NRQM_model.mat")
    save_nrqm_model(path, model)

    # the PRODUCTION loader must read the fitted .mat
    linear, rfs = load_nrqm_params(path)
    assert np.asarray(linear).size == 4 and len(rfs) == 3

    # held-out images: fitted NRQM must rank sharp above blurred
    test_imgs, test_mos = _corpus(8, seed=123)
    scores = [calculate_nrqm(im, path) for im in test_imgs]
    corr = np.corrcoef(scores, test_mos)[0, 1]
    assert corr > 0.7, (corr, scores, test_mos)


def test_pi_end_to_end_with_fitted_models(tmp_path):
    """PI = 0.5((10-NRQM)+NIQE) runs with BOTH models fitted locally —
    no official binaries anywhere in the chain."""
    import scipy.io

    from cdfo_tpu.metrics.fit import fit_niqe_params
    from cdfo_tpu.metrics.nrqm import calculate_pi

    imgs, mos = _corpus(16, seed=1, h=112, w=112)
    nrqm_path = str(tmp_path / "NRQM_model.mat")
    save_nrqm_model(nrqm_path, fit_nrqm_forest(imgs, mos, n_trees=8,
                                               seed=0))
    pristine = [im for im, m in zip(imgs, mos) if m == 8.0]
    mu, cov = fit_niqe_params(pristine, block_size=48)
    niqe_path = str(tmp_path / "niqe_params.mat")
    scipy.io.savemat(niqe_path, {"mu_prisparam": mu.reshape(1, -1),
                                 "cov_prisparam": cov})

    pi = calculate_pi(imgs[0], niqe_path, nrqm_params_path=nrqm_path,
                      crop_border=0)
    assert np.isfinite(pi)
