"""Pristine-model fitting (metrics/fit.py): NIQE params + ILNIQE template
fitted from synthetic pristine sets, saved in the official .mat layouts,
and shown to rank a clean image above a heavily-degraded one. This
un-gates ILNIQE scoring end-to-end (the reference ships neither the
template nor any way to produce one)."""
import numpy as np

from cdfo_tpu.metrics.fit import (fit_ilniqe_template, fit_niqe_params,
                                  save_ilniqe_template, save_niqe_params)
from cdfo_tpu.metrics.matlab import fspecial_gaussian, imfilter


def _naturalish(rng, h, w, c=None):
    """Smoothed low-pass noise with mild texture — a stand-in for pristine
    natural content (heavy-tailed MSCN stats, unlike raw white noise)."""
    shape = (h, w) if c is None else (h, w, c)
    base = rng.rand(*shape)
    k = fspecial_gaussian(11, 2.0)
    kf = fspecial_gaussian(3, 0.8)
    fine = 0.15 * (rng.rand(h, w) - 0.5)
    if c is None:
        img = imfilter(base, k, "edge") + imfilter(fine, kf, "edge")
    else:
        img = (np.stack([imfilter(base[..., i], k, "edge")
                         for i in range(c)], -1)
               + imfilter(fine, kf, "edge")[..., None])
    img = img - img.min()
    return img / (img.max() + 1e-9) * 255.0


def test_fit_niqe_params_and_ordering(rng, tmp_path):
    from cdfo_tpu.metrics.niqe import calculate_niqe

    pristine = [_naturalish(rng, 192, 192) for _ in range(6)]
    mu, cov = fit_niqe_params(pristine, block_size=96)
    assert mu.shape == (36,) and cov.shape == (36, 36)
    assert np.isfinite(mu).all() and np.isfinite(cov).all()
    # symmetric PSD-ish covariance
    np.testing.assert_allclose(cov, cov.T, atol=1e-12)

    p = str(tmp_path / "niqe_fit.mat")
    save_niqe_params(p, mu, cov)

    clean = _naturalish(rng, 192, 192)
    noisy = np.clip(clean + rng.randn(192, 192) * 60.0, 0, 255)
    s_clean = calculate_niqe(clean.astype(np.uint8), p)
    s_noisy = calculate_niqe(noisy.astype(np.uint8), p)
    assert np.isfinite(s_clean) and np.isfinite(s_noisy)
    assert s_noisy > s_clean, (s_noisy, s_clean)


def test_fit_ilniqe_template_and_ordering(rng, tmp_path):
    import scipy.io
    from cdfo_tpu.metrics.ilniqe import ilniqe

    pristine = [_naturalish(rng, 168, 168, 3) for _ in range(4)]
    tpl = fit_ilniqe_template(pristine, resize=False)
    k = tpl["mu_pris"].shape[0]
    assert tpl["principle_vectors"].shape == (468, k)
    assert tpl["cov_pris"].shape == (k, k)
    assert np.isfinite(tpl["mean_of_sample"]).all()

    # .mat round trip in the official templateModel cell layout
    p = str(tmp_path / "ilniqe_template.mat")
    save_ilniqe_template(p, tpl)
    tm = scipy.io.loadmat(p)["templateModel"]
    np.testing.assert_allclose(np.ravel(tm[0][0]), tpl["mu_pris"])
    np.testing.assert_allclose(tm[0][1], tpl["cov_pris"])
    np.testing.assert_allclose(np.ravel(tm[0][2]), tpl["mean_of_sample"])
    np.testing.assert_allclose(tm[0][3], tpl["principle_vectors"])

    clean = _naturalish(rng, 168, 168, 3)
    noisy = np.clip(clean + rng.randn(168, 168, 3) * 60.0, 0, 255)
    s_clean = ilniqe(clean, tpl["mu_pris"], tpl["cov_pris"],
                     tpl["principle_vectors"], tpl["mean_of_sample"],
                     resize=False)
    s_noisy = ilniqe(noisy, tpl["mu_pris"], tpl["cov_pris"],
                     tpl["principle_vectors"], tpl["mean_of_sample"],
                     resize=False)
    assert np.isfinite(s_clean) and np.isfinite(s_noisy)
    assert s_noisy > s_clean, (s_noisy, s_clean)
