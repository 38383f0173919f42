"""ILNIQE pipeline tests (the reference's ILNIQE is unrunnable: NameError
helpers + no template params in tree; ours is the repaired capability,
tested with synthetic template statistics)."""
import numpy as np
import pytest

from cdfo_tpu.metrics.ilniqe import fitweibull, ilniqe, _construct_log_gabor


def test_fitweibull_recovers_params(rng):
    # weibull(k=2, lam=1.5) samples via inverse transform
    u = rng.rand(20000)
    x = 1.5 * (-np.log(1 - u)) ** (1 / 2.0)
    k, lam = fitweibull(x)
    np.testing.assert_allclose(k, 2.0, rtol=0.05)
    np.testing.assert_allclose(lam, 1.5, rtol=0.05)


def test_log_gabor_filters():
    filters = _construct_log_gabor((64, 64))
    assert len(filters) == 12  # 3 scales x 4 orientations
    for f in filters:
        assert f.shape == (64, 64)
        assert np.isfinite(f).all()
        assert f.max() <= 1.0 + 1e-9


def test_ilniqe_pipeline_runs(rng):
    img = rng.randint(0, 255, (168, 168, 3)).astype(np.float64)
    nfeat = 468  # 234 per scale x 2
    pv = np.eye(nfeat)[:, :40]
    mu_sample = np.zeros(nfeat)
    mu_pris = rng.randn(40) * 0.1
    a = rng.randn(40, 80)
    cov_pris = a @ a.T / 80 + np.eye(40)
    score = ilniqe(img, mu_pris, cov_pris, pv, mu_sample, resize=False)
    assert np.isfinite(score) and score > 0


def test_ilniqe_loader_rejects_niqe_params(tmp_path, rng):
    import scipy.io
    from cdfo_tpu.metrics.ilniqe import calculate_ilniqe

    p = str(tmp_path / "niqe.mat")
    scipy.io.savemat(p, {"pop_mu": np.zeros((1, 36)),
                         "pop_cov": np.eye(36)})
    with pytest.raises(KeyError, match="templateModel"):
        calculate_ilniqe(rng.randint(0, 255, (96, 96, 3)), p)
