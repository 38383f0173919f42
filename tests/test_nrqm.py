"""NRQM oracle tests vs the in-tree reference torch implementation.

The reference's trained .mat is absent (hard-coded cluster path,
`metric/nrqm.py:1997`), so — exactly like the round-1 NIQE/BRISQUE oracles
— we verify the full FEATURE machinery numerically against the reference
torch code and exercise the regression stage with synthetic forest
parameters fed to BOTH implementations.
"""
import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

from cdfo_tpu.metrics import nrqm as ours


@pytest.fixture(scope="module")
def ref():
    if "metric" not in sys.modules:
        pkg = types.ModuleType("metric")
        pkg.__path__ = ["/root/reference/metric"]
        sys.modules["metric"] = pkg
    spec = importlib.util.spec_from_file_location(
        "metric.nrqm", "/root/reference/metric/nrqm.py")
    m = importlib.util.module_from_spec(spec)
    sys.modules["metric.nrqm"] = m
    sys.path.insert(0, "/root/reference")
    try:
        spec.loader.exec_module(m)
    finally:
        sys.path.remove("/root/reference")
    return m


@pytest.fixture(scope="module")
def img(rng):
    # structured + noise so features are non-degenerate
    y, x = np.mgrid[0:96, 0:112].astype(np.float64)
    base = 128 + 80 * np.sin(x / 7.0) * np.cos(y / 9.0)
    return np.clip(base + rng.randn(96, 112) * 12, 0, 255)


def t4(a):
    return torch.from_numpy(np.asarray(a, np.float64))[None, None]


def test_gauss_pyramid_matches(ref, img):
    ref_pyr = ref.get_guass_pyramid(t4(img / 255.0))
    our_pyr = ours.gauss_pyramid(img / 255.0)
    assert len(ref_pyr) == len(our_pyr) == 3
    for rp, op in zip(ref_pyr, our_pyr):
        np.testing.assert_allclose(op, rp[0, 0].numpy(), atol=1e-6)


def test_f1_block_dct_matches(ref, img):
    ref_pyr = ref.get_guass_pyramid(t4(img / 255.0))
    ref_f1 = torch.cat([ref.block_dct(im) for im in ref_pyr], dim=1)[0].numpy()
    our_pyr = ours.gauss_pyramid(img / 255.0)
    our_f1 = np.concatenate([ours.block_dct_features(im) for im in our_pyr])
    np.testing.assert_allclose(our_f1, ref_f1, rtol=1e-4, atol=1e-6)


def test_steerable_pyramid_matches(ref, img):
    ref_pyr = ref.SCFpyr_PyTorch(height=2, nbands=6).build(t4(img))
    our_pyr = ours.scf_pyramid(img, height=2, nbands=6)
    # high-pass
    np.testing.assert_allclose(our_pyr[0], ref_pyr[0][0].numpy(),
                               rtol=1e-4, atol=1e-5)
    # orientation bands, both scales (reference stacks (real, imag) last)
    for s in (1, 2):
        for b in range(6):
            rb = ref_pyr[s][b][0].numpy()
            np.testing.assert_allclose(our_pyr[s][b].real, rb[..., 0],
                                       rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(our_pyr[s][b].imag, rb[..., 1],
                                       rtol=1e-4, atol=1e-5)
    # low-pass residual
    np.testing.assert_allclose(our_pyr[3], ref_pyr[3][0].numpy(),
                               rtol=1e-4, atol=1e-5)


def test_f2_global_gsm_matches(ref, img):
    ref_f2 = ref.global_gsm(t4(img))[0].numpy()
    our_f2 = ours.global_gsm_features(img)
    np.testing.assert_allclose(our_f2, ref_f2, rtol=1e-3, atol=1e-4)


def test_f3_svd_matches(ref, img):
    ref_pyr = ref.get_guass_pyramid(t4(img / 255.0))
    ref_f3 = []
    for im in ref_pyr:
        col = ref.im2col(im, 5, "distinct")
        ref_f3.append(torch.linalg.svd(col, full_matrices=False)[1])
    ref_f3 = torch.cat(ref_f3, dim=1)[0].numpy()
    our_pyr = ours.gauss_pyramid(img / 255.0)
    our_f3 = np.concatenate([ours.svd_features(im) for im in our_pyr])
    np.testing.assert_allclose(our_f3, ref_f3, rtol=1e-6, atol=1e-8)


def test_full_nrqm_with_synthetic_forest(ref, img, rng):
    """End-to-end score parity with synthetic random-forest parameters fed
    to BOTH implementations (the official .mat is absent everywhere)."""
    node_num, tree_num = 31, 4
    rf_params = []
    for dim in (18, 45, 75):
        ldau = np.zeros((node_num, tree_num), np.int64)
        rdau = np.zeros((node_num, tree_num), np.int64)
        for n in range(node_num // 2):
            ldau[n] = 2 * n + 2       # 1-based child indices
            rdau[n] = 2 * n + 3
        thr = rng.randn(node_num, tree_num) * 2
        pred = rng.randn(node_num, tree_num) * 5
        attr = rng.randint(1, dim + 1, (node_num, tree_num))
        rf_params.append([ldau, rdau, thr, pred, attr])
    linear = rng.randn(4, 1)

    ref_score = ref.nrqm(t4(img), linear, rf_params)
    f1, f2, f3 = ours.nrqm_features(img)
    our_score = ours.nrqm_from_features(f1, f2, f3, linear, rf_params)
    np.testing.assert_allclose(our_score, float(ref_score), rtol=1e-5)


def test_pi_formula(monkeypatch, img):
    import cdfo_tpu.metrics.nrqm as mod

    monkeypatch.setattr(
        mod, "calculate_niqe",
        lambda *a, **k: 6.0, raising=False)
    from cdfo_tpu.metrics import niqe as niqe_mod
    monkeypatch.setattr(niqe_mod, "calculate_niqe", lambda *a, **k: 6.0)
    pi = mod.calculate_pi(img, "unused", nrqm_score=7.0)
    assert abs(pi - 0.5 * ((10 - 7.0) + 6.0)) < 1e-9


def test_nrqm_requires_params(img):
    with pytest.raises(FileNotFoundError):
        ours.calculate_nrqm(img, params_path=None)
