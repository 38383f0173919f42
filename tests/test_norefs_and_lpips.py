"""No-reference metrics + LPIPS tests. Oracle tests use the reference's
torch implementations + in-tree weight files; they skip when those are
unavailable (the framework itself ships no blobs)."""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
NIQE_MAT = os.path.join(REF, "metric/weight/niqe_modelparameters.mat")
BRISQUE_PTH = os.path.join(REF, "metric/weight/brisque_svm_weights.pth")
LPIPS_HEADS = os.path.join(REF, "opt/weights/v0.1/vgg.pth")


@pytest.mark.skipif(not os.path.exists(NIQE_MAT), reason="niqe params absent")
def test_niqe_matches_reference_oracle(rng):
    from cdfo_tpu.metrics.niqe import calculate_niqe

    img = (rng.rand(200, 300) * 255).astype(np.uint8)
    ours = calculate_niqe(img, NIQE_MAT)

    sys.path.insert(0, REF)
    try:
        import torch
        from metric.niqe import calculate_niqe as ref_niqe
        t = torch.from_numpy(img[None, None].astype(np.float32)) / 255.0
        ref = float(ref_niqe(t, pretrained_model_path=NIQE_MAT))
    finally:
        sys.path.pop(0)
    np.testing.assert_allclose(ours, ref, rtol=1e-3)


@pytest.mark.skipif(not os.path.exists(NIQE_MAT), reason="niqe params absent")
def test_niqe_orders_quality(rng):
    """Smoothed natural-ish image should score better (lower) than noise."""
    from cdfo_tpu.metrics.niqe import calculate_niqe
    from cdfo_tpu.metrics.matlab import fspecial_gaussian, imfilter

    noise = (rng.rand(192, 192) * 255).astype(np.float64)
    smooth = imfilter(noise, fspecial_gaussian(11, 3.0))
    assert calculate_niqe(smooth, NIQE_MAT) < calculate_niqe(noise, NIQE_MAT)


@pytest.mark.skipif(not os.path.exists(BRISQUE_PTH), reason="svm weights absent")
def test_brisque_matches_reference_oracle(rng):
    from cdfo_tpu.metrics.brisque import calculate_brisque

    img = (rng.rand(200, 300) * 255).astype(np.float32)
    ours = calculate_brisque(img, BRISQUE_PTH)

    sys.path.insert(0, REF)
    try:
        import torch
        from metric.brisque import brisque as ref_brisque
        t = torch.from_numpy(img[None, None]) / 255.0
        ref = float(ref_brisque(t, pretrained_model_path=BRISQUE_PTH))
    finally:
        sys.path.pop(0)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_matlab_imresize_matches_reference_oracle(rng):
    from cdfo_tpu.metrics.matlab import imresize

    img = rng.rand(64, 96)
    ours = imresize(img, 0.5)
    sys.path.insert(0, REF)
    try:
        import torch
        from metric.niqe import imresize as ref_imresize
        ref = ref_imresize(torch.from_numpy(img[None, None]), scale=0.5,
                           antialiasing=True)[0, 0].numpy()
    finally:
        sys.path.pop(0)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-8)


def test_lpips_structure(rng):
    import jax
    from cdfo_tpu.metrics.lpips import LPIPS

    x = rng.rand(1, 32, 32, 3).astype(np.float32) * 2 - 1
    y = np.clip(x + rng.randn(*x.shape).astype(np.float32) * 0.2, -1, 1)
    for net in ("vgg", "alex"):
        model = LPIPS(net=net)
        params = model.init(jax.random.PRNGKey(0), x, x)
        d_same = np.asarray(model.apply(params, x, x))
        d_diff = np.asarray(model.apply(params, x, y))
        np.testing.assert_allclose(d_same, 0.0, atol=1e-6)
        # with random-init heads only the identity-zero property is
        # guaranteed (official heads are non-negative); distance must differ
        assert (np.abs(d_diff) > 1e-8).all()


@pytest.mark.skipif(not os.path.exists(LPIPS_HEADS), reason="heads absent")
def test_lpips_head_loading(rng):
    import jax
    from cdfo_tpu.metrics.lpips import LPIPS, load_torch_weights

    x = rng.rand(1, 32, 32, 3).astype(np.float32)
    model = LPIPS(net="vgg", normalize_input=True)
    params = model.init(jax.random.PRNGKey(0), x, x)
    loaded = load_torch_weights(params, heads_path=LPIPS_HEADS)
    # heads replaced: at least one lin kernel differs from init
    a = np.asarray(params["params"]["lin0"]["kernel"])
    b = np.asarray(loaded["params"]["lin0"]["kernel"])
    assert a.shape == b.shape == (1, 1, 64, 1)
    assert not np.allclose(a, b)
