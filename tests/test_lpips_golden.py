"""LPIPS score-level parity vs the in-tree richzhang code.

The environment ships no torchvision/ImageNet weights, so the trunks run
with RANDOM weights copied into both implementations (pnet_rand=True) and
the linear heads load from the reference's SHIPPED v0.1 .pth files — the
full scoring pipeline (scaling layer, trunk taps, unit-normalise, squared
diff, heads, spatial average, sum) is verified end to end for all three
trunks including squeeze.
"""
import importlib
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from cdfo_tpu.metrics.lpips import LPIPS, load_torch_weights

from ref_oracle import _install_shims

HEADS = "/root/reference/opt/weights/v0.1/{net}.pth"


@pytest.fixture(scope="module")
def ref_lpips_mod():
    _install_shims()
    if "lpips" not in sys.modules:
        stub = types.ModuleType("lpips")

        def normalize_tensor(in_feat, eps=1e-10):
            norm = torch.sqrt(torch.sum(in_feat ** 2, dim=1, keepdim=True))
            return in_feat / (norm + eps)

        def voc_ap(rec, prec):
            mrec = np.concatenate(([0.0], rec, [1.0]))
            mpre = np.concatenate(([0.0], prec, [0.0]))
            for i in range(mpre.size - 1, 0, -1):
                mpre[i - 1] = max(mpre[i - 1], mpre[i])
            idx = np.where(mrec[1:] != mrec[:-1])[0]
            return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))

        stub.normalize_tensor = normalize_tensor
        stub.voc_ap = voc_ap
        stub.tensor2im = lambda t: t.numpy()
        sys.modules["lpips"] = stub
    if "opt" not in sys.modules:
        pkg = types.ModuleType("opt")
        pkg.__path__ = ["/root/reference/opt"]
        sys.modules["opt"] = pkg
    return importlib.import_module("opt.lpips.loss")


def _copy_trunk(ref_net, params, net):
    """Copy the torch trunk's (random) weights into our flax tree."""
    p = jax.tree.map(np.asarray, params)
    tp = p["params"]["net"]
    sd = {k: v.detach().numpy() for k, v in ref_net.state_dict().items()}
    if net in ("vgg", "alex"):
        conv_keys = sorted(
            (k for k in sd if k.endswith(".weight")),
            key=lambda k: int(k.split(".")[1]))
        for i, k in enumerate(conv_keys):
            tp[f"conv{i}"]["kernel"] = sd[k].transpose(2, 3, 1, 0)
            tp[f"conv{i}"]["bias"] = sd[k[:-6] + "bias"]
    else:  # squeeze: conv0 + 8 fires at tv indices 3,4,6,7,9,10,11,12
        tp["conv0"]["kernel"] = sd["slice1.0.weight"].transpose(2, 3, 1, 0)
        tp["conv0"]["bias"] = sd["slice1.0.bias"]
        tv_idx = [3, 4, 6, 7, 9, 10, 11, 12]
        slice_of = {3: 2, 4: 2, 6: 3, 7: 3, 9: 4, 10: 5, 11: 6, 12: 7}
        for i, ti in enumerate(tv_idx):
            base = f"slice{slice_of[ti]}.{ti}"
            for ours, theirs in (("squeeze", "squeeze"),
                                 ("expand1", "expand1x1"),
                                 ("expand3", "expand3x3")):
                tp[f"fire{i}"][ours]["kernel"] = sd[
                    f"{base}.{theirs}.weight"].transpose(2, 3, 1, 0)
                tp[f"fire{i}"][ours]["bias"] = sd[f"{base}.{theirs}.bias"]
    return jax.tree.map(jnp.asarray, p)


@pytest.mark.parametrize("net", ["vgg", "alex", "squeeze"])
def test_lpips_score_matches_reference(ref_lpips_mod, net, rng):
    torch.manual_seed(0)
    ref = ref_lpips_mod.LPIPS(pretrained=True, net=net, pnet_rand=True,
                              model_path=HEADS.format(net=net),
                              verbose=False)
    ref.eval()

    x = (rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1)
    y = np.clip(x + rng.randn(2, 64, 64, 3).astype(np.float32) * 0.15, -1, 1)

    model = LPIPS(net=net)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(y))
    params = load_torch_weights(params, heads_path=HEADS.format(net=net),
                                net=net)
    params = _copy_trunk(ref.net, params, net)

    ours = np.asarray(model.apply(params, jnp.asarray(x), jnp.asarray(y)))
    with torch.no_grad():
        theirs = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                     torch.from_numpy(y.transpose(0, 3, 1, 2)))
    theirs = theirs.numpy().reshape(-1)
    np.testing.assert_allclose(ours.reshape(-1), theirs, rtol=1e-4, atol=1e-5)
