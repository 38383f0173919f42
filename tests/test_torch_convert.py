"""Checkpoint-converter tests: build a synthetic torch state_dict with the
reference's key naming, convert, and verify structural + numerical effects."""
import numpy as np
import jax
import pytest

from cdfo_tpu.compat.torch_convert import convert_state_dict, flax_to_torch_key
from cdfo_tpu.config import ModelConfig
from cdfo_tpu.models import CVSRV8


@pytest.fixture(scope="module")
def template():
    model = CVSRV8(ModelConfig(scn_groups=2, mask_mode="expected"))
    r = np.random.RandomState(0)
    args = tuple(np.asarray(a, np.float32) for a in (
        r.rand(1, 7, 16, 16, 1), r.randn(1, 7, 16, 16, 2),
        r.randn(1, 7, 16, 16, 2), r.rand(1, 7, 16, 16, 1),
        r.rand(1, 7, 16, 16, 1), r.rand(1, 7, 16, 16, 1)))
    params = model.init(jax.random.PRNGKey(0), *args)
    return model, params, args


def synthetic_state_dict(params):
    """Invert the mapping to produce a torch-style dict with random values."""
    sd = {}
    rng = np.random.RandomState(1)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for keypath, leaf in flat:
        path = tuple(k.key for k in keypath)
        p = path[1:] if path[0] == "params" else path
        tkey, transform = flax_to_torch_key(p)
        # produce a torch-layout array whose transform matches leaf shape
        a = np.asarray(leaf)
        if transform.__name__ == "t_conv":
            sd[tkey] = rng.randn(a.shape[3], a.shape[2], a.shape[0],
                                 a.shape[1]).astype(np.float32)
        elif transform.__name__ == "t_convT":
            sd[tkey] = rng.randn(a.shape[2], a.shape[3], a.shape[0],
                                 a.shape[1]).astype(np.float32)
        elif "direct" in tkey and tkey.endswith(".weight"):
            shape = (1, 1, 1, 9) if "W1" in tkey or "H_" in tkey else (1, 1, 9, 1)
            sd[tkey] = rng.randn(*shape).astype(np.float32)
        elif "direct" in tkey and tkey.endswith(".bias"):
            sd[tkey] = rng.randn(1).astype(np.float32)
        else:
            sd[tkey] = rng.randn(*a.shape).astype(np.float32)
    return sd


def test_all_v8_params_covered(template):
    _, params, _ = template
    sd = synthetic_state_dict(params)
    new_params, report = convert_state_dict(sd, params)
    assert report["missing"] == [], report["missing"][:5]
    assert report["unused"] == [], report["unused"][:5]
    # converted values actually landed (different from init)
    a0 = np.asarray(jax.tree.leaves(params)[0])
    a1 = np.asarray(jax.tree.leaves(new_params)[0])
    assert not np.allclose(a0, a1)


def test_expected_torch_key_names(template):
    """Spot-check the exact reference state_dict names we must consume."""
    _, params, _ = template
    sd_keys = set(synthetic_state_dict(params).keys())
    expected = [
        "conv_first.weight",
        "conv_first.bias",
        "transformer_feature_extraction.path1.norm1.body.weight",
        "transformer_feature_extraction.path1.attn.temperature",
        "transformer_feature_extraction.path1.attn.qkv.weight",
        "transformer_feature_extraction.path1.attn.qkv_dwconv.weight",
        "transformer_feature_extraction.path1.side_to_feaoneUDSA.body.0.weight",
        "transformer_feature_extraction.path1.side_to_feaoneUDSA.body.6.spatial.weight",
        "transformer_feature_extraction.path1.side_to_feaoneUDSA.body.7.weight",
        "transformer_feature_extraction.path1.side_to_feaoneUDSA.body.11.weight",
        "tsa_fusion.weight",
        "recon_trunk.body.0.body.0.body.0.weight",
        "recon_trunk.body.0.body.0.down.0.weight",
        "recon_trunk.body.1.conv.weight",
        "MV_deform_align.temperature",
        "MV_deform_align.conv_du.0.weight",
        "MV_deform_align.project_out.weight",
        "MV_deform_align.fusion_out.0.weight",
        "MV_deform_align.CALayer.conv_du.0.weight",
        "MV_deform_align.ResidualBlock.conv1.weight",
        "MV_deform_align.ResidualBlock1.conv2.weight",
        "RDAB.input_conv.weight",
        "RDAB.conv_du_re.0.weight",
        "RDAB.conv_du_re.2.weight",
        "RDAB.conv_du_re2.0.weight",
        "RDAB.fuse.weight",
        "RDAB.directW1_conv.weight",
        "RDAB.directH1_conv.bias",
        "upconv1.weight",
        "conv_last.bias",
    ]
    for k in expected:
        assert k in sd_keys, f"converter does not produce/consume: {k}"


def test_conversion_changes_forward(template):
    model, params, args = template
    sd = synthetic_state_dict(params)
    # scale down random weights to keep the forward finite
    sd = {k: v * 0.05 for k, v in sd.items()}
    new_params, _ = convert_state_dict(sd, params)
    sr0, _ = model.apply(params, *args)
    sr1, _ = model.apply(new_params, *args)
    assert np.isfinite(np.asarray(sr1)).all()
    assert not np.allclose(np.asarray(sr0), np.asarray(sr1))


def test_dead_keys_ignored(template):
    _, params, _ = template
    sd = synthetic_state_dict(params)
    sd["MV_deform_align.fusion_in.0.weight"] = np.zeros((64, 128, 1, 1), np.float32)
    sd["MV_deform_align.fusion_in.2.weight"] = np.zeros((64, 64, 1, 1), np.float32)
    _, report = convert_state_dict(sd, params)
    assert report["unused"] == []
