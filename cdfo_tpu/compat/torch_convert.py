"""PyTorch-checkpoint -> flax-params converter for the CVSR family.

The released CDFO checkpoints are torch ``state_dict``s of
`arch/SIDECVSR_our.py` models (e.g. ``LD_QP37_J_epoch-9500.pth``,
`test_LD_37.py:123`). This module maps them onto our NHWC flax trees:

  conv weight  (out, in, kh, kw)      -> (kh, kw, in, out)
  conv-transpose weight (in, out, kh, kw) -> (kh, kw, in, out)  (flipped at
                                              call time by ConvTranspose2d)
  LayerNorm body.{weight,bias}        -> {weight, bias}
  direct 1x9 / 9x1 convs (1,1,*,*)    -> 9-tap vectors + scalar bias
  nn.Sequential indices               -> our ``name_N`` flax names

Keys that are parameters of dead reference submodules (e.g.
``MV_deform_align.fusion_in.*`` — constructed but never called,
`SIDECVSR_our.py:3445-3448`) are dropped with a warning.

Use :func:`convert_state_dict` with a template flax params tree (from
``model.init``); every leaf must be matched or listed in ``missing``.
"""
from __future__ import annotations

import re
from typing import Any, Callable, Dict, Tuple

import numpy as np

# flax module names whose trailing _N maps to a torch Sequential index
_SEQUENTIAL = {
    "body", "down", "up", "conv_du", "conv_du_re", "conv_du_re2", "conv_dc",
    "conv_df", "conv_du_am", "fusion_out", "fc", "conv_attention",
    "offset_mask", "input_conv", "kernel_pred_module", "channel_add_conv",
    "conv_offset", "fcs", "conv_match1", "conv_match2", "conv_assembly",
    "scaleing", "off2flow", "offset_oc", "out_conv", "spatial",
}

# flax segment renames (exact)
_RENAMES = {
    "transformer_feature_extraction": "transformer_feature_extraction.path1",
    "side_to_feaoneUDSA": "side_to_feaoneUDSA",
}


def _segment_to_torch(seg: str) -> str:
    if seg in _RENAMES:
        return _RENAMES[seg]
    m = re.fullmatch(r"([A-Za-z][A-Za-z0-9_]*?)_(\d+)", seg)
    if m and m.group(1) in _SEQUENTIAL:
        return f"{m.group(1)}.{m.group(2)}"
    return seg


def flax_to_torch_key(path: Tuple[str, ...]) -> Tuple[str, Callable]:
    """Map a flax param path to (torch state_dict key, array transform)."""
    segs = list(path)
    # variant wrappers (CVSRV9 etc.) nest the shared structure under a
    # literal 'body' submodule that has no torch counterpart
    if segs and segs[0] == "body":
        segs = segs[1:]
    leaf = segs[-1]

    def t_conv(a):  # torch (out, in/groups, kh, kw) -> (kh, kw, in/g, out)
        return np.ascontiguousarray(np.transpose(a, (2, 3, 1, 0)))

    def t_convT(a):  # torch (in, out, kh, kw) -> (kh, kw, in, out)
        return np.ascontiguousarray(np.transpose(a, (2, 3, 0, 1)))

    identity = lambda a: np.asarray(a)

    # module-level special cases -------------------------------------------
    # the alignment MSA submodule groups params that live flat on the torch
    # module (conv_du / temperature / project_out)
    if "msa" in segs:
        segs.remove("msa")
    # SpatialAttention's conv lives at <parent>.spatial
    # (handled by generic rules: .../spatial/conv/kernel)

    # leaf-level rules ------------------------------------------------------
    if leaf == "temperature":
        base = ".".join(_segment_to_torch(s) for s in segs[:-1])
        return (f"{base}.temperature" if base else "temperature"), identity

    if segs[-2:] == ["conv", "kernel"] or (len(segs) >= 2 and segs[-2] == "conv" and leaf == "kernel"):
        base = ".".join(_segment_to_torch(s) for s in segs[:-2])
        return f"{base}.weight", t_conv
    if len(segs) >= 2 and segs[-2] == "conv" and leaf == "bias":
        base = ".".join(_segment_to_torch(s) for s in segs[:-2])
        return f"{base}.bias", identity

    if leaf == "kernel":  # ConvTranspose2d or raw DCN weight
        base = ".".join(_segment_to_torch(s) for s in segs[:-1])
        return f"{base}.weight", t_convT

    if leaf == "weight":
        base = ".".join(_segment_to_torch(s) for s in segs[:-1])
        # raw deformable-conv weight param (torch (out,in,kh,kw))
        if segs[-2] in ("mdc", "dc") or base.endswith("deform_align"):
            return f"{base}.weight", t_conv
        # channel LayerNorm: torch stores under .body
        return f"{base}.body.weight", identity

    if leaf == "bias":
        base = ".".join(_segment_to_torch(s) for s in segs[:-1])
        norm_like = segs[-2].startswith("norm")
        if norm_like:
            return f"{base}.body.bias", identity
        return f"{base}.bias", identity

    # EGLA direct convs: (1,1,1,9)/(1,1,9,1) torch weights -> 9-vectors
    if leaf.endswith("_kernel") and leaf.startswith("direct"):
        name = leaf[:-len("_kernel")] + "_conv"
        base = ".".join(_segment_to_torch(s) for s in segs[:-1])
        key = f"{base}.{name}.weight" if base else f"{name}.weight"
        return key, lambda a: np.asarray(a).reshape(9)
    if leaf.endswith("_bias") and leaf.startswith("direct"):
        name = leaf[:-len("_bias")] + "_conv"
        base = ".".join(_segment_to_torch(s) for s in segs[:-1])
        key = f"{base}.{name}.bias" if base else f"{name}.bias"
        return key, lambda a: np.asarray(a).reshape(())

    if leaf == "gamma" or leaf.endswith("_alpha"):
        base = ".".join(_segment_to_torch(s) for s in segs[:-1])
        return (f"{base}.{leaf}" if base else leaf), identity

    raise KeyError(f"no rule for flax path {path}")


# torch keys that exist in reference checkpoints but have no live flax param
_KNOWN_DEAD_PATTERNS = [
    r".*\.fusion_in\..*",          # DualAttAlignment dead branch (:3445)
    r".*conv_offset_mask\..*",     # unused pack head under MV*Alignment
    r".*\.adaptiveWeight.*",       # PAItransformer wrapper lamRes/lamX
]


def convert_state_dict(state_dict: Dict[str, np.ndarray], params_template: Any):
    """Convert a torch state_dict (name -> ndarray) into the flax tree shaped
    like ``params_template``. Returns (params, report) where report lists
    unused torch keys and unmatched flax paths."""
    import jax

    used = set()
    missing = []

    flat = jax.tree_util.tree_flatten_with_path(params_template)[0]
    new_leaves = {}
    for keypath, leaf in flat:
        path = tuple(
            k.key if hasattr(k, "key") else str(k) for k in keypath)
        # strip the top-level 'params' collection name
        p = path[1:] if path and path[0] == "params" else path
        try:
            tkey, transform = flax_to_torch_key(p)
        except KeyError:
            missing.append(("no-rule", p))
            new_leaves[path] = leaf
            continue
        if tkey not in state_dict:
            missing.append((tkey, p))
            new_leaves[path] = leaf
            continue
        arr = transform(np.asarray(state_dict[tkey]))
        if arr.shape != leaf.shape:
            raise ValueError(
                f"shape mismatch for {tkey} -> {p}: {arr.shape} vs {leaf.shape}")
        new_leaves[path] = arr.astype(np.asarray(leaf).dtype)
        used.add(tkey)

    unused = [k for k in state_dict
              if k not in used
              and not any(re.fullmatch(pat, k) for pat in _KNOWN_DEAD_PATTERNS)]

    def rebuild(keypath, leaf):
        path = tuple(k.key if hasattr(k, "key") else str(k) for k in keypath)
        return jax.numpy.asarray(new_leaves[path])

    params = jax.tree_util.tree_map_with_path(rebuild, params_template)
    return params, {"missing": missing, "unused": unused}


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth state_dict to numpy (CPU, no torch tensors escape)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.detach().numpy() for k, v in sd.items()}
