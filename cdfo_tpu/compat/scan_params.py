"""Unrolled-trunk <-> scan-trunk parameter layout adapters.

The unrolled reconstruction trunks (`SCNetS` / `SCNetPyr`,
`cdfo_tpu/models/trunk.py`) name their groups ``body_{i}`` — matching the
reference torch names (`SIDECVSR_our.py:468-480`), which is what the
checkpoint converter targets. The scan twins (`SCNetSScan` /
`SCNetPyrScan`) hold ONE stacked copy of the group tree under
``groups/g`` with a leading ``num_groups`` axis (flax ``nn.scan``).

These pure-tree functions move a converted checkpoint (or a live params
tree) between the two layouts, so:

  torch .pth -> convert_state_dict(...)      (unrolled template)
             -> to_scan_trunk(params)        (scan layout)
             -> model with cfg.scan_trunk    (minutes -> seconds compile)
"""
from __future__ import annotations

import re
from typing import Any, Dict

import jax
import numpy as np


def _is_unrolled_trunk(sub: Dict[str, Any]) -> bool:
    return any(re.fullmatch(r"body_\d+", k) for k in sub) and \
        "groups" not in sub


def _stack_subtree(sub: Dict[str, Any]) -> Dict[str, Any]:
    names = sorted((k for k in sub if re.fullmatch(r"body_\d+", k)),
                   key=lambda s: int(s.split("_")[1]))
    stacked = jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]),
                           *[sub[k] for k in names])
    out = {k: v for k, v in sub.items() if k not in names}
    out["groups"] = {"g": stacked}
    return out


def _unstack_subtree(sub: Dict[str, Any]) -> Dict[str, Any]:
    stacked = sub["groups"]["g"]
    leaves = jax.tree.leaves(stacked)
    n = int(np.asarray(leaves[0]).shape[0])
    out = {k: v for k, v in sub.items() if k != "groups"}
    for i in range(n):
        out[f"body_{i}"] = jax.tree.map(lambda x: np.asarray(x)[i], stacked)
    return out


def _map_trunk(params: Any, fn, trunk_name: str) -> Any:
    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if k == trunk_name and isinstance(v, dict):
                out[k] = fn(v)
            else:
                out[k] = walk(v)
        return out

    return walk(params)


def to_scan_trunk(params: Any, trunk_name: str = "recon_trunk") -> Any:
    """Convert every ``trunk_name`` subtree from the unrolled ``body_{i}``
    layout to the scan ``groups/g`` layout (no-op if already scanned)."""
    def fn(sub):
        return _stack_subtree(sub) if _is_unrolled_trunk(sub) else sub

    return _map_trunk(params, fn, trunk_name)


def from_scan_trunk(params: Any, trunk_name: str = "recon_trunk") -> Any:
    """Inverse of :func:`to_scan_trunk` (e.g. to export a scan-trained
    checkpoint back to the torch-named unrolled layout)."""
    def fn(sub):
        return _unstack_subtree(sub) if "groups" in sub else sub

    return _map_trunk(params, fn, trunk_name)
