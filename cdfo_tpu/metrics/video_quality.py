"""Per-sequence no-reference quality drivers (reference
`metric/cal_VideoLQ.py:495-575` — NIQE/BRISQUE[/NRQM/PI] means over PNG
frame trees)."""
from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np

from .brisque import calculate_brisque
from .niqe import calculate_niqe


def cal_sequence_noref(frames_dir: str, niqe_params: str,
                       brisque_weights: Optional[str] = None,
                       nrqm_params: Optional[str] = None,
                       max_frames: Optional[int] = None,
                       stride: int = 1) -> Dict[str, float]:
    """Mean NIQE (+BRISQUE, +NRQM/PI when their params are given) over a
    PNG frame tree (`metric/cal_VideoLQ.py:495-575` columns)."""
    from ..data.io import read_gray
    from .nrqm import calculate_nrqm

    files = sorted(f for f in os.listdir(frames_dir) if f.endswith(".png"))
    if max_frames:
        files = files[:max_frames]
    files = files[::stride]
    niqes, brisques, nrqms = [], [], []
    for f in files:
        img = read_gray(os.path.join(frames_dir, f))
        niqes.append(calculate_niqe(img, niqe_params))
        if brisque_weights:
            brisques.append(calculate_brisque(img, brisque_weights))
        if nrqm_params:
            nrqms.append(calculate_nrqm(img, nrqm_params))
    out = {"niqe": float(np.mean(niqes)), "frames": len(files)}
    if brisques:
        out["brisque"] = float(np.mean(brisques))
    if nrqms:
        out["nrqm"] = float(np.mean(nrqms))
        # PI = 0.5((10-NRQM)+NIQE) per frame-mean (`metric/nrqm.py:2010`)
        out["pi"] = 0.5 * ((10.0 - out["nrqm"]) + out["niqe"])
    return out
