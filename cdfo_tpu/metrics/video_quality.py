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
                       max_frames: Optional[int] = None,
                       stride: int = 1) -> Dict[str, float]:
    """Mean NIQE (and BRISQUE when weights given) over a PNG frame tree."""
    from ..data.io import read_gray

    files = sorted(f for f in os.listdir(frames_dir) if f.endswith(".png"))
    if max_frames:
        files = files[:max_frames]
    files = files[::stride]
    niqes, brisques = [], []
    for f in files:
        img = read_gray(os.path.join(frames_dir, f))
        niqes.append(calculate_niqe(img, niqe_params))
        if brisque_weights:
            brisques.append(calculate_brisque(img, brisque_weights))
    out = {"niqe": float(np.mean(niqes)), "frames": len(files)}
    if brisques:
        out["brisque"] = float(np.mean(brisques))
    return out
