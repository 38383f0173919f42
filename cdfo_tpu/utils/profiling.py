"""Profiling / FLOPs / parameter-count utilities.

Replaces the reference's ad-hoc harnesses: ``CVSR_V8_flops`` wrapper
(`arch/SIDECVSR_our.py:5135-5252`) and the inline
``sum(np.prod(p.size()))`` param print (`train_LD_37.py:166,423`), plus a
proper device profiler (`jax.profiler`) the reference lacked.
"""
from __future__ import annotations

import contextlib
import time
from typing import Any, Callable

import jax
import numpy as np


def count_params(params: Any) -> int:
    return int(sum(np.prod(np.asarray(p).shape) for p in jax.tree.leaves(params)))


def estimate_flops(fn: Callable, *args) -> float:
    """Static FLOP estimate via XLA's cost analysis of the lowered module."""
    lowered = jax.jit(fn).lower(*args)
    cost = lowered.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost.get("flops", -1.0))


@contextlib.contextmanager
def trace_profile(logdir: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Honest device timer: forces a host readback of a scalar reduction of
    the outputs (the axon platform's block_until_ready does not block)."""

    def __init__(self):
        self.times = []

    @contextlib.contextmanager
    def measure(self, out_getter: Callable[[], Any] | None = None):
        t0 = time.perf_counter()
        yield
        self.times.append(time.perf_counter() - t0)

    @staticmethod
    def sync(x) -> float:
        import jax.numpy as jnp

        return float(jnp.sum(x if not isinstance(x, (tuple, list)) else x[0]))

    @property
    def mean(self) -> float:
        return float(np.mean(self.times)) if self.times else 0.0
