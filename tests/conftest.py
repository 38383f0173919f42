"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax is imported anywhere.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU backend regardless of
# JAX_PLATFORMS env; tests must run on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

# Parity tests compare against fp32 torch; do not let XLA run matmul/conv in
# bf16 passes. (Production code picks precision per-pipeline.)
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import numpy as np

    return np.random.RandomState(0)
