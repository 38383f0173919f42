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

# Test tiers (VERDICT r4 Weak #7). Assignments from a full-suite
# --durations=0 baseline (suite_r5): `slow` = modules/tests dominated by
# multi-minute engine-equivalence or CLI-subprocess work; `golden` =
# parity against the in-tree torch reference (imports torch, heavy
# fixtures). Fast tier: `pytest -m "not slow"` — minutes, not hours.
_SLOW_MODULES = {
    "test_engine", "test_eval_driver", "test_fused_align",
    "test_fused_egla", "test_fused_mdta", "test_fused_vjp",
    "test_golden_parity", "test_nonv8_golden", "test_serve_cli",
    "test_sharded_serving", "test_train_and_infer",
    "test_train_resume_and_guard",
}
_SLOW_TESTS = {
    "test_data_parallel_train_step_equivalence",
    "test_data_parallel_forward_equivalence",
    "test_cvsr_v7", "test_dsta", "test_pyramid_trunks",
    "test_ablation_variants_run", "test_fused_scale_block_full_parity",
}
_GOLDEN_MODULES = {
    "test_attention_parity", "test_deform_conv", "test_golden_parity",
    "test_lpips_golden", "test_lpips_trainer",
    "test_module_formula_parity", "test_mv_and_losses",
    "test_nonv8_golden", "test_norefs_and_lpips", "test_nrqm",
    "test_ops_torch_parity", "test_registry_and_wavelet",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in _SLOW_MODULES or item.originalname in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
        if mod in _GOLDEN_MODULES:
            item.add_marker(pytest.mark.golden)


@pytest.fixture(scope="session")
def rng():
    import numpy as np

    return np.random.RandomState(0)
