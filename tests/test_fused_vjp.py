"""Gradient parity for the differentiable fused-kernel wrappers
(`ops/fused_vjp.py`): the custom-VJP backward (recompute through the XLA
twin) must match the gradients of the plain XLA trunk/head.

This is what makes ``fused_trunk=True`` legal in TRAINING: forward runs
the Pallas kernels, backward is exact (reference semantics
`arch/SIDECVSR_our.py:378-406,430-444,4390-4393,4473-4480`).
"""
import jax
import jax.numpy as jnp
import numpy as np

from cdfo_tpu.models.trunk import SCNetS
from cdfo_tpu.models.trunk_fast import SCNetFast


def _tree_close(a, b, tol):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=tol, atol=tol)


def test_fused_trunk_grads_match_xla_trunk():
    rng = np.random.RandomState(0)
    nf, h, w = 8, 16, 24
    x = jnp.asarray(rng.randn(1, h, w, nf).astype(np.float32) * 0.5)

    slow = SCNetS(nf=nf, num_groups=1)
    fast = SCNetFast(nf=nf, num_groups=1)
    params = slow.init(jax.random.PRNGKey(0), x)
    # param trees are path-identical by construction
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(
                fast.init(jax.random.PRNGKey(0), x)))

    def loss_slow(p, x):
        return jnp.sum(slow.apply(p, x) ** 2)

    def loss_fast(p, x):
        return jnp.sum(fast.apply(p, x) ** 2)

    (v0, g0p), g0x = (jax.value_and_grad(loss_slow)(params, x),
                      jax.grad(loss_slow, argnums=1)(params, x))
    (v1, g1p), g1x = (jax.value_and_grad(loss_fast)(params, x),
                      jax.grad(loss_fast, argnums=1)(params, x))
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-4)
    _tree_close(g0p, g1p, 2e-3)
    np.testing.assert_allclose(np.asarray(g0x), np.asarray(g1x),
                               rtol=2e-3, atol=2e-3)


def test_head_fused_grads_match_twin():
    from cdfo_tpu.ops.fused_vjp import _head_twin, head_fused

    rng = np.random.RandomState(1)
    nf, h, w = 8, 8, 16
    t = jnp.asarray(rng.randn(1, h, nf, w).astype(np.float32) * 0.5)
    lr = jnp.asarray(rng.rand(1, h, w, 1).astype(np.float32))
    k1 = jnp.asarray(rng.randn(1, 1, nf, 4 * nf).astype(np.float32) * 0.2)
    b1 = jnp.asarray(rng.randn(4 * nf).astype(np.float32) * 0.1)
    k2 = jnp.asarray(rng.randn(1, 1, nf, 4 * nf).astype(np.float32) * 0.2)
    b2 = jnp.asarray(rng.randn(4 * nf).astype(np.float32) * 0.1)
    kl = jnp.asarray(rng.randn(3, 3, nf, 1).astype(np.float32) * 0.2)
    bl = jnp.asarray(rng.randn(1).astype(np.float32) * 0.1)
    args = (t, lr, k1, b1, k2, b2, kl, bl)

    # forward parity (fused kernel vs twin) guards the recompute base
    np.testing.assert_allclose(np.asarray(head_fused(*args)),
                               np.asarray(_head_twin(*args)),
                               rtol=2e-4, atol=2e-4)

    def loss_fused(*a):
        return jnp.sum(head_fused(*a) ** 2)

    def loss_twin(*a):
        return jnp.sum(_head_twin(*a) ** 2)

    g_fused = jax.grad(loss_fused, argnums=tuple(range(8)))(*args)
    g_twin = jax.grad(loss_twin, argnums=tuple(range(8)))(*args)
    _tree_close(g_fused, g_twin, 2e-3)


def test_train_step_runs_with_fused_trunk():
    """A full CVSR_V8 train-style grad with fused_trunk=True compiles and
    produces finite grads (the round-2 restriction was inference-only)."""
    from cdfo_tpu.config import ModelConfig
    from cdfo_tpu.models import CVSRV8

    cfg = ModelConfig(mask_mode="expected", fused_trunk=True, scn_groups=1)
    model = CVSRV8(cfg)
    rng = np.random.RandomState(2)
    b, n, h, w = 1, 7, 16, 16
    lrs = jnp.asarray(rng.rand(b, n, h, w, 1).astype(np.float32))
    mv = jnp.asarray(rng.randn(b, n, h, w, 2).astype(np.float32) * 0.5)
    pm = jnp.asarray(rng.rand(b, n, h, w, 1).astype(np.float32))
    rm = jnp.asarray(rng.rand(b, n, h, w, 1).astype(np.float32))
    uf = jnp.asarray(rng.rand(b, n, h, w, 1).astype(np.float32))
    hr = jnp.asarray(rng.rand(b, 4 * h, 4 * w, 1).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), lrs, mv, mv, pm, rm, uf)

    def loss(p):
        sr, _ = model.apply(p, lrs, mv, mv, pm, rm, uf)
        return jnp.sum(jnp.sqrt((sr - hr) ** 2 + 1e-4))

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))
