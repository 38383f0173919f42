"""Scan-over-groups trunk (SCNetSScan / SCNetPyrScan): same math as the
unrolled trunks, several-fold smaller XLA programs (the V7 compile-cost
fix — ROUND3_NOTES), with `compat.to_scan_trunk` moving converted
checkpoints into the stacked param layout."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cdfo_tpu.compat import from_scan_trunk, to_scan_trunk
from cdfo_tpu.config import ModelConfig
from cdfo_tpu.models.trunk import (
    SCNetPyr,
    SCNetPyrScan,
    SCNetS,
    SCNetSScan,
)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def test_scnet_scan_matches_unrolled(rng):
    x = jnp.asarray(rng.randn(2, 12, 16, 8).astype(np.float32))
    net = SCNetS(8, num_groups=3)
    p = net.init(jax.random.PRNGKey(0), x)
    ref = net.apply(p, x)
    scan_net = SCNetSScan(8, num_groups=3)
    ps = to_scan_trunk({"recon_trunk": p["params"]})
    out = scan_net.apply({"params": ps["recon_trunk"]}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_scan_roundtrip_layout(rng):
    x = jnp.asarray(rng.randn(1, 8, 8, 8).astype(np.float32))
    net = SCNetS(8, num_groups=4)
    p = {"recon_trunk": net.init(jax.random.PRNGKey(1), x)["params"]}
    rt = from_scan_trunk(to_scan_trunk(p))
    a_items = {jax.tree_util.keystr(k): v for k, v in
               jax.tree_util.tree_leaves_with_path(p)}
    b_items = {jax.tree_util.keystr(k): v for k, v in
               jax.tree_util.tree_leaves_with_path(rt)}
    assert sorted(a_items) == sorted(b_items)
    for k in a_items:
        np.testing.assert_array_equal(np.asarray(a_items[k]),
                                      np.asarray(b_items[k]))


def test_scnet_pyr_scan_matches_unrolled(rng):
    xs = [jnp.asarray(rng.randn(1, 16 >> i, 24 >> i, 8).astype(np.float32))
          for i in range(3)]
    net = SCNetPyr(8, num_groups=3)
    p = net.init(jax.random.PRNGKey(0), xs)
    ref = net.apply(p, xs)
    scan_net = SCNetPyrScan(8, num_groups=3)
    ps = to_scan_trunk({"recon_trunk": p["params"]})
    out = scan_net.apply({"params": ps["recon_trunk"]}, xs)
    for o, r in zip(out, ref):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=1e-6, atol=1e-6)


def test_scan_program_is_smaller():
    x = jnp.zeros((1, 16, 16, 8), jnp.float32)
    net = SCNetS(8, num_groups=7)
    scan_net = SCNetSScan(8, num_groups=7)
    p = net.init(jax.random.PRNGKey(0), x)
    ps = {"params": to_scan_trunk(
        {"recon_trunk": p["params"]})["recon_trunk"]}
    n_unrolled = len(jax.jit(net.apply).lower(p, x).as_text().splitlines())
    n_scan = len(jax.jit(scan_net.apply).lower(ps, x).as_text().splitlines())
    assert n_scan * 2 < n_unrolled, (n_scan, n_unrolled)


def test_cvsr_v8_scan_trunk_matches(rng):
    from cdfo_tpu.models import CVSRV8

    kw = dict(scn_groups=2, mask_mode="expected")
    b, n, h, w = 1, 7, 16, 16
    lrs = rng.rand(b, n, h, w, 1).astype(np.float32)
    mv = (rng.randn(b, n, h, w, 2) * 0.3).astype(np.float32)
    pm = rng.rand(b, n, h, w, 1).astype(np.float32)
    rm = (rng.rand(b, n, h, w, 1).astype(np.float32) - 0.5) * 0.2
    uf = rng.rand(b, n, h, w, 1).astype(np.float32)
    base = CVSRV8(ModelConfig(**kw))
    p = base.init(jax.random.PRNGKey(0), lrs, mv, mv, pm, rm, uf)
    sr_ref, l1_ref = base.apply(p, lrs, mv, mv, pm, rm, uf)
    scan_model = CVSRV8(ModelConfig(scan_trunk=True, **kw))
    ps = to_scan_trunk(p)
    sr, l1 = scan_model.apply(ps, lrs, mv, mv, pm, rm, uf)
    np.testing.assert_allclose(np.asarray(sr), np.asarray(sr_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l1_ref),
                               rtol=1e-5, atol=1e-5)


def test_restore_params_adapts_layout(rng, tmp_path):
    """An unrolled-layout checkpoint restores into a scan-trunk template
    (and vice versa) — `--scan-trunk` eval on converted torch releases."""
    from cdfo_tpu.train.loop import restore_params

    x = jnp.asarray(rng.randn(1, 8, 8, 8).astype(np.float32))
    net = SCNetS(8, num_groups=3)
    # mirror the CLI convention: state.params is the full init output
    # (with its 'params' collection wrapper), checkpoints wrap it again
    p = {"params": {"recon_trunk":
                    net.init(jax.random.PRNGKey(0), x)["params"]}}

    import orbax.checkpoint as ocp
    path = str(tmp_path / "ckpt")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params": p})
    ckptr.wait_until_finished()

    scan_template = to_scan_trunk(p)
    restored = restore_params(path, scan_template)
    ref = to_scan_trunk(p)
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scan_trunk_init_trains(rng):
    """From-scratch init in scan layout: params exist stacked, gradients
    flow (nn.scan differentiates), and a step changes the params."""
    x = jnp.asarray(rng.randn(1, 8, 8, 8).astype(np.float32))
    net = SCNetSScan(8, num_groups=3)
    p = net.init(jax.random.PRNGKey(0), x)
    leaves = jax.tree.leaves(p["params"])
    assert all(l.shape[0] == 3 for l in leaves)

    def loss(params):
        return jnp.mean(jnp.square(net.apply(params, x)))

    g = jax.grad(loss)(p)
    assert any(float(jnp.abs(l).sum()) > 0 for l in jax.tree.leaves(g))
