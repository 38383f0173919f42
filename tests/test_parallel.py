"""Multi-device sharding tests on the virtual 8-CPU mesh: sharded execution
must be numerically equivalent to single-device execution."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from cdfo_tpu.config import ModelConfig, TrainConfig
from cdfo_tpu.models import CVSRV8
from cdfo_tpu.parallel.mesh import make_mesh, replicate, shard_batch


def inputs(b=4, n=7, h=16, w=16):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    return (jax.random.uniform(ks[0], (b, n, h, w, 1)),
            jax.random.normal(ks[1], (b, n, h, w, 2)) * 0.3,
            jax.random.normal(ks[2], (b, n, h, w, 2)) * 0.3,
            jax.random.uniform(ks[3], (b, n, h, w, 1)),
            jax.random.uniform(ks[4], (b, n, h, w, 1)) - 0.5,
            jax.random.uniform(ks[5], (b, n, h, w, 1)))


@pytest.fixture(scope="module")
def model_and_params():
    model = CVSRV8(ModelConfig(scn_groups=1, mask_mode="expected"))
    args = inputs()
    params = model.init(jax.random.PRNGKey(1), *args)
    return model, params, args


def test_data_parallel_forward_equivalence(model_and_params):
    model, params, args = model_and_params
    sr_single, _ = jax.jit(model.apply)(params, *args)

    mesh = make_mesh((4,), ("data",))
    params_r = replicate(mesh, params)
    args_s = tuple(shard_batch(mesh, a) for a in args)
    sr_sharded, _ = jax.jit(model.apply)(params_r, *args_s)
    np.testing.assert_allclose(np.asarray(sr_sharded), np.asarray(sr_single),
                               rtol=2e-5, atol=2e-5)


def test_spatial_sharded_forward_equivalence(model_and_params):
    model, params, args = model_and_params
    sr_single, _ = jax.jit(model.apply)(params, *args)

    mesh = make_mesh((2, 2), ("data", "spatial"))
    params_r = replicate(mesh, params)

    def spec(x):
        if x.ndim == 5:
            return NamedSharding(mesh, P("data", None, "spatial", None, None))
        return NamedSharding(mesh, P("data", "spatial", None, None))

    args_s = tuple(jax.device_put(a, spec(a)) for a in args)
    sr_sharded, _ = jax.jit(model.apply)(params_r, *args_s)
    np.testing.assert_allclose(np.asarray(sr_sharded), np.asarray(sr_single),
                               rtol=2e-5, atol=2e-5)


def test_data_parallel_train_step_equivalence(model_and_params):
    from cdfo_tpu.train.state import create_train_state, train_step

    model, _, args = model_and_params
    r = np.random.RandomState(0)
    batch = {"lrs": np.asarray(args[0]), "mvs0": np.asarray(args[1]),
             "mvs1": np.asarray(args[2]), "pms": np.asarray(args[3]),
             "rms": np.asarray(args[4]), "ufs": np.asarray(args[5]),
             "hr": r.rand(4, 64, 64, 1).astype(np.float32)}
    state = create_train_state(model, TrainConfig(), batch)
    rng = jax.random.PRNGKey(0)
    s1, loss1 = jax.jit(train_step)(state, batch, rng)

    mesh = make_mesh((4,), ("data",))
    state_r = replicate(mesh, state)
    batch_s = shard_batch(mesh, batch)
    s2, loss2 = jax.jit(train_step)(state_r, batch_s, rng)
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5)
    a = jax.tree.leaves(s1.params)[0]
    b = jax.tree.leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4,
                               atol=1e-6)

def test_initialize_distributed_single_process(tmp_path):
    """initialize_distributed: the init_dist/get_dist_info equivalent
    (`opt/deep_learning.py:23-42`). Must run before any backend init, so
    it executes in a clean subprocess; idempotent re-entry included."""
    import subprocess
    import sys

    code = (
        "import socket\n"
        "with socket.socket() as s:\n"
        "    s.bind((\"127.0.0.1\", 0)); port = s.getsockname()[1]\n"
        "from cdfo_tpu.parallel import initialize_distributed\n"
        "addr = f\"127.0.0.1:{port}\"\n"
        "print(initialize_distributed(addr, 1, 0))\n"
        "print(initialize_distributed(addr, 1, 0))\n"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=300,
                         env={**__import__("os").environ,
                              "JAX_PLATFORMS": "cpu"})
    assert out.returncode == 0, out.stderr[-800:]
    lines = [l for l in out.stdout.splitlines() if l.startswith("(")]
    assert lines == ["(0, 1)", "(0, 1)"]
