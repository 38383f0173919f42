"""Worker process for tests/test_multiprocess_dist.py.

Runs ONE host of a 2-process CPU-backend distributed training job — the
real multi-host stack end to end: ``initialize_distributed`` (the
``init_dist``/``get_dist_info`` equivalent, `opt/deep_learning.py:23-42`),
per-host ``CVCPDataset`` stride sharding (the ``DistSampler`` equivalent,
`:50-105`), a global 8-device mesh spanning both OS processes, and the
real ``train_step`` with gradients all-reduced across the process
boundary (Gloo).

usage: python mp_dist_worker.py <pid> <nproc> <port> <data_root> <out.npz>
"""
import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
data_root, out_path = sys.argv[4], sys.argv[5]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

from cdfo_tpu.parallel import initialize_distributed  # noqa: E402

host_id, num_hosts = initialize_distributed(
    coordinator_address=f"localhost:{port}",
    num_processes=nproc, process_id=pid)
assert (host_id, num_hosts) == (pid, nproc), (host_id, num_hosts)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from cdfo_tpu.config import DataConfig, ModelConfig, TrainConfig  # noqa: E402
from cdfo_tpu.data.dataset import CVCPDataset, TrainBatcher  # noqa: E402
from cdfo_tpu.models import CVSRV8  # noqa: E402
from cdfo_tpu.parallel.mesh import make_mesh  # noqa: E402
from cdfo_tpu.train.state import create_train_state, train_step  # noqa: E402

LOCAL_B, STEPS, CROP = 4, 2, 16

mesh = make_mesh((8,), ("data",))  # global mesh spanning both processes

cfg = DataConfig(coding_cfg="LD", qp=37, frames_per_seq=10)
ds = CVCPDataset(data_root, cfg, host_id=host_id, num_hosts=num_hosts)
batcher = TrainBatcher(ds, LOCAL_B, crop=CROP, seed=4)
local_batches = [batcher.sample_batch() for _ in range(STEPS)]


def to_global(local):
    out = {}
    for k, v in local.items():
        gshape = (v.shape[0] * nproc,) + v.shape[1:]
        out[k] = jax.make_array_from_process_local_data(
            NamedSharding(mesh, P("data", *([None] * (v.ndim - 1)))),
            v, gshape)
    return out


model = CVSRV8(ModelConfig(mask_mode="sample", scn_groups=1))
state = create_train_state(model, TrainConfig(), local_batches[0],
                           steps_per_epoch=1)
state = jax.device_put(state, NamedSharding(mesh, P()))
step = jax.jit(train_step)

losses = []
for i in range(STEPS):
    batch = to_global(local_batches[i])
    state, loss = step(state, batch, jax.random.fold_in(
        jax.random.PRNGKey(0), i))
    losses.append(float(loss))

if pid == 0:
    import jax.tree_util as jtu

    leaves = {f"p{j}": np.asarray(v) for j, v in
              enumerate(jtu.tree_leaves(state.params))}
    np.savez(out_path, losses=np.asarray(losses), **leaves)
print(f"worker {pid}: losses={losses}")
