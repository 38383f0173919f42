"""Full training loop: data-parallel train steps, Orbax checkpointing,
TensorBoard scalars, periodic eval — the `train_LD_37.py:299-415` loop
rebuilt TPU-native (and fixing what the reference lacks: optimizer state in
checkpoints, automatic resume)."""
from __future__ import annotations

import json
import os
import time
from typing import Callable, Optional

import jax
import numpy as np

from ..config import DataConfig, ModelConfig, TrainConfig
from ..data.dataset import CVCPDataset, TrainBatcher
from ..models import CVSRV8
from ..parallel.mesh import make_mesh, replicate, shard_batch
from .state import create_train_state, train_step


def save_checkpoint(ckpt_dir: str, state, step: int):
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step:08d}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params": state.params, "opt_state": state.opt_state,
                      "step": np.asarray(state.step)})
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(path: str, state):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    target = {"params": state.params, "opt_state": state.opt_state,
              "step": np.asarray(state.step)}
    restored = ckptr.restore(os.path.abspath(path), target)
    return state.replace(params=restored["params"],
                         opt_state=restored["opt_state"],
                         step=restored["step"])


def restore_params(path: str, params_template):
    """Restore only the model params from a checkpoint dir (eval-side load,
    the `map_location='cpu'` equivalent of `test_LD_37.py:124`).

    Trunk-layout tolerant: a checkpoint saved with the unrolled trunk
    restores into a scan-trunk template (and vice versa) via the
    `cdfo_tpu.compat` layout adapters — so `--scan-trunk` eval works on
    checkpoints converted from the torch releases without re-saving."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(os.path.abspath(path))
    if "params" in restored:
        restored = restored["params"]

    def fit(tree):
        return jax.tree.map(lambda t, r: np.asarray(r).astype(t.dtype),
                            params_template, tree)

    try:
        return fit(restored)
    except (ValueError, KeyError):
        from ..compat import from_scan_trunk, to_scan_trunk
        for conv in (to_scan_trunk, from_scan_trunk):
            try:
                return fit(conv(restored))
            except (ValueError, KeyError):
                continue
        raise


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [d for d in os.listdir(ckpt_dir) if d.startswith("step_")]
    if not steps:
        return None
    return os.path.join(ckpt_dir, sorted(steps)[-1])


def make_eval_fn(model_cfg: ModelConfig, lr_dir: str, side_dir: str,
                 gt_dir: str, max_frames: Optional[int] = 32):
    """Periodic-eval hook (the reference's per-`val_itv` ParkScene run,
    `train_LD_37.py:393-412`): streaming inference over one sequence +
    Y/crop4 PSNR/SSIM vs the GT PNG tree."""
    from ..data.io import load_eval_sequence, read_gray
    from ..infer.pipeline import StreamingInferencer
    from ..metrics.psnr_ssim import calculate_psnr, calculate_ssim
    from ..models import CVSRV8

    data = load_eval_sequence(lr_dir, side_dir, max_frames)
    eval_model = CVSRV8(ModelConfig(**{**model_cfg.__dict__,
                                       "mask_mode": "expected"}))

    def eval_fn(state, epoch):
        inf = StreamingInferencer(eval_model, state.params)
        frames, _ = inf.run_sequence(data)
        psnrs, ssims = [], []
        for i, f in enumerate(frames):
            gt = read_gray(os.path.join(gt_dir, "%05d.png" % i))
            mh, mw = min(gt.shape[0], f.shape[0]), min(gt.shape[1], f.shape[1])
            a = f[:mh, :mw, None].astype(np.float64)
            b = gt[:mh, :mw, None].astype(np.float64)
            psnrs.append(calculate_psnr(a, b, 4, test_y_channel=True))
            ssims.append(calculate_ssim(a, b, 4, test_y_channel=True))
        metrics = {"psnr": float(np.mean(psnrs)), "ssim": float(np.mean(ssims))}
        print(json.dumps({"epoch": epoch, **metrics}))
        return metrics

    return eval_fn


def train_loop(model_cfg: ModelConfig, data_cfg: DataConfig,
               train_cfg: TrainConfig, data_root: str,
               num_epochs: Optional[int] = None,
               steps_per_epoch: Optional[int] = None,
               log_dir: Optional[str] = None,
               eval_fn: Optional[Callable] = None,
               use_mesh: bool = True,
               cache_path: Optional[str] = None,
               use_native_batcher: bool = True,
               host_id: int = 0, num_hosts: int = 1):
    """Returns the final TrainState. ``eval_fn(state, epoch)`` optional.

    ``host_id``/``num_hosts`` (from
    :func:`cdfo_tpu.parallel.initialize_distributed`) stride-shard the
    sequence list per host — the reference's latent ``DistSampler``
    (`opt/deep_learning.py:50-105`) as input sharding."""
    model = CVSRV8(model_cfg)
    ds = CVCPDataset(data_root, data_cfg, cache_path=cache_path,
                     host_id=host_id, num_hosts=num_hosts)
    from .. data import native as native_batcher
    if use_native_batcher and native_batcher.available():
        batcher = native_batcher.NativeBatcher(
            ds, train_cfg.batch_size, data_cfg.crop_size, seed=train_cfg.seed)
    else:
        batcher = TrainBatcher(ds, train_cfg.batch_size, data_cfg.crop_size,
                               seed=train_cfg.seed)
    spe = steps_per_epoch or max(1, len(ds) // train_cfg.batch_size)
    epochs = num_epochs or train_cfg.epochs

    sample = batcher.sample_batch()
    state = create_train_state(model, train_cfg, sample, steps_per_epoch=spe)

    mesh = None
    if use_mesh and len(jax.devices()) > 1:
        mesh = make_mesh((len(jax.devices()),), ("data",))
        state = replicate(mesh, state)

    ckpt_dir = os.path.join(train_cfg.ckpt_dir,
                            f"{data_cfg.coding_cfg}_{data_cfg.qp}", "ckpt")
    os.makedirs(ckpt_dir, exist_ok=True)
    latest = latest_checkpoint(ckpt_dir)
    if latest:
        state = restore_checkpoint(latest, state)
        print(f"resumed from {latest} at step {int(state.step)}")

    writer = None
    if log_dir:
        from tensorboardX import SummaryWriter
        writer = SummaryWriter(log_dir)

    step_fn = jax.jit(train_step, donate_argnums=(0,))
    rng = jax.random.PRNGKey(train_cfg.seed)
    it = batcher.prefetch()
    log_path = os.path.join(train_cfg.ckpt_dir,
                            f"{data_cfg.coding_cfg}_{data_cfg.qp}",
                            "training_log.jsonl")

    start_epoch = int(state.step) // spe
    for epoch in range(start_epoch, epochs):
        losses = []
        t0 = time.time()
        for _ in range(spe):
            batch = next(it)
            if mesh is not None:
                batch = shard_batch(mesh, batch)
            rng, sub = jax.random.split(rng)
            state, loss = step_fn(state, batch, sub)
            losses.append(loss)
        avg = float(np.mean([float(l) for l in losses]))
        dt = time.time() - t0
        msg = {"epoch": epoch + 1, "loss": round(avg, 5),
               "sec_per_epoch": round(dt, 2)}
        print(json.dumps(msg))
        with open(log_path, "a") as f:
            f.write(json.dumps(msg) + "\n")
        if writer:
            writer.add_scalar("Train/Loss", avg, epoch)
        if (epoch + 1) % train_cfg.val_interval == 0:
            save_checkpoint(ckpt_dir, state, int(state.step))
            if eval_fn is not None:
                metrics = eval_fn(state, epoch + 1)
                if writer and metrics:
                    for k, v in metrics.items():
                        writer.add_scalar(f"Eval/{k}", v, epoch)
    return state
