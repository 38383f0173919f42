#!/usr/bin/env python
"""Training-convergence soak at the reference recipe (VERDICT r4 item 5).

One command orchestrates the full story on a structured synthetic
mini-CVCP tree (learnable content; `make_synthetic_cvcp_tree(
structured=True)`):

  1. phase-1 training subprocess (full-depth CVSR_V8, batch 20, bf16,
     Adam 1e-4 / wd 1e-5, Charbonnier-sum, seed 4, periodic eval +
     Orbax checkpoints) is SIGKILLed mid-run;
  2. phase-2 relaunches the identical command — `train_loop` auto-
     resumes from the latest checkpoint — and runs to completion;
  3. the final checkpoint is restored twice and compared bit-for-bit
     (resume consistency), and held-out-frame PSNR must beat MATLAB
     bicubic x4 by a clear margin.

Artifacts (training_log.jsonl + summary.json) land in --out.

Run:  python tools/soak.py --out results_evl/soak_r5 [--steps 2400]
"""
import argparse
import json
import os
import shutil
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def eval_psnr(model_cfg, params, ds, calculate_psnr, frame0=20):
    """PSNR of one eval window from a SEPARATELY-SEEDED tree (content the
    trainer never saw) + the bicubic x4 baseline on the same window."""
    import jax
    import jax.numpy as jnp

    from cdfo_tpu.metrics.matlab import imresize
    from cdfo_tpu.models import CVSRV8

    model = CVSRV8(model_cfg)
    n = 7
    lrs = ds.lr[0, frame0:frame0 + n].astype(np.float32) / 255.0
    hr = ds.hr[0, frame0 + n // 2].astype(np.float32)
    pm = ds.pm[0, frame0:frame0 + n].astype(np.float32) / 255.0
    rm = ds.rm[0, frame0:frame0 + n].astype(np.float32) / 255.0
    uf = ds.uf[0, frame0:frame0 + n].astype(np.float32) / 255.0
    zmv = np.zeros((1, n) + lrs.shape[1:] + (2,), np.float32)
    args = (lrs[None, ..., None], zmv, zmv, pm[None, ..., None],
            rm[None, ..., None], uf[None, ..., None])
    sr, _ = jax.jit(model.apply)(params, *args)
    sr8 = np.clip(np.asarray(sr[0, ..., 0], np.float32), 0, 1) * 255.0
    psnr = calculate_psnr(sr8[..., None], hr[..., None], 4)
    bic = np.clip(imresize(lrs[n // 2], 4.0), 0, 1) * 255.0
    psnr_bic = calculate_psnr(bic[..., None], hr[..., None], 4)
    return float(psnr), float(psnr_bic)


def phase_train(args):
    """Child process: the actual training run (auto-resumes)."""
    from cdfo_tpu.utils import apply_platform_env, enable_compilation_cache
    apply_platform_env()
    enable_compilation_cache()
    import jax.numpy as jnp

    from cdfo_tpu.config import DataConfig, ModelConfig, TrainConfig
    from cdfo_tpu.data.dataset import CVCPDataset
    from cdfo_tpu.metrics.psnr_ssim import calculate_psnr
    from cdfo_tpu.train.loop import train_loop

    spe = 50
    data_cfg = DataConfig(coding_cfg="LD", qp=37, frames_per_seq=32)
    model_cfg = ModelConfig(mask_mode="sample",
                            compute_dtype=jnp.bfloat16)
    train_cfg = TrainConfig(batch_size=20, epochs=args.steps // spe,
                            val_interval=5, seed=4,
                            ckpt_dir=os.path.join(args.out, "train"))
    ecfg = ModelConfig(mask_mode="expected", compute_dtype=jnp.bfloat16)
    ds_eval = CVCPDataset(args.root + "_eval", data_cfg)

    def eval_fn(state, epoch):
        p, pb = eval_psnr(ecfg, state.params, ds_eval, calculate_psnr)
        rec = {"epoch": epoch, "psnr": round(p, 4),
               "psnr_bicubic": round(pb, 4)}
        print(json.dumps({"eval": rec}), flush=True)
        with open(os.path.join(args.out, "eval_log.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")
        return {"psnr": p}

    train_loop(model_cfg, data_cfg, train_cfg, args.root,
               steps_per_epoch=spe, eval_fn=eval_fn,
               cache_path=os.path.join(args.root, "_cache"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="results_evl/soak_r5")
    p.add_argument("--root", default="/tmp/cvcp_soak")
    p.add_argument("--steps", type=int, default=2400)
    p.add_argument("--kill-after", type=float, default=600.0,
                   help="seconds before SIGKILLing phase 1")
    p.add_argument("--phase", default="orchestrate")
    args = p.parse_args()

    if args.phase == "train":
        phase_train(args)
        return

    os.makedirs(args.out, exist_ok=True)
    if not os.path.exists(os.path.join(args.root, "sequences_list.csv")):
        from cdfo_tpu.data.io import make_synthetic_cvcp_tree
        print("building structured tree ...", flush=True)
        make_synthetic_cvcp_tree(args.root, num_seqs=8, frames=32,
                                 h=96, w=96, qp=37, cfg="LD",
                                 structured=True)
        # UNSEEN content for eval: a separately-seeded 1-sequence tree
        make_synthetic_cvcp_tree(args.root + "_eval", num_seqs=1,
                                 frames=32, h=96, w=96, qp=37, cfg="LD",
                                 structured=True, seed=1234)

    cmd = [sys.executable, os.path.abspath(__file__), "--phase", "train",
           "--root", args.root, "--out", args.out,
           "--steps", str(args.steps)]

    # phase 1: train, then kill -9 mid-run
    t0 = time.time()
    child = subprocess.Popen(cmd)
    try:
        child.wait(timeout=args.kill_after)
        print("phase 1 finished before the kill window — shorten "
              "--kill-after for a harsher test", flush=True)
        killed = False
    except subprocess.TimeoutExpired:
        child.send_signal(signal.SIGKILL)
        child.wait()
        killed = True
        print(f"phase 1 SIGKILLed after {time.time() - t0:.0f}s",
              flush=True)

    # phase 2: identical command; train_loop auto-resumes from the
    # latest checkpoint
    rc = subprocess.call(cmd)
    assert rc == 0, f"phase 2 failed rc={rc}"

    # verification: bit-consistent restore + final PSNR vs bicubic
    from cdfo_tpu.utils import apply_platform_env
    apply_platform_env()
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    from cdfo_tpu.config import DataConfig, ModelConfig, TrainConfig
    from cdfo_tpu.data.dataset import CVCPDataset, TrainBatcher
    from cdfo_tpu.metrics.psnr_ssim import calculate_psnr
    from cdfo_tpu.models import CVSRV8
    from cdfo_tpu.train.loop import latest_checkpoint, restore_checkpoint
    from cdfo_tpu.train.state import create_train_state

    data_cfg = DataConfig(coding_cfg="LD", qp=37, frames_per_seq=32)
    ds = CVCPDataset(args.root, data_cfg,
                     cache_path=os.path.join(args.root, "_cache"))
    ds_eval = CVCPDataset(args.root + "_eval", data_cfg)
    model_cfg = ModelConfig(mask_mode="sample", compute_dtype=jnp.bfloat16)
    sample = TrainBatcher(ds, 2, crop=64, seed=4).sample_batch()
    tc = TrainConfig(batch_size=20, ckpt_dir=os.path.join(args.out, "train"))
    state = create_train_state(CVSRV8(model_cfg), tc, sample,
                               steps_per_epoch=50)
    ck = latest_checkpoint(os.path.join(args.out, "train", "LD_37", "ckpt"))
    s1 = restore_checkpoint(ck, state)
    s2 = restore_checkpoint(ck, state)
    for a, b in zip(jtu.tree_leaves(s1.params), jtu.tree_leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    ecfg = ModelConfig(mask_mode="expected", compute_dtype=jnp.bfloat16)
    psnr, psnr_bic = eval_psnr(ecfg, s1.params, ds_eval, calculate_psnr)
    summary = {
        "steps": int(s1.step), "killed_mid_run": killed,
        "final_psnr": round(psnr, 4), "bicubic_psnr": round(psnr_bic, 4),
        "margin_db": round(psnr - psnr_bic, 4),
        "resume_bit_consistent": True,
    }
    # keep the training/eval curves next to the summary
    src = os.path.join(args.out, "train", "LD_37", "training_log.jsonl")
    if os.path.exists(src):
        shutil.copy(src, os.path.join(args.out, "training_log.jsonl"))
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))
    assert psnr > psnr_bic + 0.5, "model does not beat bicubic"


if __name__ == "__main__":
    main()
