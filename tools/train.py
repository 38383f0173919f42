#!/usr/bin/env python
"""Training CLI — the `train_LD_37.py` / `train_RA_37.py` entry points,
unified (the reference pair differs only in dataset paths, batch size and
val interval — `train_RA_37.py:153,156`).

Examples:
  python tools/train.py --cfg LD --qp 37 --data-root /data/CVCP
  python tools/train.py --cfg RA --qp 37 --data-root /data/CVCP --epochs 100
  python tools/train.py --synthetic --epochs 2      # smoke run, tiny tree
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="cdfo_tpu trainer")
    p.add_argument("--cfg", default="LD", choices=["LD", "RA"])
    p.add_argument("--qp", default=37, type=int)
    p.add_argument("--data-root", default="")
    p.add_argument("--lr", default=1e-4, type=float)
    p.add_argument("--epochs", default=30000, type=int)
    p.add_argument("--batch-size", default=0, type=int, help="0 = preset")
    p.add_argument("--val-itv", default=0, type=int, help="0 = preset")
    p.add_argument("--weight-decay", default=1e-5, type=float)
    p.add_argument("--seed", default=4, type=int)
    p.add_argument("--ckpt-dir", default="training_results")
    p.add_argument("--cache", default="", help="packed .npz dataset cache")
    p.add_argument("--steps-per-epoch", default=0, type=int)
    p.add_argument("--synthetic", action="store_true",
                   help="generate + train on a tiny synthetic CVCP tree")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: jax.distributed.initialize + per-host "
                        "input sharding (the init_dist/DistSampler "
                        "equivalent; auto-detects on TPU pods)")
    p.add_argument("--cpu", action="store_true", help="force CPU devices")
    p.add_argument("--fused-trunk", action="store_true",
                   help="train through the Pallas trunk/head kernels "
                        "(exact custom-VJP backward, ops/fused_vjp.py)")
    p.add_argument("--scan-trunk", action="store_true",
                   help="scan-over-groups trunk: same math, several-fold "
                        "smaller XLA program / faster compile "
                        "(checkpoints save in the stacked layout; "
                        "cdfo_tpu.compat converts)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (fp32 params/loss)")
    p.add_argument("--eval-lr-dir", default="",
                   help="validation sequence LR dir (periodic eval)")
    p.add_argument("--eval-side-dir", default="")
    p.add_argument("--eval-gt-dir", default="")
    return p.parse_args()


def main():
    args = parse_args()
    host_id, num_hosts = 0, 1
    # platform pinning must precede initialize_distributed(), which
    # initialises the JAX backend (it calls jax.process_index()); env
    # mutations after that point are silently ineffective (ADVICE r4)
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    from cdfo_tpu.utils import apply_platform_env, enable_compilation_cache
    apply_platform_env()
    if args.distributed:
        from cdfo_tpu.parallel import initialize_distributed
        host_id, num_hosts = initialize_distributed()
    enable_compilation_cache()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from cdfo_tpu.config import DataConfig, ModelConfig, TrainConfig
    from cdfo_tpu.train.loop import train_loop

    is_ra = args.cfg == "RA"
    data_cfg = DataConfig(coding_cfg=args.cfg, qp=args.qp,
                          zero_mvl1_in_train=not is_ra)
    train_cfg = TrainConfig(
        lr=args.lr,
        weight_decay=args.weight_decay,
        batch_size=args.batch_size or (24 if is_ra else 20),
        epochs=args.epochs,
        val_interval=args.val_itv or (400 if is_ra else 200),
        seed=args.seed,
        ckpt_dir=args.ckpt_dir,
    )
    import jax.numpy as jnp
    _mkw = dict(fused_trunk=args.fused_trunk, scan_trunk=args.scan_trunk,
                compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    model_cfg = ModelConfig(**_mkw)

    data_root = args.data_root
    spe = args.steps_per_epoch or None
    if args.synthetic:
        import tempfile
        from cdfo_tpu.data import make_synthetic_cvcp_tree
        data_root = tempfile.mkdtemp(prefix="cvcp_synth_")
        make_synthetic_cvcp_tree(data_root, num_seqs=2, frames=10, h=64, w=64,
                                 qp=args.qp, cfg=args.cfg)
        data_cfg = DataConfig(coding_cfg=args.cfg, qp=args.qp,
                              frames_per_seq=10,
                              zero_mvl1_in_train=not is_ra)
        train_cfg = TrainConfig(batch_size=2, epochs=args.epochs,
                                val_interval=max(1, args.epochs),
                                ckpt_dir=args.ckpt_dir, seed=args.seed)
        model_cfg = ModelConfig(scn_groups=1, **_mkw)
        spe = spe or 2

    eval_fn = None
    if args.eval_lr_dir:
        from cdfo_tpu.train.loop import make_eval_fn
        eval_fn = make_eval_fn(model_cfg, args.eval_lr_dir,
                               args.eval_side_dir, args.eval_gt_dir)

    train_loop(model_cfg, data_cfg, train_cfg, data_root,
               steps_per_epoch=spe,
               cache_path=args.cache or None,
               eval_fn=eval_fn,
               host_id=host_id, num_hosts=num_hosts)


if __name__ == "__main__":
    main()
