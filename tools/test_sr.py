#!/usr/bin/env python
"""Evaluation CLI — `test_LD_37.py` semantics: sliding-window inference over
JCT-VC sequences, SR PNGs written out, then PSNR/SSIM (Y, crop_border=4).

Examples:
  python tools/test_sr.py --lr-dir .../lr_grey/Seq.yuv --side-dir .../side/Seq \
      --gt-dir .../gt_Y/Seq --ckpt training_results/LD_37/ckpt/step_xxx
  python tools/test_sr.py --synthetic           # self-contained smoke run
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="cdfo_tpu eval")
    p.add_argument("--lr-dir", default="")
    p.add_argument("--side-dir", default="")
    p.add_argument("--gt-dir", default="")
    p.add_argument("--ckpt", default="")
    p.add_argument("--save-dir", default="results_evl")
    p.add_argument("--max-frames", default=0, type=int)
    p.add_argument("--fps", action="store_true", help="report forward-only fps")
    p.add_argument("--mask-mode", default="expected",
                   choices=["expected", "sample"])
    p.add_argument("--dump-features", default="",
                   help="directory to save aligned-feature maps (the "
                        "reference's featuremap_visual, behind a flag)")
    p.add_argument("--scan-trunk", action="store_true",
                   help="scan-over-groups trunk (faster compile, same "
                        "math); unrolled checkpoints are adapted on load")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--cpu", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()
    from cdfo_tpu.utils import apply_platform_env, enable_compilation_cache
    apply_platform_env()
    enable_compilation_cache()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    from cdfo_tpu.config import ModelConfig
    from cdfo_tpu.models import CVSRV8
    from cdfo_tpu.infer.pipeline import StreamingInferencer, synthetic_sequence
    from cdfo_tpu.data.io import load_eval_sequence, write_gray
    from cdfo_tpu.metrics import calculate_psnr, calculate_ssim

    cfg = ModelConfig(mask_mode=args.mask_mode, scan_trunk=args.scan_trunk)
    model = CVSRV8(cfg, capture_features=bool(args.dump_features))

    if args.synthetic:
        data = synthetic_sequence(t=9, h=64, w=96)
        cfg = ModelConfig(scn_groups=1, mask_mode=args.mask_mode,
                          scan_trunk=args.scan_trunk)
        model = CVSRV8(cfg, capture_features=bool(args.dump_features))
    else:
        data = load_eval_sequence(args.lr_dir, args.side_dir,
                                  args.max_frames or None)

    h, w = data.lr.shape[1:]
    dummy = np.zeros((1, 7, h, w, 1), np.float32)
    dmv = np.zeros((1, 7, h, w, 2), np.float32)
    params = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
        dummy, dmv, dmv, dummy, dummy, dummy)
    if args.ckpt:
        from cdfo_tpu.train.loop import restore_params
        params = restore_params(args.ckpt, params)

    inf = StreamingInferencer(model, params,
                              mask_rng=jax.random.PRNGKey(2))
    frames, fps = inf.run_sequence(data, collect_timing=args.fps)

    os.makedirs(args.save_dir, exist_ok=True)
    for i, f in enumerate(frames):
        write_gray(os.path.join(args.save_dir, "%05d.png" % i), f)
    print(f"wrote {len(frames)} SR frames to {args.save_dir}")
    if fps:
        print(f"forward-only fps: {fps:.3f}")

    if args.dump_features:
        # one representative window through the capturing model
        window = inf._build_window(data, min(3, data.num_frames - 1))
        _, state = model.apply(params, *window, mutable=["intermediates"],
                               rngs={"gumbel": jax.random.PRNGKey(0)})
        feats = state["intermediates"]["aligned_fea"][0]  # (B,N,H,W,C)
        os.makedirs(args.dump_features, exist_ok=True)
        f = np.asarray(feats)[0]
        for n in range(f.shape[0]):
            fmap = f[n].mean(axis=-1)
            fmap = (fmap - fmap.min()) / (np.ptp(fmap) + 1e-8) * 255
            write_gray(os.path.join(args.dump_features,
                                    f"aligned_fea_f{n}.png"),
                       fmap.astype(np.uint8))
        print(f"dumped {f.shape[0]} aligned-feature maps to "
              f"{args.dump_features}")

    if args.gt_dir:
        psnrs, ssims = [], []
        from cdfo_tpu.data.io import read_gray
        for i in range(len(frames)):
            gt = read_gray(os.path.join(args.gt_dir, "%05d.png" % i))
            mh = min(gt.shape[0], frames[i].shape[0])
            mw = min(gt.shape[1], frames[i].shape[1])
            a = frames[i][:mh, :mw, None].astype(np.float64)
            b = gt[:mh, :mw, None].astype(np.float64)
            psnrs.append(calculate_psnr(a, b, 4, test_y_channel=True))
            ssims.append(calculate_ssim(a, b, 4, test_y_channel=True))
        print(f"PSNR {np.mean(psnrs):.3f}  SSIM {np.mean(ssims):.5f}")


if __name__ == "__main__":
    main()
