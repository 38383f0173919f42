#!/usr/bin/env python
"""Full JCT-VC evaluation — `test_LD_37.py:237-263` semantics: the 10
LD-QP37 sequences, sliding-window inference with the recurrent cache, SR
PNGs written per sequence, then Y/crop4 PSNR/SSIM (+ optional tOF) against
the GT trees, results appended to a log file.

  python tools/eval_jctvc.py --test-root ./test_data --ckpt <orbax_dir> \
      --qp 37 --cfg LD --out results_evl --log log/LD_ours.txt
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# `test_LD_37.py:238-261`
SEQUENCES = [
    ("BasketballDrive_fps50_480x272_500F.yuv", "BasketballDrive_1920x1080_50_500F.yuv"),
    ("Kimono1_fps24_480x272_240F.yuv", "Kimono1_1920x1080_24_240F.yuv"),
    ("BQTerrace_fps60_480x272_600F.yuv", "BQTerrace_1920x1080_60_600F.yuv"),
    ("ParkScene_fps24_480x272_240F.yuv", "ParkScene_1920x1080_24_240F.yuv"),
    ("Traffic_640x400_300F.yuv", "Traffic_2560x1600_30.yuv"),
    ("PeopleOnStreet_640x400_150F.yuv", "PeopleOnStreet_2560x1600_30.yuv"),
    ("KristenAndSara_320x184_600F.yuv", "KristenAndSara_1280x720_60.yuv"),
    ("Johnny_320x184_600F.yuv", "Johnny_1280x720_60.yuv"),
    ("FourPeople_320x184_600F.yuv", "FourPeople_1280x720_60.yuv"),
    ("Cactus_480x272_500F.yuv", "Cactus_1920x1080_50.yuv"),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--test-root", required=True,
                   help="dir with <cfg>/qp<QP>/lr_grey + sideInfo_QP<QP> + gt_Y")
    p.add_argument("--ckpt", default="")
    p.add_argument("--qp", default=37, type=int)
    p.add_argument("--cfg", default="LD")
    p.add_argument("--out", default="results_evl")
    p.add_argument("--log", default="log/eval_jctvc.txt")
    p.add_argument("--max-frames", default=0, type=int)
    p.add_argument("--sequences", nargs="*", default=None,
                   help="subset of sequence names (default: all 10)")
    p.add_argument("--tof", action="store_true")
    p.add_argument("--fps", action="store_true")
    p.add_argument("--scan-trunk", action="store_true",
                   help="scan-over-groups trunk (faster compile, same "
                        "math); unrolled checkpoints adapt on load")
    args = p.parse_args()
    from cdfo_tpu.utils import apply_platform_env, enable_compilation_cache
    apply_platform_env()
    enable_compilation_cache()

    import jax
    from cdfo_tpu.config import ModelConfig
    from cdfo_tpu.models import CVSRV8
    from cdfo_tpu.data.io import load_eval_sequence, write_gray
    from cdfo_tpu.infer.pipeline import StreamingInferencer
    from cdfo_tpu.metrics.psnr_ssim import cal_psnr_ssim, cal_psnr_ssim_tof

    qp, cfg = args.qp, args.cfg
    lr_root = os.path.join(args.test_root, cfg, f"qp{qp}", "lr_grey")
    side_root = os.path.join(args.test_root, cfg, f"qp{qp}", f"sideInfo_QP{qp}")
    gt_root = os.path.join(args.test_root, "gt_Y")

    model = CVSRV8(ModelConfig(mask_mode="expected",
                           scan_trunk=args.scan_trunk))
    params = None
    inf = None
    os.makedirs(os.path.dirname(args.log) or ".", exist_ok=True)
    results = []

    seqs = SEQUENCES
    if args.sequences:
        seqs = [s for s in SEQUENCES if s[0] in set(args.sequences)]

    for seq, gt in seqs:
        lr_dir = os.path.join(lr_root, seq)
        side_dir = os.path.join(side_root, seq[:-4])
        data = load_eval_sequence(lr_dir, side_dir, args.max_frames or None)
        if params is None:
            h, w = data.lr.shape[1:]
            d = np.zeros((1, 7, h, w, 1), np.float32)
            dm = np.zeros((1, 7, h, w, 2), np.float32)
            params = jax.jit(model.init)(jax.random.PRNGKey(0), d, dm, dm,
                                         d, d, d)
            if args.ckpt:
                from cdfo_tpu.train.loop import restore_params
                params = restore_params(args.ckpt, params)
        inf = StreamingInferencer(model, params)
        frames, fps = inf.run_sequence(data, collect_timing=args.fps)
        save_dir = os.path.join(args.out, f"{cfg}_QP{qp}", seq)
        for i, f in enumerate(frames):
            write_gray(os.path.join(save_dir, "%05d.png" % i), f)
        nf = len(frames)
        if args.tof:
            res = cal_psnr_ssim_tof(os.path.join(args.out, f"{cfg}_QP{qp}") + "/",
                                    [seq], [gt], gt_root + "/", num_frames=nf)
            _, psnr, ssim, tof = res[0]
            entry = {"seq": seq, "psnr": round(psnr, 3),
                     "ssim": round(ssim, 5), "tof": round(tof, 4)}
        else:
            psnr, ssim = cal_psnr_ssim(
                os.path.join(args.out, f"{cfg}_QP{qp}") + "/",
                [seq], [gt], gt_root + "/", num_frames=nf)
            entry = {"seq": seq, "psnr": round(psnr, 3), "ssim": round(ssim, 5)}
        if fps:
            entry["fps"] = round(fps, 3)
        results.append(entry)
        with open(args.log, "a") as f:
            f.write(json.dumps(entry) + "\n")
        print(json.dumps(entry))

    if results:
        mean = {"psnr": round(float(np.mean([r["psnr"] for r in results])), 3),
                "ssim": round(float(np.mean([r["ssim"] for r in results])), 5)}
        print(json.dumps({"mean": mean, "sequences": len(results)}))
        with open(args.log, "a") as f:
            f.write(json.dumps({"mean": mean}) + "\n")


if __name__ == "__main__":
    main()
