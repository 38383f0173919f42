#!/usr/bin/env python
"""Quantify the EGLA gumbel-mask eval variance (SURVEY §7.3 ambiguity).

The reference's EGLA draws gumbel noise even at eval time
(`arch/SIDECVSR_our.py:2168-2177`), so two eval runs of the same checkpoint
differ. This tool trains a small CVSR_V8 on synthetic structured video
until it genuinely super-resolves, then measures PSNR with
``mask_mode='sample'`` across N seeds vs the deterministic
``mask_mode='expected'`` — the numbers that justify our eval default
(expected) and size the parity budget contribution.

Run: python tools/gumbel_variance.py [--steps 300] [--seeds 8]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_structured_videos(n_seq, t, h, w, seed=0):
    """Smooth moving random fields; HR (n,t,4h,4w), LR = MATLAB bicubic /4."""
    from cdfo_tpu.metrics.matlab import imresize

    r = np.random.RandomState(seed)
    hrs = np.empty((n_seq, t, 4 * h, 4 * w), np.float32)
    lrs = np.empty((n_seq, t, h, w), np.float32)
    yy, xx = np.mgrid[0:4 * h, 0:4 * w].astype(np.float64)
    for s in range(n_seq):
        phases = r.rand(6, 4) * [0.2, 0.2, 6.28, 1.0]
        dx, dy = r.randn(2) * 1.5
        for ti in range(t):
            img = np.zeros((4 * h, 4 * w))
            for fy, fx, ph, amp in phases:
                img += amp * np.sin(fy * (yy + dy * ti * 4)
                                    + fx * (xx + dx * ti * 4) + ph)
            img = (img - img.min()) / (np.ptp(img) + 1e-9)
            hrs[s, ti] = img
            lrs[s, ti] = imresize(img, 0.25, antialiasing=True)
    return lrs, hrs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--seeds", type=int, default=8)
    p.add_argument("--scn-groups", type=int, default=2)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from cdfo_tpu.config import ModelConfig
    from cdfo_tpu.models import CVSRV8
    from cdfo_tpu.metrics.psnr_ssim import calculate_psnr

    h = w = 32
    n, t = 7, 9
    lr_tr, hr_tr = make_structured_videos(6, t, h, w, seed=0)
    lr_ev, hr_ev = make_structured_videos(2, t, h, w, seed=99)

    model = CVSRV8(ModelConfig(scn_groups=args.scn_groups,
                               mask_mode="sample"))
    r = np.random.RandomState(0)

    def window(lrs_arr, s, f0, crop=None):
        win = lrs_arr[s, f0:f0 + n][..., None]
        return win[None].astype(np.float32)

    zmv = np.zeros((1, n, h, w, 2), np.float32)
    # non-degenerate priors so the EGLA residual-mask branch is EXERCISED:
    # residual = LR high-frequency detail proxy, pred = LR itself
    def priors(lrs_win):
        blur = lrs_win.copy()
        blur[..., 1:-1, :, 0] = (lrs_win[..., :-2, :, 0]
                                 + lrs_win[..., 2:, :, 0]) / 2
        rmsw = np.abs(lrs_win - blur)
        return lrs_win, rmsw, lrs_win  # pms, rms, ufs

    w0 = window(lr_tr, 0, 0)
    pm0, rm0, uf0 = priors(w0)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), w0, zmv, zmv, pm0, rm0, uf0)

    tx = optax.adam(3e-4)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, lrs, hr, rng, prs):
        def loss_fn(p):
            sr, _ = model.apply(p, lrs, zmv, zmv, *prs,
                                rngs={"gumbel": rng})
            return jnp.mean(jnp.sqrt((sr - hr) ** 2 + 1e-6))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, upd), opt_state, loss

    rng = jax.random.PRNGKey(1)
    t0 = time.time()
    for i in range(args.steps):
        s = r.randint(0, lr_tr.shape[0])
        f0 = r.randint(0, t - n + 1)
        win = window(lr_tr, s, f0)
        lrs = jnp.asarray(win)
        prs = tuple(jnp.asarray(a) for a in priors(win))
        hr = jnp.asarray(hr_tr[s, f0 + n // 2][None, ..., None])
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, lrs, hr, sub, prs)
    print(f"trained {args.steps} steps in {time.time()-t0:.0f}s "
          f"(final loss {float(loss):.1f})")

    def eval_psnr(mode, seed=0):
        m = CVSRV8(ModelConfig(scn_groups=args.scn_groups, mask_mode=mode))
        fwd = jax.jit(lambda p, lrs, prs, rng: m.apply(
            p, lrs, zmv, zmv, *prs,
            rngs={"gumbel": rng} if mode == "sample" else None))
        psnrs = []
        key = jax.random.PRNGKey(seed)
        for s in range(lr_ev.shape[0]):
            for f0 in range(0, t - n + 1):
                key, sub = jax.random.split(key)
                win = window(lr_ev, s, f0)
                prs = tuple(jnp.asarray(a) for a in priors(win))
                sr, _ = fwd(params, jnp.asarray(win), prs, sub)
                img = np.clip(np.asarray(sr)[0, :, :, 0], 0, 1) * 255
                gt = hr_ev[s, f0 + n // 2] * 255
                psnrs.append(calculate_psnr(img, gt, crop_border=4))
        return float(np.mean(psnrs))

    exp_psnr = eval_psnr("expected")
    samples = [eval_psnr("sample", seed=k) for k in range(args.seeds)]
    print(f"expected-mode PSNR: {exp_psnr:.4f} dB")
    print(f"sample-mode  PSNR: mean {np.mean(samples):.4f} dB, "
          f"std {np.std(samples):.4f} dB, "
          f"range [{min(samples):.4f}, {max(samples):.4f}] over "
          f"{args.seeds} seeds")
    print(f"expected-vs-sample-mean delta: "
          f"{exp_psnr - np.mean(samples):+.4f} dB")


if __name__ == "__main__":
    main()
