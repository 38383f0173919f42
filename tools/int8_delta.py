#!/usr/bin/env python
"""Measure the end-to-end PSNR cost of the opt-in int8 turbo trunk
(`ModelConfig.trunk_int8`) on a genuinely-trained small CVSR_V8.

Trains on synthetic structured video (same harness as
tools/gumbel_variance.py), then evaluates the SAME parameters through
three trunks: the XLA reference trunk, the exact fused-kernel trunk, and
the int8 turbo trunk. Reports PSNR and deltas.

Run: python tools/int8_delta.py [--steps 300]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from gumbel_variance import make_structured_videos  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
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
                               mask_mode="expected"))
    r = np.random.RandomState(0)

    def window(lrs_arr, s, f0):
        return lrs_arr[s, f0:f0 + n][..., None][None].astype(np.float32)

    zmv = np.zeros((1, n, h, w, 2), np.float32)

    def priors(lrs_win):
        blur = lrs_win.copy()
        blur[..., 1:-1, :, 0] = (lrs_win[..., :-2, :, 0]
                                 + lrs_win[..., 2:, :, 0]) / 2
        rmsw = np.abs(lrs_win - blur)
        return lrs_win, rmsw, lrs_win

    w0 = window(lr_tr, 0, 0)
    pm0, rm0, uf0 = priors(w0)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), w0, zmv, zmv, pm0, rm0, uf0)

    tx = optax.adam(3e-4)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, lrs, hr, prs):
        def loss_fn(p):
            sr, _ = model.apply(p, lrs, zmv, zmv, *prs)
            return jnp.mean(jnp.sqrt((sr - hr) ** 2 + 1e-6))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, upd), opt_state, loss

    t0 = time.time()
    for i in range(args.steps):
        s = r.randint(0, lr_tr.shape[0])
        f0 = r.randint(0, t - n + 1)
        win = window(lr_tr, s, f0)
        prs = tuple(jnp.asarray(a) for a in priors(win))
        hr = jnp.asarray(hr_tr[s, f0 + n // 2][None, ..., None])
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(win), hr, prs)
    print(f"trained {args.steps} steps in {time.time()-t0:.0f}s "
          f"(final loss {float(loss):.3f})")

    def eval_psnr(**cfg_kw):
        m = CVSRV8(ModelConfig(scn_groups=args.scn_groups,
                               mask_mode="expected", **cfg_kw))
        fwd = jax.jit(lambda p, lrs, prs: m.apply(p, lrs, zmv, zmv, *prs))
        psnrs = []
        for s in range(lr_ev.shape[0]):
            for f0 in range(0, t - n + 1):
                win = window(lr_ev, s, f0)
                prs = tuple(jnp.asarray(a) for a in priors(win))
                sr, _ = fwd(params, jnp.asarray(win), prs)
                img = np.clip(np.asarray(sr)[0, :, :, 0], 0, 1) * 255
                gt = hr_ev[s, f0 + n // 2] * 255
                psnrs.append(calculate_psnr(img, gt, crop_border=4))
        return float(np.mean(psnrs))

    ref = eval_psnr(fused_trunk=False)
    exact = eval_psnr(fused_trunk=True)
    turbo = eval_psnr(fused_trunk=True, trunk_int8=True)
    print(f"XLA trunk PSNR:        {ref:.4f} dB")
    print(f"fused exact PSNR:      {exact:.4f} dB  (delta {exact-ref:+.4f})")
    print(f"int8 turbo PSNR:       {turbo:.4f} dB  (delta {turbo-ref:+.4f})")


if __name__ == "__main__":
    main()
