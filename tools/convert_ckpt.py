#!/usr/bin/env python
"""Convert a released CDFO torch checkpoint (.pth state_dict of CVSR_V8)
into an Orbax checkpoint consumable by tools/test_sr.py --ckpt.

  python tools/convert_ckpt.py --pth LD_QP37_J_epoch-9500.pth --out ckpt_dir
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pth", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--cpu", action="store_true", default=True)
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    from cdfo_tpu.compat.torch_convert import (
        convert_state_dict, load_torch_checkpoint)
    from cdfo_tpu.config import ModelConfig
    from cdfo_tpu.models import CVSRV8

    model = CVSRV8(ModelConfig(mask_mode="expected"))
    r = np.random.RandomState(0)
    dummy = r.rand(1, 7, 16, 16, 1).astype(np.float32)
    dmv = r.rand(1, 7, 16, 16, 2).astype(np.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), dummy, dmv, dmv,
                                 dummy, dummy, dummy)
    sd = load_torch_checkpoint(args.pth)
    new_params, report = convert_state_dict(sd, params)
    if report["missing"]:
        print(f"WARNING: {len(report['missing'])} flax params unmatched:")
        for k, pth in report["missing"][:10]:
            print("  ", k, "<-", pth)
    if report["unused"]:
        print(f"WARNING: {len(report['unused'])} torch keys unused:")
        for k in report["unused"][:10]:
            print("  ", k)

    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    out = os.path.abspath(args.out)
    ckptr.save(out, {"params": new_params})
    ckptr.wait_until_finished()
    print(f"saved converted params to {out}")


if __name__ == "__main__":
    main()
