"""Training dataset + batcher for the CVCP coding-prior layout.

Reimplements the reference pipeline (`opt/data_LD_bi.py`) TPU-first:

* the RAM preload of uint8/int8 arrays (`:55-134`) becomes an on-disk packed
  cache (one .npz of exactly those arrays) built once and memory-mapped on
  subsequent runs — same numerics (incl. the int8 MV clip `:91`), minutes
  -> seconds startup;
* the per-sample transform chain RandomCrop(64) -> Augment -> ToTensor
  (`train_LD_37.py:303`) becomes a vectorised numpy batcher producing
  NHWC model-ready batches (crop, flip/rot with MV sign fixups, center-MV
  expansion, /255 and /4/32 scalings);
* worker processes are replaced by a prefetch thread; per-host sharding
  (`DistSampler` analog) = stride slicing over the sequence list.

Note the reference LD-training quirk: only mvl0 is expanded into flows;
mvl1 flows are all zero (`opt/data_LD_bi.py:473-489`) although the model
consumes mvs1 (`SIDECVSR_our.py:4445`). ``zero_mvl1`` preserves this;
set False to feed real L1 flows (the RA path and our recommended fix).
"""
from __future__ import annotations

import os
import queue
import threading
from typing import Iterator, Optional

import numpy as np

from ..config import DataConfig
from ..ops.mv import augment_mv
from .io import read_gray


class CVCPDataset:
    """Preloaded training arrays for one coding config + QP."""

    def __init__(self, root: str, cfg: DataConfig, seq_names=None,
                 cache_path: Optional[str] = None,
                 host_id: int = 0, num_hosts: int = 1):
        self.cfg = cfg
        c, qp, t = cfg.coding_cfg, cfg.qp, cfg.frames_per_seq
        if seq_names is None:
            import csv as _csv
            with open(os.path.join(root, "sequences_list.csv")) as f:
                rows = list(_csv.reader(f))
            seq_names = [r[0] for r in rows[1:] if r]
        # per-host shard of the sequence list (DistSampler analog)
        seq_names = seq_names[host_id::num_hosts]
        self.seq_names = seq_names

        if cache_path and os.path.exists(cache_path):
            z = np.load(cache_path, mmap_mode="r")
            self.lr, self.hr, self.pm, self.rm, self.uf = (
                z["lr"], z["hr"], z["pm"], z["rm"], z["uf"])
            self.mv0, self.mv1 = z["mv0"], z["mv1"]
            return

        n = len(seq_names)
        h, w = None, None
        lr_list, hr_list, pm_list, rm_list, uf_list, mv0_list, mv1_list = (
            [], [], [], [], [], [], [])
        for seq in seq_names:
            lr_dir = os.path.join(root, "Decoded_LR", c, f"QP{qp}",
                                  f"{c}_{seq}_32F_QP{qp}.yuv")
            hr_dir = os.path.join(root, "Uncompressed_HR", seq)
            pri = os.path.join(root, "Coding_Priors", c, f"QP{qp}",
                               f"{c}_{seq}_32F_QP{qp}.priors")
            unf = os.path.join(root, f"pred_unfiltered_{c}", f"QP{qp}",
                               f"{c}_{seq}_32F_QP{qp}.priors", "pred_unfiltered")
            lrs, hrs, pms, rms, ufs, mv0s, mv1s = [], [], [], [], [], [], []
            for f_i in range(t):
                idx = "%05d" % f_i
                lrs.append(read_gray(os.path.join(lr_dir, idx + ".png")))
                hrs.append(read_gray(os.path.join(hr_dir, idx + ".png")))
                pms.append(read_gray(os.path.join(
                    pri, "Partition_Map", idx + "_M_mask.png")))
                res = np.load(os.path.join(pri, "Residue", idx + "_res.npy"))
                if res.ndim == 3:
                    res = res[:, :, 0]
                rms.append(np.clip(res, -128, 127).astype(np.int8))
                ufs.append(read_gray(os.path.join(unf, idx + "_unflt.png")))
                mv0s.append(np.clip(
                    np.load(os.path.join(pri, "MV_l0", idx + "_mvl0.npy")),
                    -128, 127).astype(np.int8))
                mv1s.append(np.clip(
                    np.load(os.path.join(pri, "MV_l1", idx + "_mvl1.npy")),
                    -128, 127).astype(np.int8))
            lr_list.append(np.stack(lrs))
            hr_list.append(np.stack(hrs))
            pm_list.append(np.stack(pms))
            rm_list.append(np.stack(rms))
            uf_list.append(np.stack(ufs))
            mv0_list.append(np.stack(mv0s))
            mv1_list.append(np.stack(mv1s))
        self.lr = np.stack(lr_list)    # (S, T, H, W) uint8
        self.hr = np.stack(hr_list)    # (S, T, 4H, 4W) uint8
        self.pm = np.stack(pm_list)
        self.rm = np.stack(rm_list)    # int8
        self.uf = np.stack(uf_list)
        self.mv0 = np.stack(mv0_list)  # (S, T, H, W, 3) int8
        self.mv1 = np.stack(mv1_list)
        if cache_path:
            os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
            np.savez(cache_path, lr=self.lr, hr=self.hr, pm=self.pm,
                     rm=self.rm, uf=self.uf, mv0=self.mv0, mv1=self.mv1)

    def __len__(self):
        return self.lr.shape[0]


class TrainBatcher:
    """Yields model-ready NHWC batches with the reference's sampling and
    augmentation semantics."""

    def __init__(self, ds: CVCPDataset, batch_size: int, crop: int = 64,
                 seed: int = 4, zero_mvl1: Optional[bool] = None,
                 augment: bool = True):
        self.ds = ds
        self.b = batch_size
        self.crop = crop
        self.rng = np.random.RandomState(seed)
        self.augment = augment
        self.zero_mvl1 = (ds.cfg.zero_mvl1_in_train
                          if zero_mvl1 is None else zero_mvl1)
        self.n = ds.cfg.nframes

    def _expand_center_mv_ra(self, mv0: np.ndarray, mv1: np.ndarray) -> np.ndarray:
        """Random-Access bidirectional expansion (`opt/data_RA_bi.py:496-528`):
        backward flow from mvl0/(-refoff), forward flow from mvl1/refoff,
        cross-complemented where either side is unavailable (refoff == -99),
        scaled outward; both mvl0s and mvl1s get the SAME tensor, /4 /32."""
        n = self.n
        c = n // 2
        out = np.zeros((n, *mv0.shape[:2], 2), np.float32)
        with np.errstate(divide="ignore", invalid="ignore"):
            bx = mv0[:, :, 0] / (mv0[:, :, 2] * -1.0)
            by = mv0[:, :, 1] / (mv0[:, :, 2] * -1.0)
            fx = mv1[:, :, 0] / mv1[:, :, 2]
            fy = mv1[:, :, 1] / mv1[:, :, 2]
        m0u = mv0[:, :, 2] == -99
        m1u = mv1[:, :, 2] == -99
        out[c - 1, :, :, 0] = np.where(~np.isnan(bx), bx, 0)
        out[c - 1, :, :, 1] = np.where(~np.isnan(by), by, 0)
        out[c + 1, :, :, 0] = np.where(~np.isnan(fx), fx, 0)
        out[c + 1, :, :, 1] = np.where(~np.isnan(fy), fy, 0)
        out[c - 1][m0u] = -out[c + 1][m0u]
        out[c + 1][m1u] = -out[c - 1][m1u]
        for d in range(2, c + 1):
            out[c - d] = out[c - 1] * d
            out[c + d] = out[c + 1] * d
        return out / 4.0 / 32.0

    def _expand_center_mv(self, mv_field: np.ndarray) -> np.ndarray:
        """(h, w, 3) xy-swapped field -> (nframes, h, w, 2), /4 then /32
        (Augment `opt/data_LD_bi.py:456-489` + trainer `train_LD_37.py:367`)."""
        n = self.n
        c = n // 2
        out = np.zeros((n, *mv_field.shape[:2], 2), np.float32)
        with np.errstate(divide="ignore", invalid="ignore"):
            fx = mv_field[:, :, 0] / (mv_field[:, :, 2] * -1.0)
            fy = mv_field[:, :, 1] / (mv_field[:, :, 2] * -1.0)
        out[c - 1, :, :, 0] = np.where(~np.isnan(fx), fx, 0)
        out[c - 1, :, :, 1] = np.where(~np.isnan(fy), fy, 0)
        for d in range(2, c + 1):
            out[c - d] = out[c - 1] * d
        for d in range(1, c + 1):
            out[c + d] = out[c - 1] * -d
        return out / 4.0 / 32.0

    def sample_batch(self) -> dict:
        b, n, cr = self.b, self.n, self.crop
        ds, r = self.ds, self.rng
        s_t, h, w = ds.lr.shape[1:4]
        lrs = np.empty((b, n, cr, cr, 1), np.float32)
        hrs = np.empty((b, 4 * cr, 4 * cr, 1), np.float32)
        pms = np.empty_like(lrs)
        rms = np.empty_like(lrs)
        ufs = np.empty_like(lrs)
        mv0s = np.empty((b, n, cr, cr, 2), np.float32)
        mv1s = np.empty((b, n, cr, cr, 2), np.float32)
        for k in range(b):
            s = r.randint(0, len(ds))
            start = r.randint(0, s_t - n + 1) if s_t > n else 0
            center = start + n // 2
            top = r.randint(0, h - cr) if h > cr else 0
            left = r.randint(0, w - cr) if w > cr else 0
            sl = np.s_[start:start + n, top:top + cr, left:left + cr]
            lr = ds.lr[s][sl].astype(np.float32) / 255.0
            hr = ds.hr[s, center, top * 4:(top + cr) * 4,
                       left * 4:(left + cr) * 4].astype(np.float32) / 255.0
            pm = ds.pm[s][sl].astype(np.float32) / 255.0
            rm = ds.rm[s][sl].astype(np.float32) / 255.0
            uf = ds.uf[s][sl].astype(np.float32) / 255.0
            mv0 = ds.mv0[s, center, top:top + cr, left:left + cr].astype(np.float32)
            mv1 = ds.mv1[s, center, top:top + cr, left:left + cr].astype(np.float32)
            # xy swap happens before flips (`opt/data_LD_bi.py:384-385`)
            mv0 = mv0[..., [1, 0, 2]]
            mv1 = mv1[..., [1, 0, 2]]
            if self.augment:
                hf, vf, rot = (r.rand() < 0.5, r.rand() < 0.5, r.rand() < 0.5)
                mv0 = augment_mv(mv0[None], hf, vf, rot)[0]
                mv1 = augment_mv(mv1[None], hf, vf, rot)[0]

                def geo(x):
                    if hf:
                        x = x[..., ::-1]
                    if vf:
                        x = x[..., ::-1, :]
                    if rot:
                        x = np.swapaxes(x, -2, -1)
                    return np.ascontiguousarray(x)

                lr, pm, rm, uf = geo(lr), geo(pm), geo(rm), geo(uf)
                hr = geo(hr)
            lrs[k, ..., 0] = lr
            hrs[k, ..., 0] = hr
            pms[k, ..., 0] = pm
            rms[k, ..., 0] = rm
            ufs[k, ..., 0] = uf
            if self.ds.cfg.coding_cfg == "RA":
                mv0s[k] = self._expand_center_mv_ra(mv0, mv1)
                mv1s[k] = mv0s[k]
            else:
                mv0s[k] = self._expand_center_mv(mv0)
                mv1s[k] = (np.zeros_like(mv0s[k]) if self.zero_mvl1
                           else self._expand_center_mv(mv1))
        return {"lrs": lrs, "mvs0": mv0s, "mvs1": mv1s, "pms": pms,
                "rms": rms, "ufs": ufs, "hr": hrs}

    def __iter__(self) -> Iterator[dict]:
        while True:
            yield self.sample_batch()

    def prefetch(self, depth: int = 2) -> Iterator[dict]:
        q: queue.Queue = queue.Queue(maxsize=depth)

        def worker():
            while True:
                q.put(self.sample_batch())

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            yield q.get()
