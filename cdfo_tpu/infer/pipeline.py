"""Streaming sliding-window inference with the recurrent L1-feature cache.

Reproduces the reference eval semantics (`test_LD_37.py:115-206`):
  * clamped 7-frame window per output frame;
  * priors indexed max(1, i) (frame 0 is an I-frame with no inter priors);
  * the center frame's MV field expanded to 7 flows (`mv2mvs`) with
    edge-frame fixups;
  * frame 0 runs the full-window embed; every later frame reuses 6/7 of the
    cached features and embeds only the newest frame (`SIDECVSR_our.py:
    4416-4427`) — O(1 new frame) streaming;
  * 270-row inputs padded to 272 with two zero rows (`test_LD_37.py:24-26`),
    1088/736-row outputs cropped back to 1080/720 (`:172-177`).

TPU-first: two jit-compiled graphs (first window / steady state), all
per-frame host work is numpy prep outside the timed region, matching the
reference's FPS timing boundary (`test_LD_22_FPS.py:183-189`).
"""
from __future__ import annotations

import dataclasses
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.mv import generate_input_index, modify_mv_for_end_frames, mv2mvs


def pad_lr_frame(img: np.ndarray) -> np.ndarray:
    """(H, W) [0,1] float; 270-row frames get two zero rows appended."""
    if img.shape[0] == 270:
        img = np.concatenate([img, np.zeros((2, img.shape[1]), img.dtype)], axis=0)
    return img


def crop_sr_output(sr: np.ndarray) -> np.ndarray:
    """(H, W) SR output; undo the LR padding at 4x scale."""
    if sr.shape[0] == 1088:
        return sr[:-8]
    if sr.shape[0] == 736:
        return sr[:-16]
    return sr


@dataclasses.dataclass
class SequenceData:
    """Host-side arrays for one sequence.

    lr, pm, rm, uf: (T, H, W) float32 in [0,1] (lr/pm already padded to a
    multiple of 8 rows; uf comes at 272 rows natively in the CVCP layout).
    mvl0, mvl1: (T, H_mv, W_mv, 3) raw decoder fields ([dy, dx, refoff]).
    """

    lr: np.ndarray
    pm: np.ndarray
    rm: np.ndarray
    uf: np.ndarray
    mvl0: np.ndarray
    mvl1: np.ndarray

    @property
    def num_frames(self) -> int:
        return self.lr.shape[0]


class StreamingInferencer:
    """jit-compiled sliding-window driver."""

    def __init__(self, model, params, nframes: int = 7,
                 mask_rng: Optional[jax.Array] = None):
        self.model = model
        self.params = params
        self.nframes = nframes
        self.mask_rng = mask_rng
        sample = getattr(model, "cfg", None)
        self._needs_rng = bool(sample and sample.mask_mode == "sample")

        def fwd_first(params, lrs, mvs0, mvs1, pms, rms, ufs, rng):
            rngs = {"gumbel": rng} if self._needs_rng else None
            return model.apply(params, lrs, mvs0, mvs1, pms, rms, ufs,
                               rngs=rngs)

        def fwd_next(params, lrs, mvs0, mvs1, pms, rms, ufs, pre_l1, rng):
            rngs = {"gumbel": rng} if self._needs_rng else None
            return model.apply(params, lrs, mvs0, mvs1, pms, rms, ufs,
                               pre_l1=pre_l1, rngs=rngs)

        self._fwd_first = jax.jit(fwd_first)
        self._fwd_next = jax.jit(fwd_next)

    def _build_window(self, data: SequenceData, i: int):
        n = self.nframes
        t = data.num_frames
        o_list = generate_input_index(i, n, t - 1)
        prior_idx = np.maximum(o_list, 1)
        lrs = data.lr[o_list][None, ..., None]
        pms = data.pm[prior_idx][None, ..., None]
        rms = data.rm[prior_idx][None, ..., None]
        ufs = data.uf[prior_idx][None, ..., None]

        ci = max(1, i)
        h, w = data.lr.shape[1:]
        mvs0 = mv2mvs(data.mvl0[ci], n)
        mvs1 = mv2mvs(data.mvl1[ci], n)
        modify_mv_for_end_frames(i, mvs0, t)
        modify_mv_for_end_frames(i, mvs1, t)
        if mvs0.shape[1] != h:  # MV fields are exported at 270 rows
            pad = h - mvs0.shape[1]
            mvs0 = np.pad(mvs0, ((0, 0), (0, pad), (0, 0), (0, 0)))
            mvs1 = np.pad(mvs1, ((0, 0), (0, pad), (0, 0), (0, 0)))
        return (lrs.astype(np.float32), mvs0[None], mvs1[None],
                pms.astype(np.float32), rms.astype(np.float32),
                ufs.astype(np.float32))

    def run_sequence(self, data: SequenceData, collect_timing: bool = False):
        """Returns (sr_frames uint8 (T, H_out, W_out), fps or None).

        fps uses the reference's boundary (`test_LD_22_FPS.py:183-189`):
        only the forward is timed — window prep AND input staging happen
        before the timer, SR readback after it. Completion of each forward
        is enforced with a scalar readback (the axon platform's
        block_until_ready does not block; a sum depends on every output
        pixel, so .item() is an honest sync at negligible transfer cost).
        """
        rng = self.mask_rng if self.mask_rng is not None else jax.random.PRNGKey(0)
        t = data.num_frames
        subs = jax.random.split(rng, t)
        # Chunked staging: windows are prepared and transferred in bursts of
        # ``chunk`` frames (device memory stays O(chunk), not O(sequence) —
        # JCT-VC sequences run to 600 frames), and each burst happens outside
        # the timed forward region, matching the reference's boundary where
        # input staging is excluded (`test_LD_22_FPS.py:183-189`).
        chunk = 16
        l1 = None
        out_frames = [None] * t
        total_fwd = 0.0
        for c0 in range(0, t, chunk):
            c1 = min(c0 + chunk, t)
            windows = [jax.tree.map(jax.device_put, self._build_window(data, i))
                       for i in range(c0, c1)]
            jax.block_until_ready(windows)
            srs = []
            for i in range(c0, c1):
                window = windows[i - c0]
                t0 = time.perf_counter()
                if l1 is None:
                    sr, l1 = self._fwd_first(self.params, *window, subs[i])
                else:
                    sr, l1 = self._fwd_next(self.params, *window, l1, subs[i])
                if collect_timing:
                    float(jnp.sum(sr))  # force completion
                    if i > 0:  # first frame carries the non-cached graph
                        total_fwd += time.perf_counter() - t0
                srs.append(sr)
            for i, sr in zip(range(c0, c1), srs):
                sr_img = crop_sr_output(np.asarray(sr)[0, :, :, 0])
                out_frames[i] = (
                    np.clip(sr_img, 0.0, 1.0) * 255.0).astype(np.uint8)
        fps = None
        if collect_timing and t > 1:
            fps = (t - 1) / total_fwd
        return np.stack(out_frames), fps


def synthetic_sequence(t: int = 12, h: int = 64, w: int = 96,
                       seed: int = 0) -> SequenceData:
    """Small random sequence for tests/benchmarks (mirrors the reference's
    `*_tmp.csv` smoke-list trick)."""
    r = np.random.RandomState(seed)
    lr = r.rand(t, h, w).astype(np.float32)
    pm = (r.rand(t, h, w) > 0.5).astype(np.float32)
    rm = (r.rand(t, h, w).astype(np.float32) - 0.5) * 0.2
    uf = np.clip(lr + r.randn(t, h, w).astype(np.float32) * 0.02, 0, 1)
    # MV maps are PIECEWISE CONSTANT over 4x4 pixel blocks, like the real
    # coding priors (HEVC motion vectors live on >=4x4 luma partitions and
    # the dataset's per-pixel maps replicate the block MV —
    # `opt/data_LD_bi.py:91`); blockiness also exercises the tiled warp
    # fast path (`ops/warp.py::flow_warp_ring`). Non-4-divisible extents
    # fall back to per-pixel variation in the remainder band.
    hb, wb = -(-h // 4), -(-w // 4)
    mv = np.zeros((t, h, w, 3), np.float32)
    for ax in (0, 1):
        blk = r.randint(-16, 16, (t, hb, wb)).astype(np.float32)
        mv[..., ax] = np.repeat(np.repeat(blk, 4, axis=1), 4,
                                axis=2)[:, :h, :w]
    mv[..., 2] = -1
    return SequenceData(lr, pm, rm, uf, mv, mv.copy())
