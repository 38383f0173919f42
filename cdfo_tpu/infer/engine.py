"""Batched streaming inference engine (production path).

Key restructure vs the reference's per-window loop (`test_LD_37.py:131-169`
and our round-1 pipeline): the spatial-compensate block (EGLA + the
``conv_expand_fea_r`` projection) and the prior expansions depend only on
the NEIGHBOUR frame, not on which window it appears in — the reference
recomputes them for every window membership, i.e. ~6x per frame in
streaming (`SIDECVSR_our.py:4443-4460`). This engine computes them ONCE
per frame into device-side ring buffers and runs the center-dependent work
(MV warp + dual attention + fusion + trunk + head) for ``k`` output frames
per dispatch.

Numerically identical to the per-window forward when the EGLA mask is
deterministic (``mask_mode='expected'``); with ``mask_mode='sample'`` the
reference itself redraws gumbel noise per membership, so per-frame caching
is a (documented, PSNR-neutral) different noise schedule.

FPS protocol: frames / sum(device-side forward time) with frame 0 and the
bootstrap embed INCLUDED, matching `test_LD_22_FPS.py:185-192` exactly
(``FPS = len(f)/Sumtime`` — the reference timer covers frame 0's full
window embed; round 1 wrongly excluded it).
"""
from __future__ import annotations

import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.mv import modify_mv_for_end_frames, mv2mvs
from .pipeline import SequenceData, crop_sr_output


class BatchedStreamingEngine:
    """k-frame batched streaming with per-frame compensation ring buffers."""

    def __init__(self, model, params, k: int = 4, nframes: int = 7,
                 mask_rng: Optional[jax.Array] = None):
        self.model = model
        self.params = params
        self.k = k
        self.n = nframes
        cfg = getattr(model, "cfg", None)
        self._needs_rng = bool(cfg and cfg.mask_mode == "sample")
        self.mask_rng = (mask_rng if mask_rng is not None
                         else jax.random.PRNGKey(0))
        self._boot, self._step = self._build_fns()
        # modular ring geometry: capacity >= k+6, multiple of k so every
        # step's k-frame write is one contiguous dynamic_update_slice;
        # logical frame position p lives in slot (p + S) % L
        self._L = k * (-(-(k + nframes - 1) // k))
        self._S = (k - (nframes // 2)) % k

    # -- jitted device functions (overridden by the sharded engine) ------

    def _comp_fn(self):
        model = self.model
        needs = self._needs_rng

        def comp(params, lrs, pms, rms, ufs, rng):
            rngs = {"gumbel": rng} if needs else None
            return model.apply(params, lrs, pms, rms, ufs,
                               method="compensate_frames", rngs=rngs)

        return comp

    def _step_fn(self, comp):
        model = self.model
        needs = self._needs_rng

        def step(params, ring_l1, ring_fi, ring_uf, lrs, pms, rms, ufs,
                 mvs, center_lr, idx, cidx, slot0, rng):
            # ring_fi holds QUAD-PACKED compensated features (warp-ready;
            # the neighbour warp gathers straight from the ring). Rings
            # are MODULAR-slot buffers: only the k new frames are written
            # (a concat-shift rewrote the whole ring every step — ~1.3 GB
            # of HBM per step at the headline geometry).
            l1n, fin, ufn = comp(params, lrs, pms, rms, ufs, rng)
            ring_l1 = jax.lax.dynamic_update_slice_in_dim(
                ring_l1, l1n, slot0, 0)
            ring_fi = jax.lax.dynamic_update_slice_in_dim(
                ring_fi, fin, slot0, 0)
            ring_uf = jax.lax.dynamic_update_slice_in_dim(
                ring_uf, ufn, slot0, 0)
            sr = model.apply(params, ring_l1[cidx], center_lr,
                             ring_fi, ring_uf[idx], mvs, idx,
                             method="align_reconstruct",
                             rngs={"gumbel": rng} if needs else None)
            # quantize on device: the fp32 SR readback is 33 MB/step
            # through the tunnel; uint8 is 8 MB. Same truncation semantics
            # as the reference (`test_LD_37.py:179-180`: clamp(0,1)*255
            # then .astype(np.uint8)).
            sr8 = (jnp.clip(sr[..., 0], 0.0, 1.0) * 255.0).astype(jnp.uint8)
            return sr8, ring_l1, ring_fi, ring_uf

        return step

    def _build_fns(self):
        comp = self._comp_fn()
        return (jax.jit(comp),
                jax.jit(self._step_fn(comp), donate_argnums=(1, 2, 3)))

    def _put_boot(self, tree):
        return jax.tree.map(jax.device_put, tree)

    def _put_staged(self, tree):
        return jax.tree.map(jax.device_put, tree)

    def _place_rings(self, rings):
        """Hook: sharded engines replicate the rings across the mesh."""
        return rings

    # -- host-side input prep (outside the timed region) -----------------

    def _frame_inputs(self, data: SequenceData, frames):
        """Stack per-frame inputs for a list of (already clamped) frame
        indices; priors use the reference's max(1, i) I-frame rule."""
        pidx = [max(1, f) for f in frames]
        lrs = data.lr[list(frames)][..., None].astype(np.float32)
        pms = data.pm[pidx][..., None].astype(np.float32)
        rms = data.rm[pidx][..., None].astype(np.float32)
        ufs = data.uf[pidx][..., None].astype(np.float32)
        return lrs, pms, rms, ufs

    def _center_mvs(self, data: SequenceData, center: int):
        t = data.num_frames
        h = data.lr.shape[1]
        ci = min(max(1, center), t - 1)
        mvs1 = mv2mvs(data.mvl1[ci], self.n)
        modify_mv_for_end_frames(min(center, t - 1), mvs1, t)
        if mvs1.shape[1] != h:
            mvs1 = np.pad(mvs1, ((0, 0), (0, h - mvs1.shape[1]),
                                 (0, 0), (0, 0)))
        keep = [p for p in range(self.n) if p != self.n // 2]
        return mvs1[keep]  # (N-1, H, W, 2)

    def run_sequence(self, data: SequenceData, collect_timing: bool = False):
        """Returns (sr uint8 (T, sH, sW), fps or None). The timer covers
        all device-side forward work (bootstrap embed + every step) and
        divides the FULL frame count — `test_LD_22_FPS.py:185-192`."""
        k, n, t = self.k, self.n, data.num_frames
        half = n // 2
        rng = self.mask_rng
        total = 0.0

        # bootstrap ring: frames [-k-3 .. 2] clamped (so that the first
        # step's update leaves the ring covering [-3 .. k+2])
        boot_frames = [min(max(f, 0), t - 1)
                       for f in range(-k - half, half)]
        binp = self._put_boot(self._frame_inputs(data, boot_frames))
        for a in binp:  # force uploads to land (axon: see sync() below)
            float(jnp.sum(a.astype(jnp.float32)))
        rng, sub = jax.random.split(rng)
        L, S = self._L, self._S
        bslots = jnp.asarray([(p + S) % L for p in range(-k - half, half)])

        def boot():
            bl1, bfi, buf = self._boot(self.params, *binp, sub)
            ring_l1 = jnp.zeros((L,) + bl1.shape[1:], bl1.dtype
                                ).at[bslots].set(bl1)
            ring_fi = jnp.zeros((L,) + bfi.shape[1:], bfi.dtype
                                ).at[bslots].set(bfi)
            ring_uf = jnp.zeros((L,) + buf.shape[1:], buf.dtype
                                ).at[bslots].set(buf)
            return self._place_rings((ring_l1, ring_fi, ring_uf))

        if not collect_timing:
            ring_l1, ring_fi, ring_uf = boot()

        out_frames = [None] * t
        poffs = [p for p in range(n) if p != half]

        def stage(j):
            """Host-prep + async device upload for step j (outside the
            reference timing boundary, like the `.cuda()` transfers in
            `test_LD_22_FPS.py`)."""
            centers = list(range(j, j + k))
            new_frames = [min(max(c + half, 0), t - 1)
                          for c in range(j, j + k)]
            ninp = self._frame_inputs(data, new_frames)
            mvs = np.stack([self._center_mvs(data, c) for c in centers])
            center_lr = data.lr[[min(c, t - 1) for c in centers]][..., None]
            # modular ring slots; ring contents are already frame-clamped
            # at write time, so logical positions index directly
            L, S = self._L, self._S
            idx = np.array([[(c - half + p + S) % L
                             for p in poffs] for c in centers], np.int32)
            cidx = np.array([(c + S) % L for c in centers], np.int32)
            slot0 = np.int32((j + half + S) % L)
            return self._put_staged((
                *ninp, mvs.astype(np.float32),
                center_lr.astype(np.float32), idx, cidx, slot0))

        def sync(staged):
            # axon block_until_ready is a no-op; a scalar readback is the
            # only way to guarantee the upload has landed before the timer.
            # Every staged leaf is forced (the idx/cidx/slot0 scalars are a
            # few bytes each, so the extra readbacks are cheap and keep the
            # timed region transfer-free).
            for a in staged:
                float(jnp.sum(a.astype(jnp.float32)))

        starts = list(range(0, t, k))
        if collect_timing:
            # Timed-throughput mode: pre-stage every step's inputs, then
            # dispatch ALL steps back-to-back (they chain serially on the
            # device through the ring buffers) and sync ONCE at the end.
            # The reference timer has no cuda.synchronize at all — its
            # device drain hides in the untimed `.cpu()` readback
            # (`test_LD_22_FPS.py:183-192`) — so per-step sync roundtrips
            # (~90 ms through the axon tunnel) are measurement artifact,
            # not model cost. This boundary still counts EVERY device
            # FLOP of all frames, amortising one roundtrip over the run.
            all_staged = [stage(j) for j in starts]
            for st in all_staged:
                sync(st)
            srs = []
            t0 = time.perf_counter()
            # the bootstrap embed is dispatched INSIDE the timed chain
            # (frame 0's full-window cost counts, per the reference) —
            # no intermediate sync between boot and the steps
            ring_l1, ring_fi, ring_uf = boot()
            for si, j in enumerate(starts):
                rng, sub = jax.random.split(rng)
                sr8, ring_l1, ring_fi, ring_uf = self._step(
                    self.params, ring_l1, ring_fi, ring_uf,
                    *all_staged[si], sub)
                srs.append(sr8)
            float(jnp.sum(srs[-1].astype(jnp.float32)))
            total += time.perf_counter() - t0
            for si, j in enumerate(starts):
                sr_np = np.asarray(srs[si])
                for b, c in enumerate(range(j, j + k)):
                    if c < t:
                        out_frames[c] = crop_sr_output(sr_np[b])
            return np.stack(out_frames), t / total

        staged = stage(starts[0])
        for si, j in enumerate(starts):
            nxt = stage(starts[si + 1]) if si + 1 < len(starts) else None
            rng, sub = jax.random.split(rng)
            sr8, ring_l1, ring_fi, ring_uf = self._step(
                self.params, ring_l1, ring_fi, ring_uf, *staged, sub)
            sr_np = np.asarray(sr8)
            for b, c in enumerate(range(j, j + k)):
                if c < t:
                    out_frames[c] = crop_sr_output(sr_np[b])
            staged = nxt
        return np.stack(out_frames), None
