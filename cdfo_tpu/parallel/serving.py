"""Multi-chip sharded streaming serving — the production route past the
single-chip throughput ceiling.

The single-chip exact ceiling at the headline geometry is ~12-14 fps
(BENCH_NOTES: the trunk is compute-bound at the C=64 MXU occupancy
limit). The reference has no distributed serving at all (its latent NCCL
utilities — `/root/reference/opt/deep_learning.py:23-141` — are
training-only and never invoked). This module scales the streaming
engine over a `jax.sharding.Mesh` the TPU-native way:

* The ``k`` output frames of every step are SHARDED over the mesh's
  'data' axis (`shard_map`): each chip runs compensation for its own new
  frames and the full per-center work (warp + dual-MSA + trunk + head)
  for its own centers. The fused Pallas kernels run unchanged per chip
  on complete frames — no halo exchange is ever needed (contrast an
  H-sharding of the kernels, which would need 6-row halos at every
  conv boundary).
* The recurrent ring buffers are REPLICATED; the only collective is ONE
  ``all_gather`` of the k new frames' compensated features per step.
* Semantics are EXACTLY the single-chip engine's: same ring contents,
  same per-frame math, bit-equal outputs in fp32
  (tests/test_sharded_serving.py pins this on the 8-device CPU mesh,
  including non-multiple-of-k and shorter-than-k sequence tails).

Derived headline-geometry projection (full arithmetic in BENCH_NOTES.md
"Sharded serving: derived ICI model"): the gathered payload is exactly
103.4 MB per new frame (l1 16.71 + quad-packed feature 69.96 + pred
prior 16.71, bf16 at 272x480 nf=64), so a bidirectional-ring all-gather
on v5e ICI (2 x 45 GB/s per-link one-way) costs
(n-1) * k_per_device * 1.15 ms per step against a measured 399 ms
single-chip step at k_per_device=4 — 3.5% of the step at n=4, giving
16 / 0.413 s = 38.7 fps (>30 at v5e-4; 36.3 fps even if ICI lands at a
third of nominal). The projection assumes no comm/compute overlap.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..infer.engine import BatchedStreamingEngine


class ShardedServingEngine(BatchedStreamingEngine):
    """Streaming engine with the k-frame axis sharded over mesh['data'].

    ``k_per_device`` output frames are produced by each chip per step;
    the public behaviour (run_sequence, timing protocol) is inherited
    unchanged with ``k = k_per_device * mesh.shape['data']``.
    """

    def __init__(self, model, params, mesh: Mesh, k_per_device: int = 2,
                 nframes: int = 7, mask_rng: Optional[jax.Array] = None):
        self.mesh = mesh
        self.ndata = mesh.shape["data"]
        # params replicated across the mesh before the parent builds fns
        params = jax.device_put(params, NamedSharding(mesh, P()))
        super().__init__(model, params, k=k_per_device * self.ndata,
                         nframes=nframes, mask_rng=mask_rng)

    # -- sharded device functions ----------------------------------------

    def _build_fns(self):
        mesh = self.mesh
        comp = self._comp_fn()
        step_local = self._step_fn(self._gathered_comp(comp))

        rep = P()
        d0 = P("data")

        # (params, ring_l1, ring_fi, ring_uf, lrs, pms, rms, ufs, mvs,
        #  center_lr, idx, cidx, slot0, rng)
        in_specs = (rep, rep, rep, rep, d0, d0, d0, d0, d0, d0, d0, d0,
                    rep, rep)
        out_specs = (d0, rep, rep, rep)
        step = shard_map(step_local, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)
        return (jax.jit(comp),
                jax.jit(step, donate_argnums=(1, 2, 3)))

    def _gathered_comp(self, comp):
        """Per-shard compensation of the local new frames, then ONE
        all_gather so every chip's ring update sees all k frames (the
        step's only collective)."""

        def gcomp(params, lrs, pms, rms, ufs, rng):
            l1n, fin, ufn = comp(params, lrs, pms, rms, ufs, rng)
            l1n = jax.lax.all_gather(l1n, "data", axis=0, tiled=True)
            fin = jax.lax.all_gather(fin, "data", axis=0, tiled=True)
            ufn = jax.lax.all_gather(ufn, "data", axis=0, tiled=True)
            return l1n, fin, ufn

        return gcomp

    # -- host-side placement ---------------------------------------------

    def _put_boot(self, tree):
        rep = NamedSharding(self.mesh, P())
        return jax.tree.map(lambda x: jax.device_put(x, rep), tree)

    def _put_staged(self, tree):
        mesh = self.mesh

        def _put(x):
            x = np.asarray(x)
            spec = (P() if x.ndim == 0
                    else P("data", *([None] * (x.ndim - 1))))
            return jax.device_put(x, NamedSharding(mesh, spec))

        return jax.tree.map(_put, tree)

    def _place_rings(self, rings):
        rep = NamedSharding(self.mesh, P())
        return jax.tree.map(lambda x: jax.device_put(x, rep), rings)
