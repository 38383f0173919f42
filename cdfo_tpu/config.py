"""Single config system for the whole framework (replaces the reference's
per-script argparse + hard-coded paths — `train_LD_37.py:35-47,316-318`).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """CVSR_V8-family hyper-parameters (reference ctor `SIDECVSR_our.py:4372`)."""

    name: str = "cvsr_v8"
    nf: int = 64
    nframes: int = 7
    mdta_heads: int = 8
    align_heads: int = 4
    scn_groups: int = 7          # trunk depth; ref hard-codes 7 (`:4388`)
    scale: int = 4
    # EGLA residual-mask: 'sample' (reference, stochastic) | 'expected'
    mask_mode: str = "sample"
    # ablations (CVSR_V8_wo*): toggle branches off
    use_pab: bool = True         # partition-attention branch
    use_la: bool = True          # EGLA local (window) attention
    use_ga: bool = True          # EGLA global (long-range) attention
    use_mv: bool = True          # MV flow-warp in alignment
    use_pd: bool = True          # pred-feature branch in alignment
    use_egla: bool = True        # spatial-compensate block at all
    # execution strategy (numerics-preserving): fused Pallas trunk kernel
    # in row-major (H, C, W) layout — see cdfo_tpu/models/trunk_fast.py
    fused_trunk: bool = False
    # scan-over-groups trunk (SCNetSScan / SCNetPyrScan): same math, ONE
    # traced group body instead of num_groups unrolled copies — cuts the
    # XLA program size (and compile time) of the non-fused trunks
    # several-fold; essential for the pyramid models, whose unrolled
    # compile exceeded 24 min cold (ROUND3_NOTES). Param layout changes
    # to stacked `groups/g`; `cdfo_tpu.compat.to_scan_trunk` converts.
    # Ignored when fused_trunk is on (the Pallas path has no unrolling
    # problem — each Block_ is one cached kernel).
    scan_trunk: bool = False
    # int8 "turbo" trunk (NOT bit-exact; ~2x MXU rate on v5e). Opt-in,
    # inference-only; measured PSNR delta in BENCH_NOTES.md.
    trunk_int8: bool = False
    # fused GCPI embed rounds (ops/fused_mdta.py) — numerics-preserving,
    # requires use_pab; ignored for the woPAB ablation
    fused_embed: bool = False
    # fused dual-MSA alignment (ops/fused_align.py) on the streaming
    # path — numerics-preserving; needs use_mv and use_pd
    fused_align: bool = False
    # fused EGLA kernels (ops/fused_egla.py) — expected-mask mode only
    # (falls back to the standard path under mask_mode='sample')
    fused_egla: bool = False
    # Pallas block-gather warp (ops/warp_block.py): one patch DMA per
    # 4x4 flow block from an UNPACKED padded ring instead of the XLA
    # per-pixel quad gather. Measured 11.3 vs 13.5 ms/frame at the
    # headline geometry AND shrinks the ring 4x (18 vs 70 MB/frame of
    # build/update traffic). Same semantics (bf16-ulp equivalent);
    # non-blockwise flows fall back to an exact per-pixel path.
    block_warp: bool = False
    compute_dtype: Any = jnp.float32

    @property
    def center(self) -> int:
        return self.nframes // 2


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """CVCP-layout dataset config (reference `opt/data_LD_bi.py:10-135`)."""

    coding_cfg: str = "LD"       # 'LD' | 'RA'
    qp: int = 37
    crop_size: int = 64
    nframes: int = 7
    frames_per_seq: int = 32
    lr_size: Tuple[int, int] = (270, 480)   # pre-pad H, W
    pad_to: int = 8              # pad H up so EGLA 8x8 windows divide evenly
    hr_dir: str = ""
    lr_dir_prefix: str = ""
    sideinfo_dir_prefix: str = ""
    unfiltered_dir_prefix: str = ""
    csv_file: str = ""
    # LD training feeds all-zero L1 flows to the aligner (the reference's
    # Augment only expands mvl0 and zeroes mvl1 — `opt/data_LD_bi.py:473-489`)
    zero_mvl1_in_train: bool = True


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Reference recipe: `train_LD_37.py:37-47,323-325,377,419`."""

    lr: float = 1e-4
    weight_decay: float = 1e-5
    batch_size: int = 20         # 24 for RA (`train_RA_37.py:153`)
    epochs: int = 30000
    val_interval: int = 200      # 400 for RA
    milestones: Tuple[int, ...] = (2000,)
    gamma: float = 0.5
    seed: int = 4
    warm_start_epoch: int = 0
    # TPU-native additions
    data_axis: str = "data"
    mesh_shape: Tuple[int, ...] = (8,)
    bf16_compute: bool = False
    ckpt_dir: str = "training_results"


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    qp: int = 37
    coding_cfg: str = "LD"
    crop_border: int = 4
    input_frames: int = 7


def ld_qp37() -> tuple[ModelConfig, DataConfig, TrainConfig]:
    return ModelConfig(), DataConfig(coding_cfg="LD", qp=37), TrainConfig()


def ra_qp37() -> tuple[ModelConfig, DataConfig, TrainConfig]:
    return (
        ModelConfig(),
        DataConfig(coding_cfg="RA", qp=37, zero_mvl1_in_train=False),
        TrainConfig(batch_size=24, val_interval=400),
    )
