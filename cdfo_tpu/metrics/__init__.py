from .psnr_ssim import (
    bgr2ycbcr,
    calculate_psnr,
    calculate_ssim,
    calculate_tof,
    cal_psnr_ssim,
    cal_psnr_ssim_tof,
    cal_psnr_ssim_tof_cvcp,
    cal_psnr_ssim_tof_reds,
    cal_psnr_ssim_tof_vid4,
    psnr_jax,
    rgb2ycbcr,
    to_y_channel,
    ycbcr2bgr,
    ycbcr2rgb,
)

__all__ = [
    "calculate_psnr", "calculate_ssim", "calculate_tof", "cal_psnr_ssim",
    "cal_psnr_ssim_tof", "cal_psnr_ssim_tof_cvcp", "cal_psnr_ssim_tof_reds",
    "cal_psnr_ssim_tof_vid4",
    "psnr_jax", "rgb2ycbcr", "bgr2ycbcr", "ycbcr2rgb", "ycbcr2bgr",
    "to_y_channel",
]
