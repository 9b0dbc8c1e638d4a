from grlir.metrics.basic import psnr, psnr_y, psnrb, psnrb_y, ssim, ssim_y
from grlir.metrics.collect import MetricAccumulator, dedup_average
from grlir.metrics.niqe import calculate_niqe, niqe_batch

__all__ = [
    "psnr", "psnr_y", "psnrb", "psnrb_y", "ssim", "ssim_y",
    "MetricAccumulator", "dedup_average", "calculate_niqe", "niqe_batch",
]
