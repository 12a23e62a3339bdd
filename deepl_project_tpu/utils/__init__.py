from .image import (make_grid, nchw_to_nhwc, nhwc_to_nchw, save_grid,
                    save_image, to_uint8)
from .logging import MetricWriter, StepTimer, profiler_trace
from .metrics import psnr, ssim, summarize

__all__ = [
    "psnr", "ssim", "summarize",
    "make_grid", "save_grid", "save_image", "to_uint8",
    "nchw_to_nhwc", "nhwc_to_nchw",
    "MetricWriter", "StepTimer", "profiler_trace",
]
