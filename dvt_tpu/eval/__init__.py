from dvt_tpu.eval.seg import (
    BNHead,
    SegLinearProbe,
    mean_iou,
    slide_inference,
)
from dvt_tpu.eval.depth import (
    DepthBNHead,
    sig_loss,
    gradient_loss,
    depth_metrics,
    eigen_crop_mask,
)

__all__ = [
    "BNHead",
    "SegLinearProbe",
    "mean_iou",
    "slide_inference",
    "DepthBNHead",
    "sig_loss",
    "gradient_loss",
    "depth_metrics",
    "eigen_crop_mask",
]
