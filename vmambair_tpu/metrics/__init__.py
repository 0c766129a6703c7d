"""In-train metrics, resolved by YAML `val.metrics.<name>.type` strings
(reference `Deraining/basicsr/metrics/__init__.py`,
`Deraining_mamber33.yml:113-117`)."""

from __future__ import annotations

from ..utils.registry import METRIC_REGISTRY
from .psnr_ssim import calculate_psnr, calculate_ssim
from .lpips import calculate_lpips
from .dists import calculate_dists
from .niqe import calculate_niqe
from .fid import calculate_fid, compute_statistics, extract_vgg_features


def calculate_metric(opt: dict, *args):
    """`metrics.<name>: {type: calculate_psnr, crop_border: 4, ...}` ->
    registry call with the remaining keys as kwargs."""
    opt = dict(opt)
    metric_type = opt.pop("type")
    return METRIC_REGISTRY.get(metric_type)(*args, **opt)


__all__ = [
    "calculate_metric",
    "calculate_psnr",
    "calculate_ssim",
    "calculate_lpips",
    "calculate_dists",
    "calculate_niqe",
    "calculate_fid",
    "METRIC_REGISTRY",
]
