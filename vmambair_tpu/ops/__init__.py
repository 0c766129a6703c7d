from .selective_scan import (
    selective_scan_seq,
    selective_scan_xla,
    selective_scan_flops,
)
from .pallas_scan import selective_scan
from .cross_scan import cross_scan_2d, cross_merge_2d
from .pixel_shuffle import pixel_shuffle, pixel_unshuffle

__all__ = [
    "selective_scan",
    "selective_scan_seq",
    "selective_scan_xla",
    "selective_scan_flops",
    "cross_scan_2d",
    "cross_merge_2d",
    "pixel_shuffle",
    "pixel_unshuffle",
]
