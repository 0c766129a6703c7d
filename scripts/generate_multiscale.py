#!/usr/bin/env python
"""Generate multi-scale copies of each training image.

Rebuilds `/root/reference/RealSR/scripts/generate_multiscale_DF2K.py`:
downscale each HR image by the standard factors (0.75, 0.6, 1/3) with
MATLAB-faithful bicubic (`vmambair_tpu.utils.matlab.imresize`) and save
alongside the originals.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import cv2
import numpy as np

from vmambair_tpu.utils.matlab import imresize
from vmambair_tpu.utils.misc import scandir


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--scales", type=float, nargs="+",
                   default=[0.75, 0.6, 1 / 3])
    args = p.parse_args()

    os.makedirs(args.output, exist_ok=True)
    for name in sorted(scandir(args.input, suffix=("png", "jpg", "bmp"))):
        base, ext = os.path.splitext(name)
        img = cv2.imread(os.path.join(args.input, name),
                         cv2.IMREAD_UNCHANGED).astype(np.float64) / 255.0
        cv2.imwrite(os.path.join(args.output, f"{base}T0{ext}"),
                    (img * 255).round().astype(np.uint8))
        for i, s in enumerate(args.scales, start=1):
            small = imresize(img, s)
            cv2.imwrite(
                os.path.join(args.output, f"{base}T{i}{ext}"),
                (np.clip(small, 0, 1) * 255).round().astype(np.uint8),
            )
        print("done", name)


if __name__ == "__main__":
    main()
