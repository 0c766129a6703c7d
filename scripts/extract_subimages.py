#!/usr/bin/env python
"""Crop large dataset images into fixed sub-images for training.

Rebuilds `/root/reference/RealSR/scripts/extract_subimages.py:43-90`
(480x480 crops, step 240, thresh_size 0, multiprocess pool) — here a thread
pool (cv2 releases the GIL).

    python scripts/extract_subimages.py --input datasets/DF2K/HR \
        --output datasets/DF2K/HR_sub --crop_size 480 --step 240
"""

import argparse
import os
import sys
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import cv2
import numpy as np

from vmambair_tpu.utils.misc import scandir


def process(path, args):
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    name, ext = os.path.splitext(os.path.basename(path))
    h, w = img.shape[:2]
    cs, step, thresh = args.crop_size, args.step, args.thresh_size
    h_space = np.arange(0, h - cs + 1, step)
    if h - (h_space[-1] + cs) > thresh:
        h_space = np.append(h_space, h - cs)
    w_space = np.arange(0, w - cs + 1, step)
    if w - (w_space[-1] + cs) > thresh:
        w_space = np.append(w_space, w - cs)
    idx = 0
    for x in h_space:
        for y in w_space:
            idx += 1
            crop = np.ascontiguousarray(img[x : x + cs, y : y + cs, ...])
            cv2.imwrite(
                os.path.join(args.output, f"{name}_s{idx:03d}{ext}"),
                crop,
                [cv2.IMWRITE_PNG_COMPRESSION, args.compression_level],
            )
    return path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--crop_size", type=int, default=480)
    p.add_argument("--step", type=int, default=240)
    p.add_argument("--thresh_size", type=int, default=0)
    p.add_argument("--compression_level", type=int, default=3)
    p.add_argument("--n_thread", type=int, default=8)
    args = p.parse_args()

    os.makedirs(args.output, exist_ok=True)
    paths = [os.path.join(args.input, f) for f in scandir(
        args.input, suffix=("png", "jpg", "bmp"))]
    with ThreadPoolExecutor(args.n_thread) as ex:
        for done in ex.map(lambda pth: process(pth, args), paths):
            print("done", os.path.basename(done))


if __name__ == "__main__":
    main()
