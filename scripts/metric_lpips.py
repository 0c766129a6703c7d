#!/usr/bin/env python
"""Folder-vs-folder LPIPS CLI (reference `/root/reference/SRGAN/Metric/
LPIPS.py:11-43`). Pass --weights for converted lpips-vgg weights (.npz)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from vmambair_tpu.metrics.lpips import LPIPS
from vmambair_tpu.utils.img_util import imread
from vmambair_tpu.utils.misc import scandir


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gt", required=True)
    p.add_argument("--sr", required=True)
    p.add_argument("--weights", default=None)
    args = p.parse_args()

    metric = LPIPS(args.weights)
    if not metric.is_pretrained:
        print("WARNING: no pretrained weights — scores are relative-only")
    vals = []
    for name in sorted(scandir(args.gt, suffix=("png", "jpg", "bmp"))):
        base, ext = os.path.splitext(name)
        cands = [f for f in os.listdir(args.sr) if f.startswith(base)]
        if not cands:
            continue
        gt = imread(os.path.join(args.gt, name), float32=True)[..., ::-1]
        sr = imread(os.path.join(args.sr, sorted(cands)[0]),
                    float32=True)[..., ::-1]
        h = min(gt.shape[0], sr.shape[0])
        w = min(gt.shape[1], sr.shape[1])
        v = metric(sr[:h, :w], gt[:h, :w])
        vals.append(v)
        print(f"{name}: LPIPS {v:.4f}")
    if vals:
        print(f"Average: LPIPS {np.mean(vals):.4f} ({len(vals)} images)")


if __name__ == "__main__":
    main()
