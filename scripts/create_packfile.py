#!/usr/bin/env python
"""Pack an image folder into a .vmpack database for fast training IO.

The TPU-rebuild counterpart of `/root/reference/*/utils/create_lmdb.py`
(lmdb is not in this image; `native/packfile.cc` provides an mmap'd
zero-copy reader). A meta_info.txt with `<key>.png (h,w,c) 1` lines is
written next to the pack, mirroring the lmdb layout so datasets can
enumerate keys the same way.

    python scripts/create_packfile.py --input datasets/DF2K/HR_sub \
        --output datasets/DF2K/HR_sub.vmpack
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import cv2

from vmambair_tpu.data.packfile import write_packfile
from vmambair_tpu.utils.misc import scandir


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--compression_level", type=int, default=1)
    args = p.parse_args()

    names = sorted(scandir(args.input, suffix=("png", "jpg", "bmp")))
    meta_lines = []

    def gen():
        for name in names:
            path = os.path.join(args.input, name)
            key = os.path.splitext(name)[0]
            img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
            ok, buf = cv2.imencode(
                ".png", img,
                [cv2.IMWRITE_PNG_COMPRESSION, args.compression_level],
            )
            assert ok, path
            h, w = img.shape[:2]
            c = 1 if img.ndim == 2 else img.shape[2]
            meta_lines.append(f"{key}.png ({h},{w},{c}) 1")
            print("packed", name)
            yield key, buf.tobytes()

    write_packfile(args.output, list(gen()))
    meta = os.path.splitext(args.output)[0] + "_meta_info.txt"
    with open(meta, "w") as f:
        f.write("\n".join(meta_lines) + "\n")
    print(f"wrote {len(names)} entries -> {args.output} (+ {meta})")


if __name__ == "__main__":
    main()
