#!/usr/bin/env python
"""Write a meta-info file (one relative image path per line).

Rebuilds `/root/reference/RealSR/scripts/generate_meta_info.py` /
`generate_meta_info_pairdata.py`:

    python scripts/generate_meta_info.py --input datasets/DF2K/HR_sub \
        [--root datasets/DF2K] --output meta_info.txt
    python scripts/generate_meta_info.py --input gt_dir --pair lq_dir \
        --output meta_info_pair.txt
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vmambair_tpu.utils.misc import scandir


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--pair", default=None,
                   help="optional LQ dir for paired meta info")
    p.add_argument("--root", default=None,
                   help="paths are written relative to this root")
    p.add_argument("--output", required=True)
    args = p.parse_args()

    root = args.root or os.path.dirname(args.input.rstrip("/"))
    names = sorted(scandir(args.input, suffix=("png", "jpg", "bmp")))
    with open(args.output, "w") as f:
        for name in names:
            gt_rel = os.path.relpath(
                os.path.join(args.input, name), root
            )
            if args.pair:
                lq_rel = os.path.relpath(
                    os.path.join(args.pair, name), root
                )
                f.write(f"{gt_rel}, {lq_rel}\n")
            else:
                f.write(f"{gt_rel}\n")
    print(f"wrote {len(names)} entries to {args.output}")


if __name__ == "__main__":
    main()
