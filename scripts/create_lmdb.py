#!/usr/bin/env python
"""Create an LMDB dataset in the reference's on-disk format.

Rebuilds `make_lmdb_from_imgs` (`/root/reference/Deraining/basicsr/utils/
lmdb_util.py`, also `create_lmdb.py` dataset-prep entries): an `.lmdb`
directory holding `data.mdb`/`lock.mdb` plus a `meta_info.txt` whose lines
are `<name.ext> (<h>,<w>,<c>) <compress_level>`; each image is stored
PNG-encoded under its extension-less name as the key. Datasets produced
here load in BOTH frameworks (our `LmdbBackend`, `data/file_client.py:24`,
and the reference's basicsr lmdb loaders).

The `lmdb` package is an optional dependency of this image (same policy as
the torch-checkpoint converters: run where the dependency exists). With
`--format pack` the same folder is written as this framework's native
mmap packfile instead (no extra dependency; `scripts/create_packfile.py`
is the dedicated CLI). meta-info generation is shared either way.

Usage:
  python scripts/create_lmdb.py --input datasets/DIV2K/HR \
      --output datasets/DIV2K/HR.lmdb
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import cv2
import numpy as np

from vmambair_tpu.utils.misc import scandir

IMG_SUFFIXES = ("png", "jpg", "jpeg", "bmp")


def gather_images(input_dir, suffix=IMG_SUFFIXES, recursive=True):
    """(relative path, key) pairs; key = relative path without extension —
    the reference's keying convention (`lmdb_util.py` uses the image name
    without extension as the lmdb key)."""
    paths = sorted(scandir(input_dir, suffix=suffix, recursive=recursive))
    return [(p, os.path.splitext(p)[0]) for p in paths]


def encode_image(img_path, compress_level=1):
    """Read + PNG-encode one image. Returns (bytes, (h, w, c))."""
    img = cv2.imread(img_path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise IOError(f"cannot read {img_path}")
    if img.ndim == 2:
        h, w = img.shape
        c = 1
    else:
        h, w, c = img.shape
    ok, buf = cv2.imencode(
        ".png", img, [cv2.IMWRITE_PNG_COMPRESSION, compress_level]
    )
    if not ok:
        raise IOError(f"cannot encode {img_path}")
    return buf.tobytes(), (h, w, c)


def meta_line(name, shape, compress_level):
    """One meta_info.txt line: `name.png (h,w,c) level`."""
    h, w, c = shape
    return f"{name} ({h},{w},{c}) {compress_level}"


def write_lmdb(input_dir, lmdb_path, compress_level=1, batch=500,
               map_size=None):
    import lmdb  # optional dependency; ImportError surfaces to the CLI

    if not lmdb_path.endswith(".lmdb"):
        raise ValueError("lmdb_path must end with '.lmdb'")
    if os.path.exists(lmdb_path):
        raise FileExistsError(f"{lmdb_path} already exists")
    items = gather_images(input_dir)
    if not items:
        raise ValueError(f"no images found under {input_dir}")
    if map_size is None:
        # estimate from the first image x count, with generous slack
        data, _ = encode_image(
            os.path.join(input_dir, items[0][0]), compress_level
        )
        map_size = max(len(data) * len(items) * 10, 1 << 26)

    os.makedirs(lmdb_path)
    env = lmdb.open(lmdb_path, map_size=map_size)
    meta_lines = []
    txn = env.begin(write=True)
    for i, (rel, key) in enumerate(items, 1):
        data, shape = encode_image(
            os.path.join(input_dir, rel), compress_level
        )
        txn.put(key.encode("ascii"), data)
        meta_lines.append(meta_line(rel, shape, compress_level))
        if i % batch == 0:
            txn.commit()
            txn = env.begin(write=True)
            print(f"  {i}/{len(items)}", flush=True)
    txn.commit()
    env.close()
    with open(os.path.join(lmdb_path, "meta_info.txt"), "w") as f:
        f.write("\n".join(meta_lines) + "\n")
    return len(items)


def write_pack(input_dir, pack_path, compress_level=1):
    from vmambair_tpu.data.packfile import write_packfile

    items = gather_images(input_dir)
    if not items:
        raise ValueError(f"no images found under {input_dir}")
    meta_lines = []

    def gen():
        for rel, key in items:
            data, shape = encode_image(
                os.path.join(input_dir, rel), compress_level
            )
            meta_lines.append(meta_line(rel, shape, compress_level))
            yield key, data

    write_packfile(pack_path, gen())
    with open(pack_path + ".meta_info.txt", "w") as f:
        f.write("\n".join(meta_lines) + "\n")
    return len(items)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="image folder")
    p.add_argument("--output", required=True,
                   help="output .lmdb dir (or .pack file with --format pack)")
    p.add_argument("--format", choices=["lmdb", "pack"], default="lmdb")
    p.add_argument("--compress_level", type=int, default=1)
    args = p.parse_args()

    if args.format == "lmdb":
        try:
            n = write_lmdb(args.input, args.output, args.compress_level)
        except ImportError:
            raise SystemExit(
                "the 'lmdb' package is not installed in this environment; "
                "run this script where lmdb is available, or use "
                "--format pack (native packfile, no extra dependency)"
            )
    else:
        n = write_pack(args.input, args.output, args.compress_level)
    print(f"wrote {args.output} ({n} images)")


if __name__ == "__main__":
    main()
