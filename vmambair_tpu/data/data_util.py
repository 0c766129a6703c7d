"""Path pairing helpers (folder / meta-info / lmdb modes).

Counterpart of `/root/reference/Deraining/basicsr/data/data_util.py` (388
LoC): builds the [(lq_path, gt_path)] list a paired dataset iterates.
"""

from __future__ import annotations

import os
from os import path as osp
from typing import List, Sequence, Tuple

from ..utils.misc import scandir


def paired_paths_from_folders(folders: Sequence[str], keys: Sequence[str],
                              filename_tmpl: str = "{}") -> List[dict]:
    """Pair files from N folders by (templated) stem; the LAST entry is the
    reference (GT) folder. keys e.g. ('lq', 'gt') or ('lqL', 'lqR', 'gt')."""
    assert len(folders) == len(keys) and len(folders) >= 2
    gt_folder, gt_key = folders[-1], keys[-1]
    input_listings = [list(scandir(f)) for f in folders[:-1]]
    gt_paths = list(scandir(gt_folder))
    for key, listing in zip(keys[:-1], input_listings):
        assert len(listing) == len(gt_paths), (
            f"{key} and {gt_key} have different number of images: "
            f"{len(listing)}, {len(gt_paths)}"
        )
    paths = []
    for gt_path in sorted(gt_paths):
        basename, ext = osp.splitext(osp.basename(gt_path))
        entry = {f"{gt_key}_path": osp.join(gt_folder, gt_path)}
        for key, folder, listing in zip(
            keys[:-1], folders[:-1], input_listings
        ):
            input_name = f"{filename_tmpl.format(basename)}{ext}"
            input_path = osp.join(folder, input_name)
            if not osp.exists(input_path):
                # tolerate differing extensions
                cands = [p for p in listing
                         if osp.splitext(osp.basename(p))[0]
                         == filename_tmpl.format(basename)]
                assert cands, f"{input_name} is not in {key} folder"
                input_path = osp.join(folder, cands[0])
            entry[f"{key}_path"] = input_path
        paths.append(entry)
    return paths


def paired_paths_from_meta_info_file(folders, keys, meta_info_file,
                                     filename_tmpl="{}") -> List[dict]:
    input_folder, gt_folder = folders
    input_key, gt_key = keys
    with open(meta_info_file, "r") as f:
        gt_names = [line.strip().split(" ")[0] for line in f if line.strip()]
    paths = []
    for gt_name in gt_names:
        basename, ext = osp.splitext(osp.basename(gt_name))
        input_name = f"{filename_tmpl.format(basename)}{ext}"
        paths.append({
            f"{input_key}_path": osp.join(input_folder, input_name),
            f"{gt_key}_path": osp.join(gt_folder, gt_name),
        })
    return paths


def paired_paths_from_lmdb(folders, keys) -> List[dict]:
    """lmdb mode: read keys from each db's meta_info.txt."""
    input_folder, gt_folder = folders
    input_key, gt_key = keys
    if not (str(input_folder).endswith(".lmdb")
            and str(gt_folder).endswith(".lmdb")):
        raise ValueError("lmdb mode requires both folders to end with .lmdb")

    def read_keys(folder):
        with open(osp.join(folder, "meta_info.txt")) as f:
            return [line.split(".")[0] for line in f if line.strip()]

    input_keys = read_keys(input_folder)
    gt_keys = read_keys(gt_folder)
    if set(input_keys) != set(gt_keys):
        raise ValueError(f"keys in {input_key} and {gt_key} lmdbs differ")
    return [
        {f"{input_key}_path": k, f"{gt_key}_path": k} for k in sorted(gt_keys)
    ]


def paths_from_folder(folder) -> List[str]:
    return [osp.join(folder, p) for p in sorted(scandir(folder))]


def paths_from_lmdb(folder) -> List[str]:
    if not str(folder).endswith(".lmdb"):
        raise ValueError(f"{folder} is not an lmdb folder")
    with open(osp.join(folder, "meta_info.txt")) as f:
        return [line.split(".")[0] for line in f if line.strip()]


def paths_from_folder_or_meta(folder, meta_info=None,
                              io_type: str = "disk") -> List[str]:
    """GT-only path list: lmdb keys, meta-info lines joined to the folder, or
    a folder scan (`realesrgan_dataset.py:60-74`)."""
    if io_type == "lmdb" or str(folder).endswith(".lmdb"):
        return paths_from_lmdb(folder)
    if meta_info:
        with open(meta_info) as f:
            return [
                osp.join(folder, line.split(" ")[0].strip())
                for line in f
                if line.strip()
            ]
    return paths_from_folder(folder)
