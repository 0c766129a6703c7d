"""Paired LQ/GT image datasets.

Covers both reference variants with one class + flags:
* pip-basicsr `PairedImageDataset` used by SRGAN
  (`SRGAN/options/MambaSISR15_x4.yml:13`): folder/meta-info/lmdb modes,
  paired random crop, hflip/rot augs, mean/std normalize.
* vendored `Dataset_PairedImage` used by deraining
  (`Deraining/basicsr/data/paired_image_dataset.py:16`): adds pad-to-gt_size
  before the crop and the 8-way `geometric_augs`.

Samples are numpy dicts: {'lq': HWC float32 RGB in [0,1], 'gt': ...,
'lq_path': str, 'gt_path': str}.
"""

from __future__ import annotations

import random
from typing import Dict, Optional

import numpy as np

from ..utils.img_util import imfrombytes, padding
from ..utils.registry import DATASET_REGISTRY
from .data_util import (
    paired_paths_from_folders,
    paired_paths_from_lmdb,
    paired_paths_from_meta_info_file,
)
from .file_client import FileClient
from .transforms import augment, paired_random_crop, random_augmentation


def _normalize(img, mean, std):
    if mean is not None:
        img = (img - np.asarray(mean, np.float32)) / np.asarray(
            std, np.float32
        )
    return img


@DATASET_REGISTRY.register(name="PairedImageDataset")
@DATASET_REGISTRY.register(name="Dataset_PairedImage")
class PairedImageDataset:
    def __init__(self, opt: Dict):
        self.opt = opt
        self.file_client = None
        self.io_backend_opt = dict(opt.get("io_backend", {"type": "disk"}))
        self.mean = opt.get("mean")
        self.std = opt.get("std")
        self.gt_folder = opt["dataroot_gt"]
        self.lq_folder = opt["dataroot_lq"]
        self.filename_tmpl = opt.get("filename_tmpl", "{}")

        if self.io_backend_opt["type"] == "lmdb":
            self.io_backend_opt["db_paths"] = [self.lq_folder, self.gt_folder]
            self.io_backend_opt["client_keys"] = ["lq", "gt"]
            self.paths = paired_paths_from_lmdb(
                [self.lq_folder, self.gt_folder], ["lq", "gt"]
            )
        elif opt.get("meta_info_file"):
            self.paths = paired_paths_from_meta_info_file(
                [self.lq_folder, self.gt_folder], ["lq", "gt"],
                opt["meta_info_file"], self.filename_tmpl,
            )
        else:
            self.paths = paired_paths_from_folders(
                [self.lq_folder, self.gt_folder], ["lq", "gt"],
                self.filename_tmpl,
            )

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, index, rng: Optional[random.Random] = None):
        rng = rng or random
        if self.file_client is None:
            backend_opt = dict(self.io_backend_opt)
            self.file_client = FileClient(backend_opt.pop("type"),
                                          **backend_opt)
        scale = self.opt.get("scale", 1)

        gt_path = self.paths[index]["gt_path"]
        lq_path = self.paths[index]["lq_path"]
        img_gt = imfrombytes(self.file_client.get(gt_path, "gt"),
                             float32=True)
        img_lq = imfrombytes(self.file_client.get(lq_path, "lq"),
                             float32=True)

        if self.opt.get("phase") == "train":
            gt_size = self.opt["gt_size"]
            if self.opt.get("pad_to_gt_size", True):
                img_lq, img_gt = padding(img_lq, img_gt, gt_size // scale)
            img_gt, img_lq = paired_random_crop(
                img_gt, img_lq, gt_size, scale, rng
            )
            if self.opt.get("geometric_augs"):
                img_gt, img_lq = random_augmentation(img_gt, img_lq, rng=rng)
            else:
                img_gt, img_lq = augment(
                    [img_gt, img_lq],
                    self.opt.get("use_hflip", self.opt.get("use_flip", True)),
                    self.opt.get("use_rot", True),
                    rng=rng,
                )

        # BGR (cv2) -> RGB
        img_gt = np.ascontiguousarray(img_gt[..., ::-1])
        img_lq = np.ascontiguousarray(img_lq[..., ::-1])
        img_gt = _normalize(img_gt, self.mean, self.std)
        img_lq = _normalize(img_lq, self.mean, self.std)

        # match sizes for non-train phases (reference crops gt to lq*scale)
        if self.opt.get("phase") != "train":
            h, w = img_lq.shape[:2]
            img_gt = img_gt[: h * scale, : w * scale]

        return {
            "lq": img_lq.astype(np.float32),
            "gt": img_gt.astype(np.float32),
            "lq_path": lq_path,
            "gt_path": gt_path,
        }


@DATASET_REGISTRY.register(name="SingleImageDataset")
class SingleImageDataset:
    """LQ-only dataset for GT-free inference
    (`RealSR/options/test_mambaSR11GAN_x4.yml:21`)."""

    def __init__(self, opt: Dict):
        self.opt = opt
        self.io_backend_opt = dict(opt.get("io_backend", {"type": "disk"}))
        self.mean = opt.get("mean")
        self.std = opt.get("std")
        from .data_util import paths_from_folder, paths_from_lmdb

        if self.io_backend_opt["type"] == "lmdb":
            self.io_backend_opt["db_paths"] = [opt["dataroot_lq"]]
            self.io_backend_opt["client_keys"] = ["lq"]
            self.paths = paths_from_lmdb(opt["dataroot_lq"])
        else:
            self.paths = paths_from_folder(opt["dataroot_lq"])
        self.file_client = None

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, index, rng=None):
        if self.file_client is None:
            backend_opt = dict(self.io_backend_opt)
            self.file_client = FileClient(backend_opt.pop("type"),
                                          **backend_opt)
        lq_path = self.paths[index]
        img_lq = imfrombytes(self.file_client.get(lq_path, "lq"),
                             float32=True)
        img_lq = np.ascontiguousarray(img_lq[..., ::-1])
        img_lq = _normalize(img_lq, self.mean, self.std)
        return {"lq": img_lq.astype(np.float32), "lq_path": lq_path}
