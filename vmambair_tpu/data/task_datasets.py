"""Inherited task datasets: Gaussian denoising, deblur, dual-pixel defocus.

Rebuilds the registered-but-rarely-shipped dataset surface of the reference
(`/root/reference/SRGAN/VmambaIR/data/*.py`, SURVEY D4): these are part of
the public registry even though no shipped config uses them.

* `Dataset_GaussianDenoising` — GT-only loader that synthesizes noisy LQ at
  a fixed or random sigma (train) and a fixed sigma (test); grayscale mode
  loads single-channel.
* `GaussianDenoisingPairedDataset` — alias with paired semantics.
* `DeblurPairedDataset` — paired blur/sharp (identical mechanics to
  PairedImageDataset; kept as a named registry entry).
* `Dataset_DefocusDeblur_DualPixel_16bit` — dual-pixel defocus: lqL/lqR
  16-bit inputs concatenated channel-wise, 16-bit GT.
"""

from __future__ import annotations

import random
from typing import Dict, Optional

import cv2
import numpy as np

from ..utils.registry import DATASET_REGISTRY
from .data_util import paired_paths_from_folders, paths_from_folder
from .file_client import FileClient
from .paired_dataset import PairedImageDataset
from .transforms import paired_random_crop, random_augmentation


@DATASET_REGISTRY.register(name="DeblurPairedDataset")
class DeblurPairedDataset(PairedImageDataset):
    """Paired blur/sharp training data (Restormer deblur lineage)."""


@DATASET_REGISTRY.register(name="Dataset_GaussianDenoising")
@DATASET_REGISTRY.register(name="GaussianDenoisingPairedDataset")
class GaussianDenoisingDataset:
    def __init__(self, opt: Dict):
        self.opt = opt
        self.file_client: Optional[FileClient] = None
        self.io_backend_opt = dict(opt.get("io_backend", {"type": "disk"}))
        self.gt_paths = paths_from_folder(opt["dataroot_gt"])
        self.sigma_type = opt.get("sigma_type", "constant")
        self.sigma_range = opt.get("sigma_range", 15)
        self.sigma_test = float(opt.get("sigma_test", 15))
        self.in_ch = int(opt.get("in_ch", 3))
        self.phase = opt.get("phase", "train")

    def __len__(self):
        return len(self.gt_paths)

    def _sigma(self, rng) -> float:
        if self.phase != "train":
            return self.sigma_test
        if self.sigma_type == "constant":
            return float(self.sigma_range)
        if self.sigma_type == "random":
            lo, hi = self.sigma_range
            return float(lo + rng.random() * (hi - lo))
        if self.sigma_type == "choice":
            return float(rng.choice(list(self.sigma_range)))
        raise ValueError(self.sigma_type)

    def __getitem__(self, index, rng: Optional[random.Random] = None):
        rng = rng or random
        if self.file_client is None:
            backend = dict(self.io_backend_opt)
            self.file_client = FileClient(backend.pop("type", "disk"),
                                          **backend)
        gt_path = self.gt_paths[index]
        buf = np.frombuffer(self.file_client.get(gt_path, "gt"), np.uint8)
        flag = cv2.IMREAD_COLOR if self.in_ch == 3 else cv2.IMREAD_GRAYSCALE
        img = cv2.imdecode(buf, flag).astype(np.float32) / 255.0
        if img.ndim == 2:
            img = img[..., None]
        elif self.in_ch == 3:
            img = img[..., ::-1]  # BGR -> RGB

        if self.phase == "train":
            gt_size = int(self.opt.get("gt_size", 128))
            h, w = img.shape[:2]
            if h < gt_size or w < gt_size:
                img = cv2.copyMakeBorder(
                    img, 0, max(0, gt_size - h), 0, max(0, gt_size - w),
                    cv2.BORDER_REFLECT,
                )
                if img.ndim == 2:
                    img = img[..., None]
            h, w = img.shape[:2]
            top = rng.randrange(h - gt_size + 1)
            left = rng.randrange(w - gt_size + 1)
            img = img[top : top + gt_size, left : left + gt_size]
            if self.opt.get("geometric_augs", True):
                img = random_augmentation(img, rng=rng)[0]

        sigma = self._sigma(rng) / 255.0
        np_rng = np.random.RandomState(rng.randrange(2**31))
        noise = np_rng.normal(0, sigma, img.shape).astype(np.float32)
        lq = img + noise
        return {
            "lq": np.ascontiguousarray(lq, np.float32),
            "gt": np.ascontiguousarray(img, np.float32),
            "lq_path": gt_path,
            "gt_path": gt_path,
            "sigma": np.float32(sigma),
        }


@DATASET_REGISTRY.register(name="Dataset_DefocusDeblur_DualPixel_16bit")
class DualPixelDefocusDataset:
    """Dual-pixel defocus deblurring: 16-bit L/R inputs stacked to 6
    channels, 16-bit GT (`SRGAN/VmambaIR/data/..._DP_16bit`)."""

    def __init__(self, opt: Dict):
        self.opt = opt
        self.paths = paired_paths_from_folders(
            [opt["dataroot_lqL"], opt["dataroot_lqR"], opt["dataroot_gt"]],
            ["lqL", "lqR", "gt"],
            opt.get("filename_tmpl", "{}"),
        )
        self.phase = opt.get("phase", "train")

    def __len__(self):
        return len(self.paths)

    @staticmethod
    def _read16(path):
        img = cv2.imread(path, cv2.IMREAD_UNCHANGED).astype(np.float32)
        img = img / 65535.0
        if img.ndim == 2:
            img = img[..., None]
        else:
            img = img[..., ::-1]
        return img

    def __getitem__(self, index, rng: Optional[random.Random] = None):
        rng = rng or random
        entry = self.paths[index]
        lqL = self._read16(entry["lqL_path"])
        lqR = self._read16(entry["lqR_path"])
        gt = self._read16(entry["gt_path"])
        if self.phase == "train":
            gt_size = int(self.opt.get("gt_size", 128))
            h, w = lqL.shape[:2]
            top = rng.randrange(max(1, h - gt_size + 1))
            left = rng.randrange(max(1, w - gt_size + 1))
            sl = np.s_[top : top + gt_size, left : left + gt_size]
            lqL, lqR, gt = lqL[sl], lqR[sl], gt[sl]
            if self.opt.get("geometric_augs", True):
                lqL, lqR, gt = random_augmentation(lqL, lqR, gt, rng=rng)
        lq = np.concatenate([lqL, lqR], axis=-1)
        return {
            "lq": np.ascontiguousarray(lq, np.float32),
            "gt": np.ascontiguousarray(gt, np.float32),
            "lq_path": entry["lqL_path"],
            "gt_path": entry["gt_path"],
        }
