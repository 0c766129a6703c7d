"""RealESRGAN-style GT-only dataset with per-sample blur-kernel synthesis.

Rebuilds `RealESRGANDataset`
(`/root/reference/RealSR/VmambaIR/data/realesrgan_dataset.py:17-192`) and its
variants (`realesrgan400_dataset.py` crop 400, `realesrgan_memory`,
`DiffIRGANDataset` — same body): loads a clean GT image, retries IO errors
with a random resample (`:91-105`), crops/pads to a fixed square
(`crop_pad_size`, `:113-126`), and samples two random mixed blur kernels
(iso/aniso/generalized/plateau/sinc, size 7-21 padded to 21) plus a final
sinc kernel (`:128-181`). The on-device degradation graph
(`train/realesrgan_model.py`) consumes the kernels.

Also provides `RealESRGANPairedDataset` (`realesrgan_paired_dataset.py:
11-107`) for validation / paired stage-2 mode — a thin alias of
PairedImageDataset with lq/gt folder pairing.
"""

from __future__ import annotations

import math
import random
import time
from typing import Dict, Optional

import cv2
import numpy as np

from ..utils.img_util import imfrombytes
from ..utils.registry import DATASET_REGISTRY
from .data_util import paths_from_folder_or_meta
from .degradations import (
    circular_lowpass_kernel,
    pad_kernel,
    random_mixed_kernels,
)
from .file_client import FileClient
from .paired_dataset import PairedImageDataset
from .transforms import augment


@DATASET_REGISTRY.register(name="RealESRGANDataset")
@DATASET_REGISTRY.register(name="RealESRGANDataset400")
@DATASET_REGISTRY.register(name="RealESRGANDataset_memory")
@DATASET_REGISTRY.register(name="DiffIRGANDataset")
class RealESRGANDataset:
    _SINC_PROB_THRESH = 13  # kernels < 13px get pulse-width sinc cutoffs

    def __init__(self, opt: Dict):
        self.opt = opt
        self.file_client: Optional[FileClient] = None
        self.io_backend_opt = dict(opt.get("io_backend", {"type": "disk"}))
        self.gt_folder = opt["dataroot_gt"]
        self.paths = paths_from_folder_or_meta(
            self.gt_folder,
            opt.get("meta_info"),
            io_type=self.io_backend_opt.get("type", "disk"),
        )
        # crop_pad_size: 400 for the `400` variant, else 600
        # (`realesrgan400_dataset.py:114` vs `realesrgan_dataset.py:114`)
        default_crop = 400 if "400" in opt.get("type", "") else 600
        self.crop_pad_size = int(opt.get("crop_pad_size", default_crop))

        self.blur_kernel_size = opt["blur_kernel_size"]
        self.kernel_list = opt["kernel_list"]
        self.kernel_prob = opt["kernel_prob"]
        self.blur_sigma = opt["blur_sigma"]
        self.betag_range = opt["betag_range"]
        self.betap_range = opt["betap_range"]
        self.sinc_prob = opt["sinc_prob"]
        self.blur_kernel_size2 = opt["blur_kernel_size2"]
        self.kernel_list2 = opt["kernel_list2"]
        self.kernel_prob2 = opt["kernel_prob2"]
        self.blur_sigma2 = opt["blur_sigma2"]
        self.betag_range2 = opt["betag_range2"]
        self.betap_range2 = opt["betap_range2"]
        self.sinc_prob2 = opt["sinc_prob2"]
        self.final_sinc_prob = opt["final_sinc_prob"]
        self.kernel_range = [2 * v + 1 for v in range(3, 11)]  # 7..21
        self.pulse_tensor = np.zeros((21, 21), np.float32)
        self.pulse_tensor[10, 10] = 1.0

    def __len__(self):
        return len(self.paths)

    def _load_gt(self, index: int, rng: random.Random) -> np.ndarray:
        """IO with x3 retry + random resample (`realesrgan_dataset.py:
        91-105`)."""
        if self.file_client is None:
            self.file_client = FileClient(
                self.io_backend_opt.pop("type", "disk")
                if "type" in self.io_backend_opt
                else "disk",
                **self.io_backend_opt,
            )
        retry = 3
        gt_path = self.paths[index]
        while retry > 0:
            try:
                img_bytes = self.file_client.get(gt_path, "gt")
                return imfrombytes(img_bytes, float32=True)
            except Exception:
                index = rng.randrange(len(self.paths))
                gt_path = self.paths[index]
                time.sleep(1)
                retry -= 1
        img_bytes = self.file_client.get(gt_path, "gt")
        return imfrombytes(img_bytes, float32=True)

    def _sample_kernel(self, rng, kernel_range, sinc_prob, kernel_list,
                       kernel_prob, blur_sigma, betag_range, betap_range):
        np_rng = np.random.RandomState(rng.randrange(2**31))
        kernel_size = rng.choice(kernel_range)
        if np_rng.uniform() < sinc_prob:
            if kernel_size < self._SINC_PROB_THRESH:
                omega_c = np_rng.uniform(np.pi / 3, np.pi)
            else:
                omega_c = np_rng.uniform(np.pi / 5, np.pi)
            kernel = circular_lowpass_kernel(omega_c, kernel_size, pad_to=0)
        else:
            kernel = random_mixed_kernels(
                kernel_list, kernel_prob, kernel_size,
                blur_sigma, blur_sigma, (-math.pi, math.pi),
                betag_range, betap_range, noise_range=None, rng=np_rng,
            )
        return pad_kernel(kernel, 21).astype(np.float32)

    def __getitem__(self, index: int, rng: Optional[random.Random] = None):
        rng = rng or random
        img_gt = self._load_gt(index, rng)

        # augment + crop/pad to the fixed square (`:107-126`)
        img_gt = augment(img_gt, self.opt.get("use_hflip", True),
                         self.opt.get("use_rot", True), rng=rng)
        h, w = img_gt.shape[:2]
        size = self.crop_pad_size
        if h < size or w < size:
            ph, pw = max(0, size - h), max(0, size - w)
            img_gt = cv2.copyMakeBorder(
                img_gt, 0, ph, 0, pw, cv2.BORDER_REFLECT_101
            )
        h, w = img_gt.shape[:2]
        if h > size or w > size:
            top = rng.randrange(h - size + 1)
            left = rng.randrange(w - size + 1)
            img_gt = img_gt[top : top + size, left : left + size, ...]

        kernel1 = self._sample_kernel(
            rng, self.kernel_range, self.sinc_prob, self.kernel_list,
            self.kernel_prob, self.blur_sigma, self.betag_range,
            self.betap_range,
        )
        kernel2 = self._sample_kernel(
            rng, self.kernel_range, self.sinc_prob2, self.kernel_list2,
            self.kernel_prob2, self.blur_sigma2, self.betag_range2,
            self.betap_range2,
        )
        np_rng = np.random.RandomState(rng.randrange(2**31))
        if np_rng.uniform() < self.final_sinc_prob:
            kernel_size = rng.choice(self.kernel_range)
            omega_c = np_rng.uniform(np.pi / 3, np.pi)
            sinc = circular_lowpass_kernel(omega_c, kernel_size, pad_to=21)
            sinc = sinc.astype(np.float32)
        else:
            sinc = self.pulse_tensor

        # BGR -> RGB float32 HWC
        gt = np.ascontiguousarray(img_gt[..., ::-1], np.float32)
        return {
            "gt": gt,
            "kernel1": kernel1,
            "kernel2": kernel2,
            "sinc_kernel": sinc,
            "gt_path": self.paths[index],
        }


@DATASET_REGISTRY.register(name="RealESRGANPairedDataset")
@DATASET_REGISTRY.register(name="DiffIRGANPairedDataset")
class RealESRGANPairedDataset(PairedImageDataset):
    """Paired lq/gt mode for val & stage-2 paired training
    (`realesrgan_paired_dataset.py:11-107`)."""
