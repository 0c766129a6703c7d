"""Video / face datasets (the reference's vendored-basicsr surface).

TPU-native rebuilds of:
* `REDSDataset` (`Deraining/basicsr/data/reds_dataset.py:12-235`) —
  REDS video-SR training: center-GT + `num_frame` neighboring LQ frames
  with temporal-interval augmentation and random reverse.
* `Vimeo90KDataset` (`Deraining/basicsr/data/vimeo90k_dataset.py`) —
  septuplet training clips, GT = im4.
* `VideoTestDataset` (`Deraining/basicsr/data/video_test_dataset.py:11-148`)
  — per-frame sliding-window test indexing with border padding modes.
* `FFHQDataset` (`Deraining/basicsr/data/ffhq_dataset.py:9-65`) — GT-only
  face dataset with hflip + mean/std normalize.

Samples are numpy dicts in this package's NHWC convention: video clips are
{'lq': (T, h, w, 3) float32 RGB in [0,1], 'gt': (H, W, 3), 'key': str}.
The optical-flow side channel of REDS (`reds_dataset.py:161-196`) is
deliberately not carried over — no VmambaIR model consumes flows.
"""

from __future__ import annotations

import os
import random
from os import path as osp
from typing import Dict, List

import numpy as np

from ..utils.img_util import imfrombytes
from ..utils.registry import DATASET_REGISTRY
from .file_client import FileClient
from .transforms import augment, paired_random_crop


def generate_frame_indices(crt_idx: int, max_frame_num: int, num_frame: int,
                           padding: str = "reflection") -> List[int]:
    """Sliding-window frame indices with border padding
    (`Deraining/basicsr/data/data_util.py` `generate_frame_indices`).

    padding: 'replicate' | 'reflection' | 'reflection_circle' | 'circle'.
    """
    assert num_frame % 2 == 1, "num_frame should be odd"
    assert padding in (
        "replicate", "reflection", "reflection_circle", "circle",
    ), f"Wrong padding mode: {padding}"
    max_frame_num = max_frame_num - 1  # 0-based
    num_pad = num_frame // 2
    indices = []
    for i in range(crt_idx - num_pad, crt_idx + num_pad + 1):
        if i < 0:
            if padding == "replicate":
                pad_idx = 0
            elif padding == "reflection":
                pad_idx = -i
            elif padding == "reflection_circle":
                pad_idx = crt_idx + num_pad - i
            else:
                pad_idx = num_frame + i
        elif i > max_frame_num:
            if padding == "replicate":
                pad_idx = max_frame_num
            elif padding == "reflection":
                pad_idx = max_frame_num * 2 - i
            elif padding == "reflection_circle":
                pad_idx = (crt_idx - num_pad) - (i - max_frame_num)
            else:
                pad_idx = i - num_frame
        else:
            pad_idx = i
        indices.append(pad_idx)
    return indices


class _VideoBase:
    def _client(self):
        if self.file_client is None:
            opt = dict(self.io_backend_opt)
            self.file_client = FileClient(opt.pop("type"), **opt)
        return self.file_client

    def _read(self, path):
        img = imfrombytes(self._client().get(path), float32=True)
        return img[..., ::-1].copy()  # BGR -> RGB, matching PairedImage


@DATASET_REGISTRY.register()
class REDSDataset(_VideoBase):
    """REDS training dataset (`reds_dataset.py:12-235`): each key is
    'clip/frame' over 100-frame clips; samples `num_frame` LQ frames at a
    random temporal interval around a center frame whose GT is the target.
    """

    def __init__(self, opt: Dict):
        self.opt = opt
        self.file_client = None
        self.io_backend_opt = dict(opt.get("io_backend", {"type": "disk"}))
        self.gt_root, self.lq_root = opt["dataroot_gt"], opt["dataroot_lq"]
        assert opt["num_frame"] % 2 == 1, "num_frame should be odd"
        self.num_frame = opt["num_frame"]
        self.num_half_frames = opt["num_frame"] // 2
        self.frames_per_clip = int(opt.get("frames_per_clip", 100))

        with open(opt["meta_info_file"]) as fin:
            keys = [line.split(" ")[0] for line in fin if line.strip()]
        # validation-partition exclusion (`reds_dataset.py:77-88`)
        val_partition = opt.get("val_partition", "REDS4")
        if val_partition == "REDS4":
            val_clips = ["000", "011", "015", "020"]
        elif val_partition == "official":
            val_clips = [f"{v:03d}" for v in range(240, 270)]
        else:
            raise ValueError(
                f"Wrong validation partition {val_partition}."
                "Supported ones are ['official', 'REDS4']."
            )
        if opt.get("test_mode", False):
            self.keys = [k for k in keys if k.split("/")[0] in val_clips]
        else:
            self.keys = [k for k in keys if k.split("/")[0] not in val_clips]

        self.interval_list = list(opt.get("interval_list", [1]))
        self.random_reverse = bool(opt.get("random_reverse", False))
        self.is_lmdb = self.io_backend_opt["type"] == "lmdb"
        if self.is_lmdb:
            self.io_backend_opt["db_paths"] = [self.lq_root, self.gt_root]
            self.io_backend_opt["client_keys"] = ["lq", "gt"]

    def __len__(self):
        return len(self.keys)

    def __getitem__(self, index):
        scale = self.opt["scale"]
        gt_size = self.opt["gt_size"]
        key = self.keys[index]
        clip_name, frame_name = key.split("/")
        center = int(frame_name)

        interval = random.choice(self.interval_list)
        start = center - self.num_half_frames * interval
        end = center + self.num_half_frames * interval
        last = self.frames_per_clip - 1
        while start < 0 or end > last:
            center = random.randint(0, last)
            start = center - self.num_half_frames * interval
            end = center + self.num_half_frames * interval
        neighbors = list(range(start, end + 1, interval))
        if self.random_reverse and random.random() < 0.5:
            neighbors.reverse()

        if self.is_lmdb:
            gt_path = f"{clip_name}/{center:08d}"
            lq_paths = [f"{clip_name}/{n:08d}" for n in neighbors]
        else:
            gt_path = osp.join(self.gt_root, clip_name, f"{center:08d}.png")
            lq_paths = [
                osp.join(self.lq_root, clip_name, f"{n:08d}.png")
                for n in neighbors
            ]
        img_gt = self._read(gt_path)
        img_lqs = [self._read(p) for p in lq_paths]

        img_gt, img_lqs = paired_random_crop(
            img_gt, img_lqs, gt_size, scale
        )
        imgs = augment(
            img_lqs + [img_gt],
            self.opt.get("use_flip", self.opt.get("use_hflip", True)),
            self.opt.get("use_rot", True),
        )
        lq = np.stack(imgs[:-1], axis=0).astype(np.float32)
        return {"lq": lq, "gt": imgs[-1].astype(np.float32), "key": key}


@DATASET_REGISTRY.register()
class Vimeo90KDataset(_VideoBase):
    """Vimeo-90K septuplet training dataset (`vimeo90k_dataset.py`):
    GT is im4; the LQ window is centered on it (frame list per num_frame,
    `vimeo90k_dataset.py:26-33`)."""

    def __init__(self, opt: Dict):
        self.opt = opt
        self.file_client = None
        self.io_backend_opt = dict(opt.get("io_backend", {"type": "disk"}))
        self.gt_root, self.lq_root = opt["dataroot_gt"], opt["dataroot_lq"]
        with open(opt["meta_info_file"]) as fin:
            self.keys = [line.split(" ")[0] for line in fin if line.strip()]
        self.neighbor_list = [
            i + (9 - opt["num_frame"]) // 2 for i in range(opt["num_frame"])
        ]
        self.random_reverse = bool(opt.get("random_reverse", False))
        self.is_lmdb = self.io_backend_opt["type"] == "lmdb"
        if self.is_lmdb:
            self.io_backend_opt["db_paths"] = [self.lq_root, self.gt_root]
            self.io_backend_opt["client_keys"] = ["lq", "gt"]

    def __len__(self):
        return len(self.keys)

    def __getitem__(self, index):
        scale = self.opt["scale"]
        gt_size = self.opt["gt_size"]
        key = self.keys[index]
        clip, seq = key.split("/")

        neighbors = list(self.neighbor_list)
        if self.random_reverse and random.random() < 0.5:
            neighbors.reverse()

        if self.is_lmdb:
            gt_path = f"{key}/im4"
            lq_paths = [f"{key}/im{n}" for n in neighbors]
        else:
            gt_path = osp.join(self.gt_root, clip, seq, "im4.png")
            lq_paths = [
                osp.join(self.lq_root, clip, seq, f"im{n}.png")
                for n in neighbors
            ]
        img_gt = self._read(gt_path)
        img_lqs = [self._read(p) for p in lq_paths]

        img_gt, img_lqs = paired_random_crop(
            img_gt, img_lqs, gt_size, scale
        )
        imgs = augment(
            img_lqs + [img_gt],
            self.opt.get("use_flip", self.opt.get("use_hflip", True)),
            self.opt.get("use_rot", True),
        )
        lq = np.stack(imgs[:-1], axis=0).astype(np.float32)
        return {"lq": lq, "gt": imgs[-1].astype(np.float32), "key": key}


@DATASET_REGISTRY.register()
class VideoTestDataset(_VideoBase):
    """Per-frame sliding-window video test dataset
    (`video_test_dataset.py:11-148`): one sample per frame, LQ window of
    `num_frame` around it with border `padding`; folder layout
    <root>/<clip>/<frame>.png."""

    def __init__(self, opt: Dict):
        self.opt = opt
        self.file_client = None
        self.io_backend_opt = dict(opt.get("io_backend", {"type": "disk"}))
        assert self.io_backend_opt["type"] != "lmdb", (
            "VideoTestDataset does not support lmdb (like the reference, "
            "`video_test_dataset.py:57`)"
        )
        self.gt_root, self.lq_root = opt["dataroot_gt"], opt["dataroot_lq"]
        self.data_info = {
            "lq_path": [], "gt_path": [], "folder": [], "idx": [],
            "border": [],
        }
        clips = sorted(
            d for d in os.listdir(self.lq_root)
            if osp.isdir(osp.join(self.lq_root, d))
        )
        if opt.get("test_frames") :
            clips = [c for c in clips if c in opt["test_frames"]]
        self.imgs_lq, self.imgs_gt = {}, {}
        for clip in clips:
            frames = sorted(
                f for f in os.listdir(osp.join(self.lq_root, clip))
                if f.lower().endswith((".png", ".jpg"))
            )
            n = len(frames)
            for i, f in enumerate(frames):
                self.data_info["lq_path"].append(
                    osp.join(self.lq_root, clip, f))
                self.data_info["gt_path"].append(
                    osp.join(self.gt_root, clip, f))
                self.data_info["folder"].append(clip)
                self.data_info["idx"].append(f"{i}/{n}")
                border = 1 if (
                    i < opt["num_frame"] // 2 or i >= n - opt["num_frame"] // 2
                ) else 0
                self.data_info["border"].append(border)
            self.imgs_lq[clip] = [
                osp.join(self.lq_root, clip, f) for f in frames
            ]

    def __len__(self):
        return len(self.data_info["lq_path"])

    def __getitem__(self, index):
        folder = self.data_info["folder"][index]
        idx, max_idx = map(int, self.data_info["idx"][index].split("/"))
        select_idx = generate_frame_indices(
            idx, max_idx, self.opt["num_frame"],
            padding=self.opt.get("padding", "reflection"),
        )
        paths = self.imgs_lq[folder]
        img_lqs = [self._read(paths[i]) for i in select_idx]
        img_gt = self._read(self.data_info["gt_path"][index])
        return {
            "lq": np.stack(img_lqs, axis=0).astype(np.float32),
            "gt": img_gt.astype(np.float32),
            "folder": folder,
            "idx": self.data_info["idx"][index],
            "border": self.data_info["border"][index],
            "lq_path": self.data_info["lq_path"][index],
        }


@DATASET_REGISTRY.register()
class FFHQDataset(_VideoBase):
    """FFHQ GT-only face dataset (`ffhq_dataset.py:9-65`): 70k numbered
    PNGs (or lmdb meta list), random hflip, mean/std normalize."""

    def __init__(self, opt: Dict):
        self.opt = opt
        self.file_client = None
        self.io_backend_opt = dict(opt.get("io_backend", {"type": "disk"}))
        self.gt_folder = opt["dataroot_gt"]
        self.mean = opt.get("mean")
        self.std = opt.get("std")
        if self.io_backend_opt["type"] == "lmdb":
            self.io_backend_opt["db_paths"] = self.gt_folder
            with open(osp.join(self.gt_folder, "meta_info.txt")) as fin:
                self.paths = [line.split(".")[0] for line in fin]
        elif opt.get("meta_info_file"):
            with open(opt["meta_info_file"]) as fin:
                self.paths = [
                    osp.join(self.gt_folder, line.strip().split(" ")[0])
                    for line in fin if line.strip()
                ]
        else:
            self.paths = [
                osp.join(self.gt_folder, f"{v:08d}.png")
                for v in range(int(opt.get("num_images", 70000)))
            ]

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, index):
        img_gt = self._read(self.paths[index])
        img_gt = augment(
            img_gt, hflip=self.opt.get("use_hflip", True), rotation=False
        )
        if self.mean is not None:
            img_gt = (
                img_gt - np.asarray(self.mean, np.float32)
            ) / np.asarray(self.std, np.float32)
        return {"gt": img_gt.astype(np.float32),
                "gt_path": self.paths[index]}
