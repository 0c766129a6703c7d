"""Host-side (numpy) image transforms for the data pipeline.

Counterpart of `/root/reference/Deraining/basicsr/data/transforms.py:5-275`:
mod_crop, paired random crop, hflip/vflip/rot90 augmentation, and the 8-way
`random_augmentation` used by the deraining dataset.
"""

from __future__ import annotations

import random
from typing import List, Sequence, Tuple, Union

import numpy as np


def mod_crop(img: np.ndarray, scale: int) -> np.ndarray:
    h, w = img.shape[:2]
    return img[: h - h % scale, : w - w % scale, ...]


def paired_random_crop(img_gts, img_lqs, gt_patch_size: int, scale: int,
                       rng: random.Random | None = None):
    """Random crop of lq and the corresponding (scale x) gt patch."""
    rng = rng or random
    single_gt = isinstance(img_gts, np.ndarray)
    single_lq = isinstance(img_lqs, np.ndarray)
    if single_gt:
        img_gts = [img_gts]
    if single_lq:
        img_lqs = [img_lqs]
    h_lq, w_lq = img_lqs[0].shape[:2]
    h_gt, w_gt = img_gts[0].shape[:2]
    lq_patch_size = gt_patch_size // scale
    if h_gt != h_lq * scale or w_gt != w_lq * scale:
        raise ValueError(
            f"GT size {h_gt}x{w_gt} is not {scale}x of LQ {h_lq}x{w_lq}"
        )
    if h_lq < lq_patch_size or w_lq < lq_patch_size:
        raise ValueError(
            f"LQ {h_lq}x{w_lq} smaller than patch {lq_patch_size}"
        )
    top = rng.randint(0, h_lq - lq_patch_size)
    left = rng.randint(0, w_lq - lq_patch_size)
    img_lqs = [
        img[top : top + lq_patch_size, left : left + lq_patch_size, ...]
        for img in img_lqs
    ]
    top_gt, left_gt = top * scale, left * scale
    img_gts = [
        img[top_gt : top_gt + gt_patch_size,
            left_gt : left_gt + gt_patch_size, ...]
        for img in img_gts
    ]
    if single_gt:
        img_gts = img_gts[0]
    if single_lq:
        img_lqs = img_lqs[0]
    return img_gts, img_lqs


def augment(imgs, hflip=True, rotation=True, flows=None,
            return_status=False, rng: random.Random | None = None):
    """Random hflip + vflip + 90deg rotation (each p=0.5), applied
    consistently to a list of images (and optionally optical flows)."""
    rng = rng or random
    do_hflip = hflip and rng.random() < 0.5
    do_vflip = rotation and rng.random() < 0.5
    do_rot90 = rotation and rng.random() < 0.5

    def _aug(img):
        if do_hflip:
            img = img[:, ::-1, ...]
        if do_vflip:
            img = img[::-1, :, ...]
        if do_rot90:
            img = img.transpose(1, 0, 2) if img.ndim == 3 else img.T
        return np.ascontiguousarray(img)

    single = isinstance(imgs, np.ndarray)
    if single:
        imgs = [imgs]
    imgs = [_aug(img) for img in imgs]
    if single:
        imgs = imgs[0]

    if flows is not None:

        def _aug_flow(flow):
            if do_hflip:
                flow = flow[:, ::-1, :].copy()
                flow[:, :, 0] *= -1
            if do_vflip:
                flow = flow[::-1, :, :].copy()
                flow[:, :, 1] *= -1
            if do_rot90:
                flow = flow.transpose(1, 0, 2)[:, :, ::-1]
            return np.ascontiguousarray(flow)

        single_f = isinstance(flows, np.ndarray)
        if single_f:
            flows = [flows]
        flows = [_aug_flow(f) for f in flows]
        if single_f:
            flows = flows[0]
        return imgs, flows
    if return_status:
        return imgs, (do_hflip, do_vflip, do_rot90)
    return imgs


def data_augmentation(image: np.ndarray, mode: int) -> np.ndarray:
    """The 8 dihedral transforms, selected by mode 0-7 (reference
    `transforms.py` data_augmentation)."""
    if mode == 0:
        out = image
    elif mode == 1:
        out = np.flipud(image)
    elif mode == 2:
        out = np.rot90(image)
    elif mode == 3:
        out = np.flipud(np.rot90(image))
    elif mode == 4:
        out = np.rot90(image, k=2)
    elif mode == 5:
        out = np.flipud(np.rot90(image, k=2))
    elif mode == 6:
        out = np.rot90(image, k=3)
    elif mode == 7:
        out = np.flipud(np.rot90(image, k=3))
    else:
        raise ValueError(f"invalid augmentation mode {mode}")
    return np.ascontiguousarray(out)


def random_augmentation(*args, rng: random.Random | None = None):
    """Apply one random dihedral transform to all given images."""
    rng = rng or random
    mode = rng.randint(0, 7)
    return [data_augmentation(a, mode) for a in args]
