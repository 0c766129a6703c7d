"""Image IO and tensor conversion helpers.

Counterpart of the reference's `img_util.py`
(`/root/reference/Deraining/basicsr/utils/img_util.py:9-220`), adapted to the
NHWC/numpy world: images flow as BGR uint8 on the host (cv2 convention) and
RGB float32 NHWC on device.
"""

from __future__ import annotations

import os
from typing import List, Sequence, Union

import cv2
import numpy as np


def imfrombytes(content: bytes, flag: str = "color",
                float32: bool = False) -> np.ndarray:
    """Decode image bytes -> BGR HWC uint8 (or float32 /255)."""
    img_np = np.frombuffer(content, np.uint8)
    imread_flags = {
        "color": cv2.IMREAD_COLOR,
        "grayscale": cv2.IMREAD_GRAYSCALE,
        "unchanged": cv2.IMREAD_UNCHANGED,
    }
    img = cv2.imdecode(img_np, imread_flags[flag])
    if float32:
        img = img.astype(np.float32) / 255.0
    return img


def imread(path: str, flag: str = "color", float32: bool = False):
    with open(path, "rb") as f:
        return imfrombytes(f.read(), flag, float32)


def imwrite(img: np.ndarray, file_path: str, params=None,
            auto_mkdir: bool = True) -> bool:
    if auto_mkdir:
        os.makedirs(os.path.dirname(os.path.abspath(file_path)), exist_ok=True)
    return cv2.imwrite(file_path, img, params or [])


def img2batch(imgs: Union[np.ndarray, Sequence[np.ndarray]],
              bgr2rgb: bool = True) -> np.ndarray:
    """HWC BGR float32 image(s) -> (N, H, W, C) RGB float32 batch."""
    single = isinstance(imgs, np.ndarray)
    if single:
        imgs = [imgs]
    out = []
    for img in imgs:
        if img.ndim == 2:
            img = img[..., None]
        if bgr2rgb and img.shape[2] == 3:
            img = img[..., ::-1]
        out.append(np.ascontiguousarray(img, dtype=np.float32))
    batch = np.stack(out, axis=0)
    return batch


def batch2img(tensor, rgb2bgr: bool = True, out_type=np.uint8,
              min_max=(0, 1)) -> Union[np.ndarray, List[np.ndarray]]:
    """(N, H, W, C) or (H, W, C) float -> HWC BGR uint8 image(s), clamped to
    min_max then rescaled (reference `tensor2img` semantics)."""
    arr = np.asarray(tensor, dtype=np.float32)
    single_input = arr.ndim == 3
    if single_input:
        arr = arr[None]
    arr = np.clip(arr, *min_max)
    arr = (arr - min_max[0]) / (min_max[1] - min_max[0])
    outs = []
    for img in arr:
        if rgb2bgr and img.shape[2] == 3:
            img = img[..., ::-1]
        if img.shape[2] == 1:
            img = img[..., 0]
        if out_type == np.uint8:
            img = (img * 255.0).round().astype(np.uint8)
        else:
            img = img.astype(out_type)
        outs.append(img)
    return outs[0] if single_input else outs


def pad_to_multiple(img: np.ndarray, factor: int) -> np.ndarray:
    """Reflect-pad an HWC (or NHWC) image so H, W are multiples of factor
    (reference `pad_test`, `MambaSISR_model.py:87-97`, window=8)."""
    h, w = img.shape[-3:-1]
    ph = (factor - h % factor) % factor
    pw = (factor - w % factor) % factor
    if ph == 0 and pw == 0:
        return img
    pad = [(0, 0)] * (img.ndim - 3) + [(0, ph), (0, pw), (0, 0)]
    return np.pad(img, pad, mode="reflect")


def padding(img_lq: np.ndarray, img_gt: np.ndarray, gt_size: int):
    """Pad (reflect) both images up to at least gt_size (reference
    `img_util.padding`)."""
    h, w = img_lq.shape[:2]
    ph, pw = max(0, gt_size - h), max(0, gt_size - w)
    if ph == 0 and pw == 0:
        return img_lq, img_gt
    img_lq = cv2.copyMakeBorder(img_lq, 0, ph, 0, pw, cv2.BORDER_REFLECT)
    img_gt = cv2.copyMakeBorder(img_gt, 0, ph, 0, pw, cv2.BORDER_REFLECT)
    return img_lq, img_gt


def crop_border(img, border: int):
    if border == 0:
        return img
    return img[..., border:-border, border:-border, :]
