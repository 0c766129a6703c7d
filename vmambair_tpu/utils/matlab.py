"""MATLAB-faithful color conversion and bicubic resize (numpy).

The reference's published numbers depend on MATLAB semantics
(`/root/reference/Deraining/basicsr/utils/matlab_functions.py`,
`evaluate_PSNR_SSIM.m`): YCbCr uses the ITU-R BT.601 studio-swing transform
and `imresize` uses a 4-tap cubic kernel with antialiasing on downscale.
These are independent implementations of that (public, standard) math.
"""

from __future__ import annotations

import numpy as np


def _to_float01(img: np.ndarray):
    """uint8 [0,255] or float [0,1] -> float64 [0,1], remembering the type."""
    t = img.dtype
    img = img.astype(np.float64)
    if t == np.uint8:
        img /= 255.0
    return img, t


def _from_float01(img: np.ndarray, t) -> np.ndarray:
    if t == np.uint8:
        return (img * 255.0).round().astype(np.uint8)
    return img.astype(np.float32)


_YCBCR_W = np.array(
    [
        [65.481, -37.797, 112.0],
        [128.553, -74.203, -93.786],
        [24.966, 112.0, -18.214],
    ]
)
_YCBCR_B = np.array([16.0, 128.0, 128.0])


def rgb2ycbcr(img: np.ndarray, y_only: bool = False) -> np.ndarray:
    """MATLAB rgb2ycbcr. img: HWC RGB, uint8 or float [0,1]."""
    img01, t = _to_float01(img)
    if y_only:
        out = img01 @ _YCBCR_W[:, 0] + _YCBCR_B[0]
    else:
        out = img01 @ _YCBCR_W + _YCBCR_B
    return _from_float01(out / 255.0, t)


def bgr2ycbcr(img: np.ndarray, y_only: bool = False) -> np.ndarray:
    """rgb2ycbcr on a BGR image (cv2 channel order)."""
    return rgb2ycbcr(img[..., ::-1], y_only=y_only)


def ycbcr2rgb(img: np.ndarray) -> np.ndarray:
    img01, t = _to_float01(img)
    inv = np.linalg.inv(_YCBCR_W / 255.0)
    out = (img01 * 255.0 - _YCBCR_B) @ inv / 255.0
    return _from_float01(np.clip(out, 0, 1), t)


def ycbcr2bgr(img: np.ndarray) -> np.ndarray:
    return ycbcr2rgb(img)[..., ::-1]


def _cubic(x):
    """MATLAB's bicubic kernel (Keys, a = -0.5)."""
    ax = np.abs(x)
    ax2, ax3 = ax**2, ax**3
    return ((1.5 * ax3 - 2.5 * ax2 + 1) * (ax <= 1)
            + (-0.5 * ax3 + 2.5 * ax2 - 4 * ax + 2)
            * ((ax > 1) & (ax <= 2)))


def _resize_weights(in_len, out_len, scale, antialias):
    """Per-output-pixel contribution indices+weights, MATLAB imresize
    style (symmetric boundary replication by index clamping, antialiased
    widened kernel when downscaling)."""
    if scale < 1 and antialias:
        kernel_width = 4.0 / scale
    else:
        kernel_width = 4.0
    x = np.arange(1, out_len + 1, dtype=np.float64)
    u = x / scale + 0.5 * (1 - 1 / scale)
    left = np.floor(u - kernel_width / 2)
    p = int(np.ceil(kernel_width)) + 2
    idx = left[:, None] + np.arange(p)[None, :] - 1  # 0-based
    dist = u[:, None] - (idx + 1)
    if scale < 1 and antialias:
        w = scale * _cubic(dist * scale)
    else:
        w = _cubic(dist)
    w_sum = w.sum(axis=1, keepdims=True)
    w = w / w_sum
    # clamp indices (replicate boundary)
    idx = np.clip(idx, 0, in_len - 1).astype(np.int64)
    # drop all-zero weight columns
    nz = np.any(w != 0, axis=0)
    return idx[:, nz], w[:, nz]


def imresize(img: np.ndarray, scale: float | None = None,
             out_shape=None, antialias: bool = True) -> np.ndarray:
    """MATLAB-equivalent bicubic imresize. img: HW or HWC, uint8/float[0,1]."""
    img01, t = _to_float01(img)
    squeeze = img01.ndim == 2
    if squeeze:
        img01 = img01[:, :, None]
    in_h, in_w = img01.shape[:2]
    if out_shape is not None:
        out_h, out_w = out_shape
        scale_h, scale_w = out_h / in_h, out_w / in_w
    else:
        scale_h = scale_w = float(scale)
        out_h = int(np.ceil(in_h * scale_h))
        out_w = int(np.ceil(in_w * scale_w))

    idx_h, w_h = _resize_weights(in_h, out_h, scale_h, antialias)
    idx_w, w_w = _resize_weights(in_w, out_w, scale_w, antialias)

    # separable resample: rows then columns
    out = np.empty((out_h, out_w, img01.shape[2]), np.float64)
    for c in range(img01.shape[2]):
        rows = (img01[idx_h, :, c] * w_h[:, :, None]).sum(axis=1)
        out[:, :, c] = (rows[:, idx_w] * w_w[None, :, :]).sum(axis=2)
    out = np.clip(out, 0, 1)
    if squeeze:
        out = out[:, :, 0]
    return _from_float01(out, t)
