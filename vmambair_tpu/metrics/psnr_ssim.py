"""PSNR / SSIM with MATLAB-equivalent semantics.

The canonical metric implementation for this framework (the reference ships
three slightly different PSNR/SSIMs — `Deraining/basicsr/metrics/
psnr_ssim.py:9-303` (MATLAB-equivalent, used in-training), the offline CLIs
(`SRGAN/Metric/PSNR.py`), and `utils2.py`; we standardize on the
MATLAB-equivalent one, which matches `evaluate_PSNR_SSIM.m`).

Conventions: images are HWC uint8 [0,255] or float [0,1]; `input_order`
'HWC'/'CHW' accepted; `crop_border` pixels removed on each side;
`test_y_only` converts to the BT.601 Y channel first (images are assumed
BGR like the cv2-based reference pipeline).
"""

from __future__ import annotations

import numpy as np

from ..utils.matlab import bgr2ycbcr
from ..utils.registry import METRIC_REGISTRY


def reorder_image(img: np.ndarray, input_order="HWC") -> np.ndarray:
    if input_order == "CHW":
        img = img.transpose(1, 2, 0)
    if img.ndim == 2:
        img = img[..., None]
    return img


def to_y_channel(img: np.ndarray) -> np.ndarray:
    """BGR [0,255] -> Y [0,255] float64 (HWC with C=1)."""
    img = img.astype(np.float64) / 255.0
    if img.ndim == 3 and img.shape[2] == 3:
        img = bgr2ycbcr(img.astype(np.float32), y_only=True)
        img = img[..., None]
    return img.astype(np.float64) * 255.0


@METRIC_REGISTRY.register(name="calculate_psnr")
def calculate_psnr(img1, img2, crop_border=0, input_order="HWC",
                   test_y_only=False, **kwargs):
    # the reference YAMLs spell it `test_y_channel` (`MambaSISR15_x4.yml:106`)
    test_y_only = test_y_only or kwargs.pop("test_y_channel", False)
    assert img1.shape == img2.shape, f"{img1.shape} vs {img2.shape}"
    img1 = reorder_image(np.asarray(img1), input_order).astype(np.float64)
    img2 = reorder_image(np.asarray(img2), input_order).astype(np.float64)
    if crop_border:
        img1 = img1[crop_border:-crop_border, crop_border:-crop_border]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border]
    if test_y_only:
        img1, img2 = to_y_channel(img1), to_y_channel(img2)
    mse = np.mean((img1 - img2) ** 2)
    if mse == 0:
        return float("inf")
    return 20.0 * np.log10(255.0 / np.sqrt(mse))


def _gaussian_kernel(size=11, sigma=1.5):
    ax = np.arange(size) - size // 2
    g = np.exp(-(ax**2) / (2 * sigma**2))
    k = np.outer(g, g)
    return k / k.sum()


def _filter2_valid(img, kernel):
    """2-D correlation, 'valid' region (MATLAB filter2(...,'valid'))."""
    kh, kw = kernel.shape
    h, w = img.shape
    out_h, out_w = h - kh + 1, w - kw + 1
    strides = img.strides
    windows = np.lib.stride_tricks.as_strided(
        img, (out_h, out_w, kh, kw), strides[:2] + strides[:2],
        writeable=False,
    )
    return np.einsum("ijkl,kl->ij", windows, kernel)


def _ssim_single(img1, img2):
    """SSIM on one 2-D channel, uint8 scale, MATLAB constants."""
    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    kernel = _gaussian_kernel(11, 1.5)
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    mu1 = _filter2_valid(img1, kernel)
    mu2 = _filter2_valid(img2, kernel)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    sigma1_sq = _filter2_valid(img1**2, kernel) - mu1_sq
    sigma2_sq = _filter2_valid(img2**2, kernel) - mu2_sq
    sigma12 = _filter2_valid(img1 * img2, kernel) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return ssim_map.mean()


@METRIC_REGISTRY.register(name="calculate_ssim")
def calculate_ssim(img1, img2, crop_border=0, input_order="HWC",
                   test_y_only=False, **kwargs):
    test_y_only = test_y_only or kwargs.pop("test_y_channel", False)
    assert img1.shape == img2.shape, f"{img1.shape} vs {img2.shape}"
    img1 = reorder_image(np.asarray(img1), input_order).astype(np.float64)
    img2 = reorder_image(np.asarray(img2), input_order).astype(np.float64)
    if crop_border:
        img1 = img1[crop_border:-crop_border, crop_border:-crop_border]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border]
    if test_y_only:
        img1, img2 = to_y_channel(img1), to_y_channel(img2)
    vals = [
        _ssim_single(img1[..., c], img2[..., c])
        for c in range(img1.shape[2])
    ]
    return float(np.mean(vals))
