"""NIQE (Natural Image Quality Evaluator) — no-reference metric.

Rebuilds `/root/reference/Deraining/basicsr/metrics/niqe.py:67-205`: MSCN
coefficients -> aggregated GGD/AGGD features over 96x96 blocks at two
scales -> Mahalanobis-style distance to a pristine multivariate Gaussian
model. The pristine model parameters (`niqe_pris_params.npz`: mu_pris_param,
cov_pris_param, gaussian_window) are a fitted data asset published with
basicsr; a copy is vendored under `metrics/assets/` so the metric works out
of the box. Override with `pris_params_path` or VMAMBAIR_NIQE_PARAMS.
"""

from __future__ import annotations

import math
import os
from typing import Optional

import cv2
import numpy as np

from ..utils.matlab import bgr2ycbcr, imresize
from ..utils.registry import METRIC_REGISTRY


def _estimate_ggd_param(x):
    """Generalized Gaussian ratio estimate (reference `estimate_ggd_param`)."""
    gam = np.arange(0.2, 10.001, 0.001)
    gam_reciprocal = 1.0 / gam
    r_gam = (
        np.square(_gamma(2 * gam_reciprocal))
        / (_gamma(gam_reciprocal) * _gamma(3 * gam_reciprocal))
    )
    sigma_sq = np.mean(x**2)
    sigma = np.sqrt(sigma_sq)
    e = np.mean(np.abs(x))
    rho = sigma_sq / (e**2 + 1e-12)
    idx = np.argmin(np.abs(rho - r_gam))
    return gam[idx], sigma


def _gamma(x):
    from scipy import special

    return special.gamma(x)


def _estimate_aggd_param(x):
    """Asymmetric GGD (reference `estimate_aggd_param`). Degenerate blocks
    (no negative/positive samples) yield NaN features on purpose — the MVG
    fit drops NaN rows, the reference's nancov semantics."""
    x = x.flatten()
    gam = np.arange(0.2, 10.001, 0.001)
    r_gam = (
        np.square(_gamma(2.0 / gam))
        / (_gamma(1.0 / gam) * _gamma(3.0 / gam))
    )
    with np.errstate(invalid="ignore", divide="ignore"):
        left_std = np.sqrt(np.mean(x[x < 0] ** 2))
        right_std = np.sqrt(np.mean(x[x > 0] ** 2))
        gammahat = left_std / right_std
        rhat = (np.mean(np.abs(x))) ** 2 / np.mean(x**2)
        rhatnorm = (rhat * (gammahat**3 + 1) * (gammahat + 1)) / (
            (gammahat**2 + 1) ** 2
        )
        idx = np.argmin((r_gam - rhatnorm) ** 2)
    alpha = gam[idx]
    beta_l = left_std * np.sqrt(_gamma(1 / alpha) / _gamma(3 / alpha))
    beta_r = right_std * np.sqrt(_gamma(1 / alpha) / _gamma(3 / alpha))
    return alpha, beta_l, beta_r


def _compute_feature(block):
    feat = []
    alpha, beta_l, beta_r = _estimate_aggd_param(block)
    feat.extend([alpha, (beta_l + beta_r) / 2])
    shifts = [(0, 1), (1, 0), (1, 1), (1, -1)]
    for shift in shifts:
        shifted = np.roll(block, shift, axis=(0, 1))
        alpha, beta_l, beta_r = _estimate_aggd_param(block * shifted)
        mean = (beta_r - beta_l) * (
            _gamma(2 / alpha) / _gamma(1 / alpha)
        )
        feat.extend([alpha, mean, beta_l, beta_r])
    return feat


def _niqe_core(img, mu_pris, cov_pris, gaussian_window,
               block_size_h=96, block_size_w=96):
    assert img.ndim == 2
    h, w = img.shape
    num_block_h = math.floor(h / block_size_h)
    num_block_w = math.floor(w / block_size_w)
    img = img[: num_block_h * block_size_h, : num_block_w * block_size_w]

    distparam = []
    for scale in (1, 2):
        mu = cv2.filter2D(img, -1, gaussian_window,
                          borderType=cv2.BORDER_REPLICATE)
        sigma = np.sqrt(
            np.abs(
                cv2.filter2D(np.square(img), -1, gaussian_window,
                             borderType=cv2.BORDER_REPLICATE)
                - np.square(mu)
            )
        )
        img_norm = (img - mu) / (sigma + 1)
        # block COUNT is constant across scales; the block size halves into
        # the downsampled image (reference `niqe.py:119-128`)
        feat = []
        for idx_w in range(num_block_w):
            for idx_h in range(num_block_h):
                block = img_norm[
                    idx_h * block_size_h // scale : (idx_h + 1)
                    * block_size_h // scale,
                    idx_w * block_size_w // scale : (idx_w + 1)
                    * block_size_w // scale,
                ]
                feat.append(_compute_feature(block))
        distparam.append(np.array(feat))
        if scale == 1:
            # the reference deliberately uses bilinear cv2.resize here, not
            # MATLAB bicubic (`niqe.py:131-138` "for simplicity... opencv");
            # match it exactly so scores are comparable to published numbers
            hh, ww = img.shape
            img = cv2.resize(
                img / 255.0, (ww // 2, hh // 2),
                interpolation=cv2.INTER_LINEAR,
            ) * 255.0

    distparam = np.concatenate(distparam, axis=1)
    mu_distparam = np.nanmean(distparam, axis=0)
    distparam_no_nan = distparam[~np.isnan(distparam).any(axis=1)]
    cov_distparam = np.cov(distparam_no_nan, rowvar=False)
    invcov_param = np.linalg.pinv((cov_pris + cov_distparam) / 2)
    diff = np.atleast_2d(mu_pris - mu_distparam)  # mu_pris ships as (1, 36)
    quality = diff @ invcov_param @ diff.T
    return float(np.sqrt(quality[0, 0]))


@METRIC_REGISTRY.register(name="calculate_niqe")
def calculate_niqe(img, crop_border: int = 0, input_order: str = "HWC",
                   convert_to: str = "y",
                   pris_params_path: Optional[str] = None, **kwargs):
    """img: HWC BGR uint8 (like the reference metric entry,
    `niqe.py:167-205`)."""
    path = (
        pris_params_path
        or os.environ.get("VMAMBAIR_NIQE_PARAMS")
        or os.path.join(
            os.path.dirname(__file__), "assets", "niqe_pris_params.npz"
        )
    )
    if not path or not os.path.exists(path):
        raise FileNotFoundError(
            "NIQE needs the pristine-model parameters "
            "(niqe_pris_params.npz with mu_pris_param, cov_pris_param, "
            "gaussian_window). The fitted asset (a data file published with "
            "basicsr) is vendored under metrics/assets/; pass "
            "pris_params_path=... or set VMAMBAIR_NIQE_PARAMS to override."
        )
    data = np.load(path)
    mu_pris = data["mu_pris_param"]
    cov_pris = data["cov_pris_param"]
    gaussian_window = data["gaussian_window"]

    # reference order (`niqe.py:190-201`): convert to Y first, crop after,
    # no rounding
    img = np.asarray(img, np.float32)
    if img.ndim == 3 and img.shape[2] == 3:
        if convert_to == "y":
            img = bgr2ycbcr(img / 255.0, y_only=True) * 255.0
        else:
            img = cv2.cvtColor(img / 255.0, cv2.COLOR_BGR2GRAY) * 255.0
    elif img.ndim == 3:
        img = img[..., 0]
    img = np.squeeze(img)
    if crop_border:
        img = img[crop_border:-crop_border, crop_border:-crop_border]
    return _niqe_core(img, mu_pris, cov_pris, gaussian_window)
