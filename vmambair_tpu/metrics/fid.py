"""FID (Frechet Inception Distance).

Rebuilds `/root/reference/Deraining/basicsr/metrics/fid.py:57-102`: Frechet
distance between Gaussians fitted to feature activations. The reference
extracts features with a pretrained InceptionV3-FID network; pretrained
weights cannot be downloaded in this environment, so `calculate_fid`
operates on caller-supplied feature arrays (or statistics), and
`extract_vgg_features` offers a weights-path-gated extractor consistent
with the LPIPS/DISTS handling.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from scipy import linalg

from ..utils.registry import METRIC_REGISTRY


def compute_statistics(feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """feats: (N, D) activations -> (mu, sigma)."""
    mu = np.mean(feats, axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, sigma


@METRIC_REGISTRY.register(name="calculate_fid")
def calculate_fid(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Frechet distance between two Gaussians (reference `fid.py:57-102`,
    same eps-regularized sqrtm handling)."""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    assert mu1.shape == mu2.shape and sigma1.shape == sigma2.shape

    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm(
            (sigma1 + offset) @ (sigma2 + offset), disp=False
        )[0]
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError(
                f"Imaginary component {np.max(np.abs(covmean.imag))}"
            )
        covmean = covmean.real
    return float(
        diff @ diff + np.trace(sigma1) + np.trace(sigma2)
        - 2 * np.trace(covmean)
    )


def extract_vgg_features(imgs, weights_path: Optional[str] = None,
                         layer: str = "conv5_4") -> np.ndarray:
    """Pooled deep features for FID-style statistics. imgs: (N, H, W, 3)
    RGB in [0, 1]. With `weights_path` (converted VGG19 .npz) the features
    are ImageNet-pretrained; otherwise a seeded random backbone gives a
    deterministic relative metric (clearly not comparable to published
    InceptionV3-FID numbers)."""
    import jax.numpy as jnp

    from ..losses.perceptual import (
        IMAGENET_MEAN,
        IMAGENET_STD,
        _init_vgg_params,
        vgg19_features,
    )

    params, _ = _init_vgg_params(weights_path)
    x = (jnp.asarray(imgs, jnp.float32) - IMAGENET_MEAN) / IMAGENET_STD
    feats = vgg19_features(x, params, [layer], False, False)[layer]
    return np.asarray(jnp.mean(feats, axis=(1, 2)))
