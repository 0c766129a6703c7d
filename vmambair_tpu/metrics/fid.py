"""FID (Frechet Inception Distance).

Rebuilds `/root/reference/Deraining/basicsr/metrics/fid.py:57-102`: Frechet
distance between Gaussians fitted to feature activations.
`extract_inception_features` is the published-FID pathway (InceptionV3
pool3 features, `fid.py:22-54`) — convert the `pt_inception-2015-12-05`
checkpoint via `scripts/convert_metric_weights.py --inception` (weights
cannot be downloaded in this environment). `extract_vgg_features` remains
as the weights-path-gated VGG fallback consistent with the LPIPS/DISTS
handling; without pretrained weights either extractor is a seeded-random
backbone (deterministic but NOT comparable to published numbers — the
validation loop reports such metrics as `*_uncalibrated`).
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


def extract_inception_features(imgs, weights_path: str,
                               resize_input: bool = True,
                               normalize_input: bool = False,
                               batch: int = 16) -> np.ndarray:
    """Published-FID features: InceptionV3 pool3 (N, 2048) activations
    (reference `fid.py:22-54` / `load_patched_inception_v3`). imgs:
    (N, H, W, 3) RGB in [0, 1]. Requires a converted checkpoint npz
    (`scripts/convert_metric_weights.py --inception`)."""
    import jax

    from .inception import inception_pool3, load_inception_params

    params = load_inception_params(weights_path)
    fn = jax.jit(
        lambda x: inception_pool3(
            x, params, resize_input=resize_input,
            normalize_input=normalize_input,
        )
    )
    imgs = np.asarray(imgs, np.float32)
    outs = [
        np.asarray(fn(imgs[i : i + batch]))
        for i in range(0, len(imgs), batch)
    ]
    return np.concatenate(outs, axis=0)
