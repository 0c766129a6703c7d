"""DISTS (Deep Image Structure and Texture Similarity) — JAX implementation.

Rebuilds the reference's DISTS metric
(`/root/reference/SRGAN/Metric/dists.py:29-155` +
`DISTS_pytorch/DISTS_pt.py`): VGG16 feature pyramid (input + 5 conv
stages) with anti-aliased L2 pooling, per-stage structure (covariance) and
texture (mean) similarity, combined with learned alpha/beta weights.

The published DISTS alpha/beta calibration weights are vendored at
`assets/dists_alpha_beta.npz` (converted from the reference's in-tree
`SRGAN/Metric/DISTS/DISTS_pytorch/weights.pt` buffers, `DISTS_pt.py:20-35`,
via `scripts/convert_metric_weights.py`) and loaded by default, so the
learned per-channel weighting is active out of the box. Supply
`weights_path` (.npz with `conv*/kernel|bias` and optionally
`alpha`/`beta`) to also use the pretrained VGG16 backbone for
published-comparable numbers; without it the backbone is seeded
(deterministic relative metric).
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..losses.perceptual import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    VGG16_LAYERS,
    _init_vgg_params,
    vgg_features,
)
from ..utils.registry import METRIC_REGISTRY

# upstream DISTS backbone: VGG16 with L2 (anti-aliased) pooling
_STAGES = ["conv1_2", "conv2_2", "conv3_3", "conv4_3", "conv5_3"]
_C1 = 1e-6
_C2 = 1e-6


_AB_ASSET = os.path.join(
    os.path.dirname(__file__), "assets", "dists_alpha_beta.npz"
)


class DISTS:
    def __init__(self, weights_path: Optional[str] = None, seed: int = 0):
        self.params, self.is_pretrained = _init_vgg_params(
            weights_path, seed, plan=VGG16_LAYERS
        )
        self.alpha = None
        self.beta = None
        self.heads_pretrained = False
        if weights_path:
            data = np.load(weights_path)
            if "alpha" in data:
                self.alpha = jnp.asarray(data["alpha"])
                self.beta = jnp.asarray(data["beta"])
                self.heads_pretrained = True
        if self.alpha is None and os.path.exists(_AB_ASSET):
            data = np.load(_AB_ASSET)  # vendored published calibration
            self.alpha = jnp.asarray(data["alpha"])
            self.beta = jnp.asarray(data["beta"])
            self.heads_pretrained = True

    def __call__(self, img1, img2) -> float:
        def prep(im):
            im = jnp.asarray(im, jnp.float32)
            if im.ndim == 3:
                im = im[None]
            if im.max() > 1.5:
                im = im / 255.0
            return (im - IMAGENET_MEAN) / IMAGENET_STD

        x, y = prep(img1), prep(img2)
        fx = [x] + [
            vgg_features(x, self.params, [s], False, False,
                         plan=VGG16_LAYERS, pool="l2")[s]
            for s in _STAGES
        ]
        fy = [y] + [
            vgg_features(y, self.params, [s], False, False,
                         plan=VGG16_LAYERS, pool="l2")[s]
            for s in _STAGES
        ]
        dist1, dist2 = [], []
        for a, b in zip(fx, fy):
            mu_a = jnp.mean(a, axis=(1, 2), keepdims=True)
            mu_b = jnp.mean(b, axis=(1, 2), keepdims=True)
            var_a = jnp.mean((a - mu_a) ** 2, axis=(1, 2), keepdims=True)
            var_b = jnp.mean((b - mu_b) ** 2, axis=(1, 2), keepdims=True)
            cov = jnp.mean(
                (a - mu_a) * (b - mu_b), axis=(1, 2), keepdims=True
            )
            s_tex = (2 * mu_a * mu_b + _C1) / (mu_a**2 + mu_b**2 + _C1)
            s_struct = (2 * cov + _C2) / (var_a + var_b + _C2)
            dist1.append(s_tex[:, 0, 0, :])    # (1, C)
            dist2.append(s_struct[:, 0, 0, :])
        if self.alpha is not None:
            w = jnp.concatenate([self.alpha, self.beta], axis=-1)
            w = w / jnp.sum(w)
            ka = [a.shape[-1] for a in dist1]
            alpha = jnp.split(w[..., : sum(ka)], np.cumsum(ka)[:-1], -1)
            beta = jnp.split(w[..., sum(ka):], np.cumsum(ka)[:-1], -1)
            score = sum(
                float(jnp.sum(al * d1) + jnp.sum(be * d2))
                for al, be, d1, d2 in zip(alpha, beta, dist1, dist2)
            )
        else:
            n = sum(d.shape[-1] for d in dist1) * 2
            score = sum(
                float(jnp.sum(d1) + jnp.sum(d2))
                for d1, d2 in zip(dist1, dist2)
            ) / n
        return float(1.0 - score)


_default_dists: Optional[DISTS] = None


@METRIC_REGISTRY.register(name="calculate_dists")
def calculate_dists(img1, img2, weights_path=None, **kwargs) -> float:
    global _default_dists
    if _default_dists is None or weights_path:
        _default_dists = DISTS(weights_path)
    return _default_dists(img1, img2)
