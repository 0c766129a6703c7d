"""LPIPS (Learned Perceptual Image Patch Similarity) — JAX implementation.

Rebuilds the reference's LPIPS metric CLI dependency
(`/root/reference/SRGAN/Metric/LPIPS.py:11-43`: lpips.LPIPS(net='vgg'),
inputs normalized to [-1, 1]). Architecture: VGG16 features at the 5
relu-block outputs (conv1_2/2_2/3_3/4_3/5_3, like upstream lpips),
unit-normalized over channels, squared difference, 1x1 linear heads,
spatial mean, sum over layers. The ImageNet normalization on [0,1] inputs
is algebraically identical to lpips's ScalingLayer on [-1,1] inputs
(shift = 2*mean - 1, scale = 2*std).

Pretrained weights (VGG backbone + linear heads) cannot be downloaded here
(zero egress); supply `weights_path` as .npz with `conv{i}_{j}/kernel|bias`
(backbone, HWIO) and `lin{k}/weight` (heads, (C,)) converted from the
torch `lpips` package to get numbers comparable to the reference. Without
weights this still defines a deterministic perceptual distance (seeded
random backbone, uniform heads) usable for relative comparisons.
"""

from __future__ import annotations

from typing import Optional

import jax
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

# upstream lpips net='vgg' is VGG16: relu outputs of the 5 blocks
_LPIPS_LAYERS = ["conv1_2", "conv2_2", "conv3_3", "conv4_3", "conv5_3"]


class LPIPS:
    def __init__(self, weights_path: Optional[str] = None, seed: int = 0):
        self.params, self.is_pretrained = _init_vgg_params(
            weights_path, seed, plan=VGG16_LAYERS
        )
        self.lins = {}
        if weights_path:
            data = np.load(weights_path)
            for i, name in enumerate(_LPIPS_LAYERS):
                key = f"lin{i}/weight"
                if key in data:
                    self.lins[name] = jnp.asarray(data[key])

    def __call__(self, img1, img2) -> float:
        """img1/img2: HWC float32 in [0, 1] (RGB) or uint8."""
        def prep(im):
            im = jnp.asarray(im, jnp.float32)
            if im.ndim == 3:
                im = im[None]
            if im.max() > 1.5:
                im = im / 255.0
            # lpips normalizes [-1,1] then by its own shift/scale; using
            # ImageNet stats matches the vgg backbone convention
            return (im - IMAGENET_MEAN) / IMAGENET_STD

        f1 = vgg_features(prep(img1), self.params, _LPIPS_LAYERS, False,
                          False, plan=VGG16_LAYERS)
        f2 = vgg_features(prep(img2), self.params, _LPIPS_LAYERS, False,
                          False, plan=VGG16_LAYERS)
        total = 0.0
        for name in _LPIPS_LAYERS:
            a = f1[name]
            b = f2[name]
            a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
            b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
            d = jnp.square(a - b)  # (1, H, W, C)
            if name in self.lins:
                d = d * jax.nn.relu(self.lins[name])
                total += float(jnp.mean(jnp.sum(d, axis=-1)))
            else:
                total += float(jnp.mean(d) * d.shape[-1] / len(
                    _LPIPS_LAYERS))
        return total


_default_lpips: Optional[LPIPS] = None


@METRIC_REGISTRY.register(name="calculate_lpips")
def calculate_lpips(img1, img2, weights_path=None, **kwargs) -> float:
    global _default_lpips
    if _default_lpips is None or weights_path:
        _default_lpips = LPIPS(weights_path)
    return _default_lpips(img1, img2)
