"""Perceptual (VGG19) loss.

Rebuild of pip-basicsr's `PerceptualLoss`/`VGGFeatureExtractor` used by the
reference GAN stages (YAML `perceptual_opt`, layer weights e.g.
`{'conv1_2': 0.1, ..., 'conv5_4': 1}`, `MambaSISR15GAN_x4.yml:110-132`).

VGG19 is implemented in Flax (NHWC). Pretrained ImageNet weights cannot be
downloaded in this environment (zero egress, no torchvision); pass
`pretrained_path` pointing to an `.npz` with arrays `conv{i}_{j}/kernel`
(HWIO) and `conv{i}_{j}/bias` to enable true perceptual parity. Without it
the extractor falls back to fixed random features (seeded), which still
provides a structured multi-scale loss signal and keeps the training
pipeline exercisable end to end.
"""

from __future__ import annotations

import logging
import math
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.registry import LOSS_REGISTRY

logger = logging.getLogger("vmambair_tpu")

# VGG conv plans: (name, out_channels); 'M' = 2x2 maxpool
VGG19_LAYERS = [
    ("conv1_1", 64), ("conv1_2", 64), "M",
    ("conv2_1", 128), ("conv2_2", 128), "M",
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), ("conv3_4", 256),
    "M",
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512), ("conv4_4", 512),
    "M",
    ("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512), ("conv5_4", 512),
]

# VGG16 — the backbone of upstream lpips (net='vgg') and DISTS
VGG16_LAYERS = [
    ("conv1_1", 64), ("conv1_2", 64), "M",
    ("conv2_1", 128), ("conv2_2", 128), "M",
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), "M",
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512), "M",
    ("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512),
]

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _init_vgg_params(pretrained_path: Optional[str], seed: int = 0,
                     plan=VGG19_LAYERS):
    params: Dict[str, Dict[str, jnp.ndarray]] = {}
    if pretrained_path:
        data = np.load(pretrained_path)
        for item in plan:
            if item == "M":
                continue
            name, _ = item
            params[name] = {
                "kernel": jnp.asarray(data[f"{name}/kernel"]),
                "bias": jnp.asarray(data[f"{name}/bias"]),
            }
        return params, True
    rng = np.random.RandomState(seed)
    in_ch = 3
    for item in plan:
        if item == "M":
            continue
        name, out_ch = item
        fan_in = in_ch * 9
        std = math.sqrt(2.0 / fan_in)  # he-normal, VGG's init regime
        params[name] = {
            "kernel": jnp.asarray(
                rng.normal(0, std, (3, 3, in_ch, out_ch)).astype(np.float32)
            ),
            "bias": jnp.zeros((out_ch,), jnp.float32),
        }
        in_ch = out_ch
    return params, False


def _l2_pool(x):
    """DISTS L2-pooling (anti-aliased): sqrt of a hann-windowed 3x3 conv of
    x^2, stride 2 (upstream `DISTS_pt.py` L2pooling with filter_size=3)."""
    w1 = np.hanning(5)[1:-1]  # 3-tap hann window, endpoints dropped
    w2 = np.outer(w1, w1)
    w2 = (w2 / w2.sum()).astype(np.float32)
    c = x.shape[-1]
    kern = jnp.asarray(w2)[:, :, None, None] * jnp.ones((1, 1, 1, c))
    y = jax.lax.conv_general_dilated(
        jnp.square(x), kern, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return jnp.sqrt(jnp.maximum(y, 0.0) + 1e-12)


def vgg_features(x, params, layer_names: Sequence[str],
                 use_input_norm=True, range_norm=False, plan=VGG19_LAYERS,
                 pool="max"):
    """x: (B, H, W, 3) in [0,1] (or [-1,1] with range_norm). Returns dict of
    requested layer activations. pool: 'max' (VGG) or 'l2' (DISTS)."""
    if range_norm:
        x = (x + 1.0) / 2.0
    if use_input_norm:
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
    feats = {}
    wanted = set(layer_names)
    remaining = set(layer_names)
    for item in plan:
        if not remaining:
            break
        if item == "M":
            if pool == "l2":
                x = _l2_pool(x)
            else:
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                    "VALID",
                )
            continue
        name, _ = item
        p = params[name]
        x = jax.lax.conv_general_dilated(
            x, p["kernel"], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["bias"]
        x = jax.nn.relu(x)
        if name in wanted:
            feats[name] = x
            remaining.discard(name)
    return feats


def vgg19_features(x, params, layer_names: Sequence[str],
                   use_input_norm=True, range_norm=False):
    return vgg_features(x, params, layer_names, use_input_norm, range_norm,
                        plan=VGG19_LAYERS)


@LOSS_REGISTRY.register(name="PerceptualLoss")
class PerceptualLoss:
    def __init__(
        self,
        layer_weights: Dict[str, float],
        vgg_type: str = "vgg19",
        use_input_norm: bool = True,
        range_norm: bool = False,
        perceptual_weight: float = 1.0,
        style_weight: float = 0.0,
        criterion: str = "l1",
        pretrained_path: Optional[str] = None,
    ):
        assert vgg_type == "vgg19", "only vgg19 is supported"
        self.layer_weights = dict(layer_weights)
        self.use_input_norm = use_input_norm
        self.range_norm = range_norm
        self.perceptual_weight = perceptual_weight
        self.style_weight = style_weight
        self.criterion = criterion
        self.params, self.is_pretrained = _init_vgg_params(pretrained_path)
        if not self.is_pretrained:
            logger.warning(
                "PerceptualLoss has no pretrained_path — using seeded "
                "RANDOM VGG19 features: the loss is a usable structured "
                "training signal but NOT the published VGG19-perceptual "
                "loss (convert torchvision weights via "
                "scripts/convert_metric_weights.py for parity)"
            )

    def _crit(self, a, b):
        if self.criterion == "l1":
            return jnp.mean(jnp.abs(a - b))
        if self.criterion == "l2" or self.criterion == "mse":
            return jnp.mean(jnp.square(a - b))
        if self.criterion == "fro":
            return jnp.linalg.norm(a - b)
        raise NotImplementedError(self.criterion)

    @staticmethod
    def _gram(x):
        b, h, w, c = x.shape
        f = x.reshape(b, h * w, c)
        return jnp.einsum("bnc,bnd->bcd", f, f) / (h * w * c)

    def __call__(self, pred, target):
        names = list(self.layer_weights)
        fp = vgg19_features(pred, self.params, names, self.use_input_norm,
                            self.range_norm)
        ft = vgg19_features(
            jax.lax.stop_gradient(target), self.params, names,
            self.use_input_norm, self.range_norm,
        )
        percep = None
        if self.perceptual_weight > 0:
            percep = sum(
                self.layer_weights[n] * self._crit(fp[n], ft[n])
                for n in names
            ) * self.perceptual_weight
        style = None
        if self.style_weight > 0:
            style = sum(
                self.layer_weights[n]
                * self._crit(self._gram(fp[n]), self._gram(ft[n]))
                for n in names
            ) * self.style_weight
        return percep, style
