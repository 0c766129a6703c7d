"""Pixel losses (L1/MSE/PSNR/Charbonnier) + KD loss.

Rebuilds the reference loss zoo
(`/root/reference/Deraining/basicsr/models/losses/losses.py:26-122`,
`SRGAN/VmambaIR/losses/my_loss.py:7-34`) as pure JAX functions wrapped in
thin configurable classes registered under the same YAML names.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..utils.registry import LOSS_REGISTRY

_REDUCES = {"none": lambda x: x, "mean": jnp.mean, "sum": jnp.sum}


def l1_loss(pred, target, weight=None, reduction="mean"):
    loss = jnp.abs(pred - target)
    if weight is not None:
        loss = loss * weight
    return _REDUCES[reduction](loss)


def mse_loss(pred, target, weight=None, reduction="mean"):
    loss = jnp.square(pred - target)
    if weight is not None:
        loss = loss * weight
    return _REDUCES[reduction](loss)


def charbonnier_loss(pred, target, weight=None, reduction="mean", eps=1e-12):
    loss = jnp.sqrt(jnp.square(pred - target) + eps)
    if weight is not None:
        loss = loss * weight
    return _REDUCES[reduction](loss)


def psnr_loss(pred, target, toY=False):
    """Negative PSNR as a loss (reference `losses.py` PSNRLoss: scale
    10/log(10), optional Y-channel). Inputs in [0, 1], NHWC."""
    if toY:
        coef = jnp.array([65.481, 128.553, 24.966]) / 255.0
        pred = jnp.sum(pred * coef, axis=-1, keepdims=True) + 16.0 / 255.0
        target = jnp.sum(target * coef, axis=-1, keepdims=True) + 16.0 / 255.0
    mse = jnp.mean(jnp.square(pred - target), axis=(1, 2, 3))
    return jnp.mean(10.0 / jnp.log(10.0) * jnp.log(mse + 1e-8))


def kd_loss(s_feat, t_feat, temperature=0.15, alpha=1.0):
    """Distillation: KL over spatial softmax at temperature + L1
    (reference `my_loss.py:7-34` KDLoss)."""
    b, h, w, c = s_feat.shape
    s = s_feat.reshape(b, -1) / temperature
    t = t_feat.reshape(b, -1) / temperature
    log_p_s = jax.nn.log_softmax(s, axis=-1)
    p_t = jax.nn.softmax(t, axis=-1)
    kl = jnp.sum(p_t * (jnp.log(p_t + 1e-12) - log_p_s), axis=-1).mean()
    return alpha * kl * temperature**2 + l1_loss(s_feat, t_feat)


class _WeightedLoss:
    def __init__(self, loss_weight=1.0, reduction="mean"):
        self.loss_weight = loss_weight
        self.reduction = reduction


@LOSS_REGISTRY.register(name="L1Loss")
class L1Loss(_WeightedLoss):
    def __call__(self, pred, target, weight=None):
        return self.loss_weight * l1_loss(pred, target, weight, self.reduction)


@LOSS_REGISTRY.register(name="MSELoss")
class MSELoss(_WeightedLoss):
    def __call__(self, pred, target, weight=None):
        return self.loss_weight * mse_loss(pred, target, weight, self.reduction)


@LOSS_REGISTRY.register(name="CharbonnierLoss")
class CharbonnierLoss(_WeightedLoss):
    def __init__(self, loss_weight=1.0, reduction="mean", eps=1e-12):
        super().__init__(loss_weight, reduction)
        self.eps = eps

    def __call__(self, pred, target, weight=None):
        return self.loss_weight * charbonnier_loss(
            pred, target, weight, self.reduction, self.eps
        )


@LOSS_REGISTRY.register(name="PSNRLoss")
class PSNRLoss:
    def __init__(self, loss_weight=1.0, reduction="mean", toY=False):
        self.loss_weight = loss_weight
        self.toY = toY

    def __call__(self, pred, target, weight=None):
        return self.loss_weight * psnr_loss(pred, target, self.toY)


@LOSS_REGISTRY.register(name="KDLoss")
class KDLoss:
    def __init__(self, loss_weight=1.0, temperature=0.15, alpha=1.0):
        self.loss_weight = loss_weight
        self.temperature = temperature
        self.alpha = alpha

    def __call__(self, s_feat, t_feat):
        return self.loss_weight * kd_loss(
            s_feat, t_feat, self.temperature, self.alpha
        )
