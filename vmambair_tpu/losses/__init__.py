from .basic import (
    L1Loss,
    MSELoss,
    CharbonnierLoss,
    PSNRLoss,
    KDLoss,
    l1_loss,
    mse_loss,
    charbonnier_loss,
    psnr_loss,
)
from .gan import GANLoss
from .perceptual import PerceptualLoss, vgg19_features
from ..utils.registry import LOSS_REGISTRY, build_from_cfg


def build_loss(opt: dict):
    return build_from_cfg(opt, LOSS_REGISTRY)


__all__ = [
    "L1Loss", "MSELoss", "CharbonnierLoss", "PSNRLoss", "KDLoss",
    "GANLoss", "PerceptualLoss", "build_loss", "LOSS_REGISTRY",
]
