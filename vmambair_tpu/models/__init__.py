"""Model architectures + named presets matching the reference configs.

The reference instantiates archs from YAML `network_g.type` strings
(`SRGAN/options/MambaSISR15_x4.yml:55-71`). The same names work here:
MambaSISR6, MambaRealSR11, Mamber32, Mamber33 are presets of the unified
`OSSNet`; UNetDiscriminatorSN and SRVGGNetCompact are standalone.
"""

from __future__ import annotations

from ..utils.registry import ARCH_REGISTRY, build_from_cfg
from .layers import LayerNorm2d, FeedForward, Conv2d
from .oss import OSS, SpatialScan, ChannelScan
from .unet import OSSNet, MamberBlock
from .discriminator import UNetDiscriminatorSN
from .restormer import Restormer, RestormerBlock, MDTA
from .srvgg import SRVGGNetCompact

ARCH_REGISTRY.register(OSSNet)
ARCH_REGISTRY.register(UNetDiscriminatorSN)
ARCH_REGISTRY.register(SRVGGNetCompact)
ARCH_REGISTRY.register(Restormer)


@ARCH_REGISTRY.register(name="MambaSISR6")
def mamba_sisr6(**kw):
    """x4 SISR generator (`MambaSISR6_arch.py:557`), SISR channel variant."""
    cfg = dict(
        scale=4,
        dim=48,
        num_blocks=(15, 1, 1, 1),
        num_refinement_blocks=15,
        channel_version="conv4",
        channel_attn="mul",
        tail="pixelshuffle",
    )
    cfg.update(kw)
    return OSSNet(**_normalize(cfg))


@ARCH_REGISTRY.register(name="MambaRealSR11")
def mamba_realsr11(**kw):
    """Real-world x4 SR generator (`MambaRealSR11_arch.py:892`; shipped
    size `RealSR/options/mambaSR11_x4.yml:82-92`: blocks [6,2,2,1] + 6
    refinement)."""
    cfg = dict(
        scale=4,
        dim=48,
        num_blocks=(6, 2, 2, 1),
        num_refinement_blocks=6,
        channel_version="direct",
        channel_attn="mul",
        tail="pixelshuffle",
    )
    cfg.update(kw)
    return OSSNet(**_normalize(cfg))


@ARCH_REGISTRY.register(name="Mamber32")
def mamber32(**kw):
    """Deraining generator, additive channel attention
    (`mamber32_arch.py:554`)."""
    cfg = dict(
        scale=1,
        dim=48,
        num_blocks=(3, 5, 7, 9),
        num_refinement_blocks=2,
        channel_version="conv4",
        channel_attn="add",
        tail="conv_residual",
    )
    cfg.update(kw)
    return OSSNet(**_normalize(cfg))


@ARCH_REGISTRY.register(name="Mamber33")
def mamber33(**kw):
    """Deraining generator, multiplicative channel attention, dc_inner=2
    (`mamber33_arch.py:552`)."""
    cfg = dict(
        scale=1,
        dim=48,
        num_blocks=(3, 5, 7, 9),
        num_refinement_blocks=2,
        channel_version="conv2",
        channel_attn="mul",
        tail="conv_residual",
    )
    cfg.update(kw)
    return OSSNet(**_normalize(cfg))


def _normalize(cfg: dict) -> dict:
    """Map reference YAML keys to OSSNet fields and drop vestigial ones."""
    cfg = dict(cfg)
    cfg.pop("heads", None)  # unused by the reference archs too
    if "LayerNorm_type" in cfg:
        cfg["ln_bias"] = cfg.pop("LayerNorm_type") != "BiasFree"
    if "bias" in cfg:
        cfg["use_bias"] = cfg.pop("bias")
    if "num_blocks" in cfg:
        cfg["num_blocks"] = tuple(cfg["num_blocks"])
    return cfg


def build_network(opt: dict):
    """Build an arch from a YAML `network_g`/`network_d` block."""
    opt = dict(opt)
    name = opt.pop("type")
    factory = ARCH_REGISTRY.get(name)
    return factory(**opt)


__all__ = [
    "OSSNet",
    "Restormer",
    "MamberBlock",
    "OSS",
    "SpatialScan",
    "ChannelScan",
    "UNetDiscriminatorSN",
    "SRVGGNetCompact",
    "build_network",
    "ARCH_REGISTRY",
]
