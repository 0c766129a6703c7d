"""OSS-UNet generator family (Restormer-shaped 4-level UNet with OSS blocks).

One configurable Flax module covers the reference's three generators:

* `MambaSISR6` (`SRGAN/VmambaIR/archs/MambaSISR6_arch.py:557-664`) — x4 SISR:
  pixel-shuffle tail + nearest-upsampled global residual.
* `MambaRealSR11` (`RealSR/VmambaIR/archs/MambaRealSR11_arch.py:892-1002`) —
  same UNet/tail, RealSR channel-scan variant.
* `Mamber32/33` (`Deraining/basicsr/models/archs/mamber3{2,3}_arch.py`) —
  scale-1 restoration: 3x3 output conv + input residual, optional dual-pixel
  skip path.

Structure (`MambaSISR6_arch.py:610-643`): 3x3 patch embed; encoder levels at
dims (D, 2D, 4D, 8D) with pixel-unshuffle downsampling; decoder with skip
concat + 1x1 channel reduce (level 1 decoder runs at 2D with no reduce);
refinement blocks; task tail.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.pallas_effn import effn_fused_supported
from .layers import (
    Conv2d,
    Downsample,
    LayerNorm2d,
    FeedForward,
    OverlapPatchEmbed,
    Upsample,
    Upsampler,
    nearest_upsample,
)
from .oss import OSS


class MamberBlock(nn.Module):
    """`x += OSS(LN(x)); x += EFFN(LN(x))` (`MambaSISR6_arch.py:502-515`)."""

    dim: int
    ffn_expansion_factor: float = 2.66
    use_bias: bool = False
    ln_bias: bool = True  # LayerNorm_type WithBias
    channel_version: str = "conv4"
    channel_attn: str = "mul"
    scan_impl: str = "auto"
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = x + OSS(
            d_model=self.dim,
            ssm_ratio=1.0,
            channel_version=self.channel_version,
            channel_attn=self.channel_attn,
            scan_impl=self.scan_impl,
            dtype=self.dtype,
            name="attn",
        )(x, norm=LayerNorm2d(self.dim, use_bias=self.ln_bias,
                              name="norm1"))
        norm2 = LayerNorm2d(self.dim, use_bias=self.ln_bias, name="norm2")
        ffn = FeedForward(
            self.dim, self.ffn_expansion_factor, self.use_bias,
            dtype=self.dtype, name="ffn",
        )
        # fused norm2+EFFN+residual Pallas branch (`ops/pallas_effn.py`):
        # one HBM read/write instead of five round-trips of the hidden
        # channels; gated like SpatialScan's fused path
        interp = self.scan_impl == "fused_interpret"
        hidden = int(self.dim * self.ffn_expansion_factor)
        if (
            not self.use_bias
            and self.ln_bias
            and effn_fused_supported(x.shape, hidden, interpret=interp)
            and (interp or (self.scan_impl in ("auto", "pallas")
                            and jax.default_backend() == "tpu"))
        ):
            w, b = norm2.scale_bias()
            x = ffn.fused_residual(x, w, b, eps=norm2.eps, interpret=interp)
        else:
            x = x + ffn(norm2(x))
        return x


class OSSNet(nn.Module):
    """Unified OSS-UNet generator."""

    inp_channels: int = 3
    out_channels: int = 3
    scale: int = 4
    dim: int = 48
    num_blocks: Sequence[int] = (15, 1, 1, 1)
    num_refinement_blocks: int = 15
    ffn_expansion_factor: float = 2.66
    use_bias: bool = False
    ln_bias: bool = True  # 'WithBias' LayerNorm_type
    channel_version: str = "conv4"
    channel_attn: str = "mul"
    tail: str = "pixelshuffle"  # 'pixelshuffle' (SR) | 'conv_residual' (derain)
    dual_pixel_task: bool = False
    scan_impl: str = "auto"
    dtype: Any = None

    def _blocks(self, dim, n, name):
        return [
            MamberBlock(
                dim=dim,
                ffn_expansion_factor=self.ffn_expansion_factor,
                use_bias=self.use_bias,
                ln_bias=self.ln_bias,
                channel_version=self.channel_version,
                channel_attn=self.channel_attn,
                scan_impl=self.scan_impl,
                dtype=self.dtype,
                name=f"{name}_{i}",
            )
            for i in range(n)
        ]

    @nn.compact
    def __call__(self, inp_img):
        # inp_img: (B, H, W, C) in [0, 1]
        dim = self.dim
        nb = self.num_blocks

        x1 = OverlapPatchEmbed(dim, self.use_bias, dtype=self.dtype,
                               name="patch_embed")(inp_img)
        enc1 = x1
        for blk in self._blocks(dim, nb[0], "encoder_level1"):
            enc1 = blk(enc1)

        x2 = Downsample(dim, dtype=self.dtype, name="down1_2")(enc1)
        enc2 = x2
        for blk in self._blocks(dim * 2, nb[1], "encoder_level2"):
            enc2 = blk(enc2)

        x3 = Downsample(dim * 2, dtype=self.dtype, name="down2_3")(enc2)
        enc3 = x3
        for blk in self._blocks(dim * 4, nb[2], "encoder_level3"):
            enc3 = blk(enc3)

        x4 = Downsample(dim * 4, dtype=self.dtype, name="down3_4")(enc3)
        latent = x4
        for blk in self._blocks(dim * 8, nb[3], "latent"):
            latent = blk(latent)

        d3 = Upsample(dim * 8, dtype=self.dtype, name="up4_3")(latent)
        d3 = jnp.concatenate([d3, enc3], axis=-1)
        d3 = Conv2d(dim * 4, 1, use_bias=self.use_bias, dtype=self.dtype,
                    name="reduce_chan_level3")(d3)
        for blk in self._blocks(dim * 4, nb[2], "decoder_level3"):
            d3 = blk(d3)

        d2 = Upsample(dim * 4, dtype=self.dtype, name="up3_2")(d3)
        d2 = jnp.concatenate([d2, enc2], axis=-1)
        d2 = Conv2d(dim * 2, 1, use_bias=self.use_bias, dtype=self.dtype,
                    name="reduce_chan_level2")(d2)
        for blk in self._blocks(dim * 2, nb[1], "decoder_level2"):
            d2 = blk(d2)

        d1 = Upsample(dim * 2, dtype=self.dtype, name="up2_1")(d2)
        d1 = jnp.concatenate([d1, enc1], axis=-1)  # 2*dim, no reduce
        for blk in self._blocks(dim * 2, nb[0], "decoder_level1"):
            d1 = blk(d1)
        for blk in self._blocks(
            dim * 2, self.num_refinement_blocks, "refinement"
        ):
            d1 = blk(d1)

        if self.tail == "pixelshuffle":
            out = Upsampler(self.scale, dim * 2, dtype=self.dtype,
                            name="tail_upsampler")(d1)
            out = Conv2d(self.out_channels, 3, use_bias=True,
                         dtype=self.dtype, name="tail_conv")(out)
            out = out + nearest_upsample(inp_img, self.scale)
        elif self.dual_pixel_task:
            d1 = d1 + Conv2d(dim * 2, 1, use_bias=self.use_bias,
                             dtype=self.dtype, name="skip_conv")(x1)
            out = Conv2d(self.out_channels, 3, use_bias=self.use_bias,
                         dtype=self.dtype, name="output")(d1)
        else:
            out = Conv2d(self.out_channels, 3, use_bias=self.use_bias,
                         dtype=self.dtype, name="output")(d1)
            out = out + inp_img
        return out
