"""Restormer baseline (MDTA attention + GDFN) — comparison arch.

The reference keeps the Restormer architecture alongside the OSS models
(`/root/reference/Deraining/basicsr/models/archs/restormer_arch.py`,
`MambaRealSR11_arch.py:232-264` MDTA `Attention`): a 4-level UNet identical
in shape to OSSNet but with transposed-channel self-attention blocks. Kept
here for the same reason — baseline comparisons and tests.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    Conv2d,
    Downsample,
    FeedForward,
    LayerNorm2d,
    OverlapPatchEmbed,
    Upsample,
)


class MDTA(nn.Module):
    """Multi-Dconv-head transposed attention: attention over the CHANNEL
    dimension (C x C attention map), linear in pixels
    (`restormer_arch.py` Attention)."""

    dim: int
    num_heads: int
    use_bias: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        heads = self.num_heads
        temperature = self.param(
            "temperature", nn.initializers.ones, (heads, 1, 1)
        )
        qkv = Conv2d(c * 3, 1, use_bias=self.use_bias, dtype=self.dtype,
                     name="qkv")(x)
        qkv = Conv2d(c * 3, 3, groups=c * 3, use_bias=self.use_bias,
                     dtype=self.dtype, name="qkv_dwconv")(qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def reshape_heads(t):  # (B, H, W, C) -> (B, heads, C/heads, HW)
            t = t.reshape(b, h * w, heads, c // heads)
            return jnp.transpose(t, (0, 2, 3, 1))

        q, k, v = map(reshape_heads, (q, k, v))
        q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-8)
        k = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-8)
        attn = jnp.einsum("bhcn,bhdn->bhcd", q, k) * temperature
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhcd,bhdn->bhcn", attn, v)
        out = jnp.transpose(out, (0, 3, 1, 2)).reshape(b, h, w, c)
        return Conv2d(c, 1, use_bias=self.use_bias, dtype=self.dtype,
                      name="project_out")(out)


class RestormerBlock(nn.Module):
    dim: int
    num_heads: int
    ffn_expansion_factor: float = 2.66
    use_bias: bool = False
    ln_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = x + MDTA(self.dim, self.num_heads, self.use_bias,
                     dtype=self.dtype, name="attn")(
            LayerNorm2d(self.dim, use_bias=self.ln_bias, name="norm1")(x))
        x = x + FeedForward(self.dim, self.ffn_expansion_factor,
                            self.use_bias, dtype=self.dtype, name="ffn")(
            LayerNorm2d(self.dim, use_bias=self.ln_bias, name="norm2")(x))
        return x


class Restormer(nn.Module):
    """4-level Restormer UNet (`restormer_arch.py`, scale-1 restoration)."""

    inp_channels: int = 3
    out_channels: int = 3
    dim: int = 48
    num_blocks: Sequence[int] = (4, 6, 6, 8)
    num_refinement_blocks: int = 4
    heads: Sequence[int] = (1, 2, 4, 8)
    ffn_expansion_factor: float = 2.66
    use_bias: bool = False
    ln_bias: bool = True
    dual_pixel_task: bool = False
    dtype: Any = None

    def _blocks(self, dim, heads, n, name):
        return [
            RestormerBlock(
                dim=dim, num_heads=heads,
                ffn_expansion_factor=self.ffn_expansion_factor,
                use_bias=self.use_bias, ln_bias=self.ln_bias,
                dtype=self.dtype, name=f"{name}_{i}",
            )
            for i in range(n)
        ]

    @nn.compact
    def __call__(self, inp_img):
        dim, nb, hd = self.dim, self.num_blocks, self.heads
        x1 = OverlapPatchEmbed(dim, self.use_bias, dtype=self.dtype,
                               name="patch_embed")(inp_img)
        enc1 = x1
        for blk in self._blocks(dim, hd[0], nb[0], "encoder_level1"):
            enc1 = blk(enc1)
        x2 = Downsample(dim, dtype=self.dtype, name="down1_2")(enc1)
        enc2 = x2
        for blk in self._blocks(dim * 2, hd[1], nb[1], "encoder_level2"):
            enc2 = blk(enc2)
        x3 = Downsample(dim * 2, dtype=self.dtype, name="down2_3")(enc2)
        enc3 = x3
        for blk in self._blocks(dim * 4, hd[2], nb[2], "encoder_level3"):
            enc3 = blk(enc3)
        x4 = Downsample(dim * 4, dtype=self.dtype, name="down3_4")(enc3)
        latent = x4
        for blk in self._blocks(dim * 8, hd[3], nb[3], "latent"):
            latent = blk(latent)
        d3 = Upsample(dim * 8, dtype=self.dtype, name="up4_3")(latent)
        d3 = jnp.concatenate([d3, enc3], axis=-1)
        d3 = Conv2d(dim * 4, 1, use_bias=self.use_bias, dtype=self.dtype,
                    name="reduce_chan_level3")(d3)
        for blk in self._blocks(dim * 4, hd[2], nb[2], "decoder_level3"):
            d3 = blk(d3)
        d2 = Upsample(dim * 4, dtype=self.dtype, name="up3_2")(d3)
        d2 = jnp.concatenate([d2, enc2], axis=-1)
        d2 = Conv2d(dim * 2, 1, use_bias=self.use_bias, dtype=self.dtype,
                    name="reduce_chan_level2")(d2)
        for blk in self._blocks(dim * 2, hd[1], nb[1], "decoder_level2"):
            d2 = blk(d2)
        d1 = Upsample(dim * 2, dtype=self.dtype, name="up2_1")(d2)
        d1 = jnp.concatenate([d1, enc1], axis=-1)
        for blk in self._blocks(dim * 2, hd[0], nb[0], "decoder_level1"):
            d1 = blk(d1)
        for blk in self._blocks(dim * 2, hd[0],
                                self.num_refinement_blocks, "refinement"):
            d1 = blk(d1)
        if self.dual_pixel_task:
            d1 = d1 + Conv2d(dim * 2, 1, use_bias=self.use_bias,
                             dtype=self.dtype, name="skip_conv")(x1)
            out = Conv2d(self.out_channels, 3, use_bias=self.use_bias,
                         dtype=self.dtype, name="output")(d1)
        else:
            out = Conv2d(self.out_channels, 3, use_bias=self.use_bias,
                         dtype=self.dtype, name="output")(d1)
            out = out + inp_img
        return out
