"""Compact VGG-style SR net (registered-but-auxiliary in the reference).

Rebuild of `SRVGGNetCompact`
(`/root/reference/SRGAN/VmambaIR/archs/srvgg_arch.py:7-69`) in Flax/NHWC.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..ops.pixel_shuffle import pixel_shuffle
from .layers import Conv2d, nearest_upsample


class SRVGGNetCompact(nn.Module):
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_conv: int = 16
    upscale: int = 4
    act_type: str = "prelu"
    dtype: Any = None

    def _act(self, x, idx):
        if self.act_type == "relu":
            return nn.relu(x)
        if self.act_type == "prelu":
            alpha = self.param(
                f"prelu_{idx}",
                nn.initializers.constant(0.25),
                (self.num_feat,),
            )
            return jnp.where(x >= 0, x, alpha * x)
        return nn.leaky_relu(x, negative_slope=0.1)

    @nn.compact
    def __call__(self, x):
        out = Conv2d(self.num_feat, 3, dtype=self.dtype, name="conv_first")(x)
        out = self._act(out, 0)
        for i in range(self.num_conv):
            out = Conv2d(self.num_feat, 3, dtype=self.dtype,
                         name=f"conv_{i}")(out)
            out = self._act(out, i + 1)
        out = Conv2d(
            self.num_out_ch * self.upscale**2, 3, dtype=self.dtype,
            name="conv_last",
        )(out)
        out = pixel_shuffle(out, self.upscale)
        return out + nearest_upsample(x, self.upscale)
