"""U-Net discriminator with spectral normalization (Real-ESRGAN style).

Rebuild of `UNetDiscriminatorSN`
(`/root/reference/SRGAN/VmambaIR/archs/discriminator_arch.py:8-67`) in
Flax/NHWC. Spectral norm uses flax's power-iteration implementation
(collection 'batch_stats'); pass `update_stats=True` during discriminator
training steps.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .layers import Conv2d, bilinear_upsample_x2, torch_kernel_init


class UNetDiscriminatorSN(nn.Module):
    num_in_ch: int = 3
    num_feat: int = 64
    skip_connection: bool = True
    dtype: Any = None

    def _sn_conv(self, feats, k, stride, name):
        return nn.SpectralNorm(
            nn.Conv(
                features=feats,
                kernel_size=(k, k),
                strides=(stride, stride),
                padding=[(k // 2 - (k % 2 == 0), k // 2),
                         (k // 2 - (k % 2 == 0), k // 2)]
                if k % 2 == 0
                else [(k // 2, k // 2), (k // 2, k // 2)],
                use_bias=False,
                kernel_init=torch_kernel_init,
                dtype=self.dtype,
                name=name,
            )
        )

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        nf = self.num_feat
        lrelu = lambda v: nn.leaky_relu(v, negative_slope=0.2)

        x0 = lrelu(Conv2d(nf, 3, use_bias=True, dtype=self.dtype,
                          name="conv0")(x))
        # torch Conv2d(k=4, s=2, p=1): pad 1 on both sides
        x1 = lrelu(
            nn.SpectralNorm(
                nn.Conv(nf * 2, (4, 4), (2, 2), [(1, 1), (1, 1)],
                        use_bias=False, kernel_init=torch_kernel_init,
                        dtype=self.dtype, name="conv1")
            )(x0, update_stats=update_stats)
        )
        x2 = lrelu(
            nn.SpectralNorm(
                nn.Conv(nf * 4, (4, 4), (2, 2), [(1, 1), (1, 1)],
                        use_bias=False, kernel_init=torch_kernel_init,
                        dtype=self.dtype, name="conv2")
            )(x1, update_stats=update_stats)
        )
        x3 = lrelu(
            nn.SpectralNorm(
                nn.Conv(nf * 8, (4, 4), (2, 2), [(1, 1), (1, 1)],
                        use_bias=False, kernel_init=torch_kernel_init,
                        dtype=self.dtype, name="conv3")
            )(x2, update_stats=update_stats)
        )

        u3 = bilinear_upsample_x2(x3)
        x4 = lrelu(
            nn.SpectralNorm(
                nn.Conv(nf * 4, (3, 3), (1, 1), [(1, 1), (1, 1)],
                        use_bias=False, kernel_init=torch_kernel_init,
                        dtype=self.dtype, name="conv4")
            )(u3, update_stats=update_stats)
        )
        if self.skip_connection:
            x4 = x4 + x2
        u4 = bilinear_upsample_x2(x4)
        x5 = lrelu(
            nn.SpectralNorm(
                nn.Conv(nf * 2, (3, 3), (1, 1), [(1, 1), (1, 1)],
                        use_bias=False, kernel_init=torch_kernel_init,
                        dtype=self.dtype, name="conv5")
            )(u4, update_stats=update_stats)
        )
        if self.skip_connection:
            x5 = x5 + x1
        u5 = bilinear_upsample_x2(x5)
        x6 = lrelu(
            nn.SpectralNorm(
                nn.Conv(nf, (3, 3), (1, 1), [(1, 1), (1, 1)],
                        use_bias=False, kernel_init=torch_kernel_init,
                        dtype=self.dtype, name="conv6")
            )(u5, update_stats=update_stats)
        )
        if self.skip_connection:
            x6 = x6 + x0

        out = lrelu(
            nn.SpectralNorm(
                nn.Conv(nf, (3, 3), (1, 1), [(1, 1), (1, 1)],
                        use_bias=False, kernel_init=torch_kernel_init,
                        dtype=self.dtype, name="conv7")
            )(x6, update_stats=update_stats)
        )
        out = lrelu(
            nn.SpectralNorm(
                nn.Conv(nf, (3, 3), (1, 1), [(1, 1), (1, 1)],
                        use_bias=False, kernel_init=torch_kernel_init,
                        dtype=self.dtype, name="conv8")
            )(out, update_stats=update_stats)
        )
        out = Conv2d(1, 3, use_bias=True, dtype=self.dtype,
                     name="conv9")(out)
        return out
