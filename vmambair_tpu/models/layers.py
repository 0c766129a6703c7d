"""Common model layers (Flax, NHWC).

Rebuilds the layer vocabulary of the reference archs
(`/root/reference/SRGAN/VmambaIR/archs/MambaSISR6_arch.py:144-218,520-553`,
`common.py:7-60`) in channels-last layout for TPU. Initializers reproduce
torch defaults (kaiming-uniform a=sqrt(5) for conv/linear weights, uniform
+-1/sqrt(fan_in) for biases) so random-init training matches the reference's
statistical regime.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle

# torch nn.Conv2d / nn.Linear default weight init: kaiming_uniform(a=sqrt(5))
# == uniform(+-sqrt(1/fan_in)) == variance_scaling(1/3, fan_in, uniform)
torch_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)


def torch_bias_init(fan_in: int) -> Callable:
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Conv2d(nn.Module):
    """NHWC conv with torch-default initialization.

    `groups=features` gives a depthwise conv (lowered by XLA to an efficient
    TPU depthwise convolution).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: Any = None  # default: 'SAME'-style torch padding k//2
    groups: int = 1
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        pad = self.padding if self.padding is not None else k // 2
        in_ch = x.shape[-1]
        fan_in = (in_ch // self.groups) * k * k
        y = nn.Conv(
            features=self.features,
            kernel_size=(k, k),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)] if isinstance(pad, int) else pad,
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype,
            name="conv",
        )(x)
        return y


class LayerNorm2d(nn.Module):
    """Channel LayerNorm over NHWC, matching the reference's to_3d/to_4d
    LayerNorm (`MambaSISR6_arch.py:144-195`).

    bias=False reproduces `BiasFree_LayerNorm`: x / sqrt(var + eps) * w with
    var the mean-subtracted variance but NO mean subtraction in the output.

    setup-style (not compact) so fused consumers can read the affine params
    via `scale_bias()` without applying the norm (`ops/pallas_effn.py`
    computes it inside the kernel).
    """

    dim: int
    use_bias: bool = True
    eps: float = 1e-5

    def setup(self):
        self.weight = self.param("weight", nn.initializers.ones, (self.dim,))
        if self.use_bias:
            self.bias = self.param("bias", nn.initializers.zeros,
                                   (self.dim,))

    def scale_bias(self):
        return self.weight, (self.bias if self.use_bias else None)

    def __call__(self, x):
        dtype = x.dtype
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        if self.use_bias:
            y = ((xf - mu) * jax.lax.rsqrt(var + self.eps) * self.weight
                 + self.bias)
        else:
            y = xf * jax.lax.rsqrt(var + self.eps) * self.weight
        return y.astype(dtype)


class _ConvKernel(nn.Module):
    """Parameter holder matching nn.Conv's param tree ({kernel[, bias]})."""

    shape: Sequence[int]
    fan_in: int
    use_bias: bool

    def setup(self):
        self.kernel = self.param("kernel", torch_kernel_init,
                                 tuple(self.shape))
        if self.use_bias:
            self.bias = self.param("bias", torch_bias_init(self.fan_in),
                                   (self.shape[-1],))

    def get(self):
        return self.kernel, (self.bias if self.use_bias else None)


class _ConvParams(nn.Module):
    """Parameter-only stand-in for the Conv2d wrapper: owns the identical
    `<name>/conv/{kernel,bias}` tree (same shapes, same torch-default init,
    same rng folding) without requiring a forward call to materialize."""

    features: int
    kernel_size: int
    in_ch: int
    groups: int = 1
    use_bias: bool = True

    def setup(self):
        k = self.kernel_size
        self.conv = _ConvKernel(
            (k, k, self.in_ch // self.groups, self.features),
            (self.in_ch // self.groups) * k * k,
            self.use_bias,
        )

    def get(self):
        return self.conv.get()

    def __call__(self, x, dtype=None):
        """Apply the conv (torch k//2 padding), matching Conv2d/nn.Conv
        dtype promotion."""
        kernel, bias = self.conv.get()
        from flax.linen.dtypes import promote_dtype

        x, kernel, bias = promote_dtype(x, kernel, bias, dtype=dtype)
        pad = self.kernel_size // 2
        y = jax.lax.conv_general_dilated(
            x, kernel, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
        )
        if bias is not None:
            y = y + bias
        return y


class FeedForward(nn.Module):
    """Gated-Dconv FFN (Restormer GDFN; `MambaSISR6_arch.py:201-218`).

    Owns its conv parameters directly (identical tree to the previous
    Conv2d wrappers: `{project_in,dwconv,project_out}/conv/*`) so the
    fused residual-branch Pallas kernel (`ops/pallas_effn.py`) can consume
    them without materializing the hidden-channel intermediates in HBM.
    `__call__` is the standard composite; `fused_residual` is the kernel
    path (norm + GDFN + residual in one op) used by MamberBlock on TPU.
    """

    dim: int
    ffn_expansion_factor: float = 2.66
    use_bias: bool = False
    dtype: Any = None

    def setup(self):
        hidden = int(self.dim * self.ffn_expansion_factor)
        self.project_in = _ConvParams(
            hidden * 2, 1, self.dim, use_bias=self.use_bias)
        self.dwconv = _ConvParams(
            hidden * 2, 3, hidden * 2, groups=hidden * 2,
            use_bias=self.use_bias)
        self.project_out = _ConvParams(
            self.dim, 1, hidden, use_bias=self.use_bias)

    def __call__(self, x):
        x = self.project_in(x, self.dtype)
        x = self.dwconv(x, self.dtype)
        x1, x2 = jnp.split(x, 2, axis=-1)
        # exact-erf GELU: torch F.gelu's default, which the reference uses
        # (`MambaSISR6_arch.py:216`); flax's default is the tanh approx,
        # whose |err| reaches 4.7e-4 per activation — compounding over 33
        # blocks that sat inside the parity budget (VERDICT r4 weak #2)
        x = nn.gelu(x1, approximate=False) * x2
        return self.project_out(x, self.dtype)

    def fused_residual(self, x, ln_w, ln_b, eps=1e-5, interpret=False):
        """`x + GDFN(LayerNorm(x))` via the fused Pallas kernel. Caller
        must have checked `effn_fused_supported` and use_bias=False."""
        from ..ops.pallas_effn import gdfn_residual_fused

        k_in, _ = self.project_in.get()
        k_dw, _ = self.dwconv.get()
        k_out, _ = self.project_out.get()
        return gdfn_residual_fused(
            x, ln_w, ln_b, k_in[0, 0], k_dw[:, :, 0], k_out[0, 0],
            eps=eps, interpret=interpret)


class OverlapPatchEmbed(nn.Module):
    """3x3 conv patch embed (`MambaSISR6_arch.py:520-528`)."""

    embed_dim: int = 48
    use_bias: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        return Conv2d(self.embed_dim, 3, use_bias=self.use_bias,
                      dtype=self.dtype, name="proj")(x)


class Downsample(nn.Module):
    """conv(C -> C/2) + PixelUnshuffle(2): net C -> 2C at half resolution
    (`MambaSISR6_arch.py:533-541`)."""

    n_feat: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = Conv2d(self.n_feat // 2, 3, use_bias=False, dtype=self.dtype,
                   name="conv")(x)
        return pixel_unshuffle(x, 2)


class Upsample(nn.Module):
    """conv(C -> 2C) + PixelShuffle(2): net C -> C/2 at double resolution
    (`MambaSISR6_arch.py:543-551`)."""

    n_feat: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = Conv2d(self.n_feat * 2, 3, use_bias=False, dtype=self.dtype,
                   name="conv")(x)
        return pixel_shuffle(x, 2)


class Upsampler(nn.Module):
    """EDSR-style pixel-shuffle upsampling chain (`common.py:50-66`)."""

    scale: int
    n_feat: int
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        s = self.scale
        if (s & (s - 1)) == 0:  # power of two
            for i in range(int(math.log2(s))):
                x = Conv2d(4 * self.n_feat, 3, use_bias=self.use_bias,
                           dtype=self.dtype, name=f"conv{i}")(x)
                x = pixel_shuffle(x, 2)
        elif s == 3:
            x = Conv2d(9 * self.n_feat, 3, use_bias=self.use_bias,
                       dtype=self.dtype, name="conv0")(x)
            x = pixel_shuffle(x, 3)
        else:
            raise NotImplementedError(f"scale {s}")
        return x


def nearest_upsample(x: jax.Array, scale: int) -> jax.Array:
    """F.interpolate(mode='nearest') equivalent for NHWC."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(
        x[:, :, None, :, None, :], (b, h, scale, w, scale, c)
    )
    return x.reshape(b, h * scale, w * scale, c)


def bilinear_upsample_x2(x: jax.Array) -> jax.Array:
    """F.interpolate(scale_factor=2, mode='bilinear', align_corners=False)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")
