"""On-device degradation ops for blind-SR synthesis (JAX, static shapes).

TPU-native rebuild of the degradation primitives the reference pulls from
pip basicsr and runs on-GPU inside `feed_data`
(`/root/reference/RealSR/VmambaIR/models/MambaRealSRGAN_model.py:125-244`):
per-sample blur (`filter2D`), stochastic resize, Gaussian/Poisson noise,
JPEG compression (DiffJPEG), and the USM sharpener. Everything is jittable
with static shapes:

* stochastic resize uses `jax.image.scale_and_translate`, which accepts
  *traced* scale factors with a fixed output canvas — the down-then-up pair
  reproduces the reference's dynamic-size resize without shape polymorphism;
* interpolation mode randomness (area/bilinear/bicubic) is a `lax.switch`;
* JPEG runs the real (hard-round) pipeline — degradation synthesis is
  no-grad in the reference too (`torch.no_grad` in feed_data).

All images are NHWC float32 in [0, 1].
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------- filter2D


def filter2d(img: jax.Array, kernel: jax.Array) -> jax.Array:
    """Per-sample 2-D filtering: img (B,H,W,C), kernel (B,k,k) -> (B,H,W,C).

    Reflect padding, matching basicsr `filter2D`.
    """
    b, h, w, c = img.shape
    k = kernel.shape[-1]
    pad = k // 2
    imgp = jnp.pad(
        img, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect"
    )
    # fold batch into channels for a single grouped conv; batch-major
    # channel order must match the kernel layout below
    x = jnp.transpose(imgp, (1, 2, 0, 3)).reshape(
        1, h + 2 * pad, w + 2 * pad, b * c
    )
    # kernel (b, k, k) -> HWIO (k, k, 1, b*c), each channel gets its sample's
    # kernel (flipped: conv vs correlation — basicsr uses conv2d which is
    # cross-correlation in torch, so no flip)
    kern = jnp.repeat(kernel[:, None, :, :], c, axis=1)  # (b, c, k, k)
    kern = kern.reshape(b * c, k, k).transpose(1, 2, 0)[:, :, None, :]
    out = jax.lax.conv_general_dilated(
        x, kern, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=b * c,
    )
    return jnp.transpose(out.reshape(h, w, b, c), (2, 0, 1, 3))


# ---------------------------------------------------------------- USM sharp


def usm_sharp(img: jax.Array, weight: float = 0.5, radius: int = 50,
              threshold: float = 10.0) -> jax.Array:
    """Unsharp masking with a 0.8-sigma... actually Gaussian(radius) blur and
    a soft mask, matching basicsr `USMSharp` (radius 50 box -> gaussian
    kernel size 51, sigma 0; cv2 convention sigma = 0.3*((k-1)*0.5 - 1) + 0.8).
    """
    ksize = radius + 1 if radius % 2 == 0 else radius
    ksize = max(3, ksize if ksize % 2 == 1 else ksize + 1)
    sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    ax = jnp.arange(ksize) - ksize // 2
    g = jnp.exp(-(ax**2) / (2 * sigma**2))
    g = g / g.sum()
    kernel2d = jnp.outer(g, g)
    b = img.shape[0]
    blur = filter2d(img, jnp.broadcast_to(kernel2d, (b, ksize, ksize)))
    residual = img - blur
    mask = (jnp.abs(residual) * 255.0 > threshold).astype(img.dtype)
    soft_mask = filter2d(mask, jnp.broadcast_to(kernel2d, (b, ksize, ksize)))
    sharp = jnp.clip(img + weight * residual, 0.0, 1.0)
    return soft_mask * sharp + (1 - soft_mask) * img


# ----------------------------------------------------------------- resize


_METHODS = ("linear", "linear", "cubic")  # area~linear+antialias, bilinear,
# bicubic


def resize_to(img: jax.Array, out_hw: Tuple[int, int],
              method_idx: jax.Array) -> jax.Array:
    """Static-output resize with a traced interpolation-mode index
    (0=area-approx, 1=bilinear, 2=bicubic)."""
    b, h, w, c = img.shape
    oh, ow = out_hw

    def make(m, antialias):
        def f(x):
            return jax.image.resize(
                x, (b, oh, ow, c), method=m, antialias=antialias
            )
        return f

    return jax.lax.switch(
        method_idx, [make("linear", True), make("linear", False),
                     make("cubic", False)], img
    )


def random_resize(img: jax.Array, scale: jax.Array,
                  method_idx: jax.Array) -> jax.Array:
    """Resize by a *traced* continuous factor and back onto the same canvas.

    Emulates the reference's dynamic-size `F.interpolate(scale_factor=r)`
    (`MambaRealSRGAN_model.py:137-146`) with static shapes: the image is
    resampled at scale r into the fixed canvas (content occupying the
    top-left r-fraction), and the subsequent `random_resize_back` samples it
    back out. Frequency content matches the dynamic-shape pipeline.
    """
    b, h, w, c = img.shape

    def make(m):
        def f(x):
            return jax.image.scale_and_translate(
                x, (b, h, w, c), (1, 2),
                jnp.array([scale, scale]),
                jnp.zeros((2,)),
                method=m,
                antialias=True,
            )
        return f

    return jax.lax.switch(
        method_idx, [make("linear"), make("linear"), make("cubic")], img
    )


def random_resize_back(img: jax.Array, scale: jax.Array,
                       method_idx: jax.Array,
                       out_hw: Tuple[int, int]) -> jax.Array:
    """Inverse of `random_resize`: sample the top-left (scale*H, scale*W)
    region back up/down to a static output size."""
    b, h, w, c = img.shape
    oh, ow = out_hw
    eff = jnp.array([oh / (scale * h), ow / (scale * w)])

    def make(m):
        def f(x):
            return jax.image.scale_and_translate(
                x, (b, oh, ow, c), (1, 2), eff, jnp.zeros((2,)), method=m,
                antialias=True,
            )
        return f

    return jax.lax.switch(
        method_idx, [make("linear"), make("linear"), make("cubic")], img
    )


# ------------------------------------------------------------------ noise


def add_gaussian_noise(key, img, sigma, gray_prob_draw):
    """sigma: (B,) in [0,1] scale; gray_prob_draw: (B,) bool for grayscale
    noise (basicsr `random_add_gaussian_noise_pt` semantics)."""
    b, h, w, c = img.shape
    k1, k2 = jax.random.split(key)
    noise = jax.random.normal(k1, img.shape) * sigma[:, None, None, None]
    gray = jax.random.normal(k2, (b, h, w, 1)) * sigma[:, None, None, None]
    noise = jnp.where(gray_prob_draw[:, None, None, None], gray, noise)
    return jnp.clip(img + noise, 0.0, 1.0)


def _poisson_levels(img_q):
    """Per-image photon levels: 2^ceil(log2(#unique 8-bit values)) — the
    exact basicsr rule (`generate_poisson_noise_pt`: round to 255 levels,
    count unique values per sample). Unique counting is jit-hostile; a
    256-bin histogram of the quantized image gives the identical count with
    static shapes.

    img_q: (B, ...) integer-quantized image in [0, 255]. Returns (B,) fp32.
    """
    b = img_q.shape[0]
    hist = jax.vmap(
        lambda x: jnp.bincount(x.reshape(-1), length=256)
    )(img_q.reshape(b, -1))
    nuniq = jnp.sum(hist > 0, axis=1).astype(jnp.float32)
    return 2.0 ** jnp.ceil(jnp.log2(nuniq))


def _rgb_to_gray(img):
    # torchvision rgb_to_grayscale weights (basicsr's gray poisson path)
    w = jnp.asarray([0.299, 0.587, 0.114], img.dtype)
    return jnp.sum(img * w, axis=-1, keepdims=True)


def add_poisson_noise(key, img, scale, gray_prob_draw):
    """Poisson (shot) noise with the reference's per-image level rule
    (basicsr `random_add_poisson_noise_pt` / `generate_poisson_noise_pt`):
    quantize to 8-bit, levels = 2^ceil(log2(#unique values per image)),
    noise = poisson(q * levels)/levels - q. scale: (B,) noise strength."""
    k1, k2 = jax.random.split(key)
    img_c = jnp.clip((img * 255.0).round(), 0, 255) / 255.0
    vq = jnp.round(img_c * 255.0).astype(jnp.int32)
    vals = _poisson_levels(vq)[:, None, None, None]
    out = jax.random.poisson(k1, img_c * vals) / vals
    noise = out - img_c

    gray_img = jnp.clip(
        (_rgb_to_gray(img) * 255.0).round(), 0, 255
    ) / 255.0
    vals_g = _poisson_levels(
        jnp.round(gray_img * 255.0).astype(jnp.int32)
    )[:, None, None, None]
    out_g = jax.random.poisson(k2, gray_img * vals_g) / vals_g
    noise_g = jnp.broadcast_to(out_g - gray_img, img.shape)

    noise = jnp.where(gray_prob_draw[:, None, None, None], noise_g, noise)
    return jnp.clip(img + noise * scale[:, None, None, None], 0.0, 1.0)


# ------------------------------------------------------------------- JPEG


def _dct_matrix(n=8):
    k = np.arange(n)
    m = np.sqrt(2.0 / n) * np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi
                                  / (2 * n))
    m[0] = np.sqrt(1.0 / n)
    return jnp.asarray(m, jnp.float32)


_Y_TABLE = jnp.asarray(
    np.array([
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ], np.float32)
)
_C_TABLE = jnp.asarray(
    np.array([
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ], np.float32)
)


def _quality_factor(quality):
    """JPEG quality (1-100) -> quantization scale factor."""
    quality = jnp.asarray(quality, jnp.float32)
    return jnp.where(quality < 50, 5000.0 / quality, 200.0 - quality * 2.0) / 100.0


def _blockify(x, n=8):
    b, h, w = x.shape
    x = x.reshape(b, h // n, n, w // n, n)
    return x.transpose(0, 1, 3, 2, 4)  # (b, hb, wb, n, n)


def _unblockify(x, h, w, n=8):
    b = x.shape[0]
    return x.transpose(0, 1, 3, 2, 4).reshape(b, h, w)


def _rgb_to_ycbcr_jpeg(img):
    m = jnp.array([
        [0.299, 0.587, 0.114],
        [-0.168736, -0.331264, 0.5],
        [0.5, -0.418688, -0.081312],
    ]).T
    out = img @ m + jnp.array([0.0, 128.0 / 255.0, 128.0 / 255.0])
    return out


def _ycbcr_to_rgb_jpeg(img):
    m = jnp.array([
        [1.0, 0.0, 1.402],
        [1.0, -0.344136, -0.714136],
        [1.0, 1.772, 0.0],
    ]).T
    return (img - jnp.array([0.0, 128.0 / 255.0, 128.0 / 255.0])) @ m


def jpeg_compress(img: jax.Array, quality: jax.Array) -> jax.Array:
    """JPEG round-trip at per-sample quality (B,). img NHWC [0,1], H and W
    must be multiples of 16 (callers pad, like the reference pads to 16 via
    DiffJPEG padding). Hard rounding (no-grad synthesis path)."""
    b, h, w, c = img.shape
    assert h % 16 == 0 and w % 16 == 0, "pad to multiple of 16 before JPEG"
    factor = _quality_factor(quality)[:, None, None, None, None]  # (B,1,1,1,1)
    dct = _dct_matrix()

    ycc = _rgb_to_ycbcr_jpeg(img) * 255.0  # [0,255]
    y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
    # chroma 4:2:0 subsample (2x2 mean)
    cb_s = cb.reshape(b, h // 2, 2, w // 2, 2).mean(axis=(2, 4))
    cr_s = cr.reshape(b, h // 2, 2, w // 2, 2).mean(axis=(2, 4))

    def codec(chan, table):
        hh, ww = chan.shape[1:]
        blocks = _blockify(chan - 128.0)  # (b, hb, wb, 8, 8)
        coefs = jnp.einsum("ij,bhwjk,lk->bhwil", dct, blocks, dct)
        q = jnp.clip(jnp.floor(table * factor + 0.5), 1, 255)
        # q: (B,1,1,8,8) broadcast over blocks
        quant = jnp.round(coefs / q)
        deq = quant * q
        rec = jnp.einsum("ji,bhwjk,kl->bhwil", dct, deq, dct) + 128.0
        return _unblockify(rec, hh, ww)

    y_r = codec(y, _Y_TABLE)
    cb_r = codec(cb_s, _C_TABLE)
    cr_r = codec(cr_s, _C_TABLE)
    # chroma upsample (nearest 2x)
    cb_u = jnp.repeat(jnp.repeat(cb_r, 2, axis=1), 2, axis=2)
    cr_u = jnp.repeat(jnp.repeat(cr_r, 2, axis=1), 2, axis=2)
    ycc_r = jnp.stack([y_r, cb_u, cr_u], axis=-1) / 255.0
    out = _ycbcr_to_rgb_jpeg(ycc_r)
    return jnp.clip(out, 0.0, 1.0)


def pad_for_jpeg(img):
    b, h, w, c = img.shape
    ph = (16 - h % 16) % 16
    pw = (16 - w % 16) % 16
    if ph or pw:
        img = jnp.pad(img, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    return img, (h, w)


def jpeg_compress_padded(img, quality):
    padded, (h, w) = pad_for_jpeg(img)
    out = jpeg_compress(padded, quality)
    return out[:, :h, :w, :]
