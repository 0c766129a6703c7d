"""Pixel shuffle / unshuffle in NHWC layout.

Channel ordering matches `torch.nn.PixelShuffle` semantics
(out[c, h*r+i, w*r+j] = in[c*r*r + i*r + j]) so that weights ported from the
reference checkpoints stay valid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """(B, H, W, C*r*r) -> (B, H*r, W*r, C)."""
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b h i w j c
    return x.reshape(b, h * r, w * r, c)


def pixel_unshuffle(x: jax.Array, r: int) -> jax.Array:
    """(B, H*r, W*r, C) -> (B, H, W, C*r*r)."""
    b, hr, wr, c = x.shape
    h, w = hr // r, wr // r
    x = x.reshape(b, h, r, w, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # b h w c i j
    return x.reshape(b, h, w, c * r * r)
