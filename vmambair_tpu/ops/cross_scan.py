"""Omni/cross scan direction construction and merging (NHWC).

The reference builds 4 spatial scan directions — row-major, column-major,
and both reversed — as a custom autograd op (`MambaRealSR11_arch.py:325-368`)
or inline tensor ops (`MambaSISR6_arch.py:401-404,427-430`). On TPU these are
pure reshapes/transposes/flips that XLA differentiates and fuses natively, so
no custom VJP is needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_scan_2d(x: jax.Array) -> jax.Array:
    """(B, H, W, D) -> (B, 4, L, D): [row-major, col-major, both reversed].

    Direction order matches `cross_scan_2d` in the reference
    (`MambaSISR6_arch.py:401-404`).
    """
    b, h, w, d = x.shape
    hw = x.reshape(b, h * w, d)
    wh = jnp.swapaxes(x, 1, 2).reshape(b, h * w, d)
    fwd = jnp.stack([hw, wh], axis=1)  # (B, 2, L, D)
    return jnp.concatenate([fwd, jnp.flip(fwd, axis=2)], axis=1)


def cross_merge_2d(ys: jax.Array, h: int, w: int) -> jax.Array:
    """(B, 4, L, D) -> (B, L, D): sum of inverse-transformed direction outputs.

    Matches the reference merge (`MambaSISR6_arch.py:427-430`): directions 2,3
    are un-flipped, then directions 1 and (un-flipped) 3 are un-transposed.
    """
    b, k, l, d = ys.shape
    assert k == 4 and l == h * w
    inv = jnp.flip(ys[:, 2:4], axis=2)  # un-flip reversed dirs
    y0 = ys[:, 0]
    y1 = jnp.swapaxes(ys[:, 1].reshape(b, w, h, d), 1, 2).reshape(b, l, d)
    y2 = inv[:, 0]
    y3 = jnp.swapaxes(inv[:, 1].reshape(b, w, h, d), 1, 2).reshape(b, l, d)
    return y0 + y1 + y2 + y3
