"""Selective scan (Mamba S6 recurrence) — TPU-native implementations.

The recurrence (per batch b, channel d, state n, over sequence position t):

    delta = softplus(delta_raw + delta_bias)            (optional)
    h_t   = exp(delta_t * A) * h_{t-1} + delta_t * B_t * u_t
    y_t   = sum_n C_t[n] * h_t[n] + D * u_t             (D skip optional)

Semantics match the CUDA kernels of the reference
(`/root/reference/Mamba/kernels/selective_scan/cus/selective_scan_fwd_kernel.cuh:102-171`
and the pure-PyTorch reference `test_selective_scan.py:168-234`), with a
TPU-native channels-LAST layout:

    u, delta : (batch, L, D)          activations; fp32/bf16
    A        : (D, N)                 fp32, negative (A = -exp(A_log))
    B, C     : (batch, L, G, N)       G groups, D % G == 0
    D_skip   : (D,)                   fp32
    delta_bias : (D,)                 fp32

Three implementations:

* ``selective_scan_seq``   — `lax.scan` over L, one step at a time. The
  correctness gold standard (mirrors the sequential torch reference).
* ``selective_scan_xla``   — chunked: `lax.scan` over chunks of L with a
  `lax.associative_scan` inside each chunk. Work-efficient, static shapes,
  autodiff-friendly (chunk bodies are rematerialized, reproducing the
  reference's save-only-chunk-carries memory strategy,
  `selective_scan.cpp:217-220`).
* ``selective_scan`` (in `pallas_scan.py`) — Pallas TPU kernel forward with a
  custom VJP; falls back to the XLA implementation off-TPU.

All math is performed in float32 regardless of input dtype (the reference
keeps weights fp32 and scans in fp32: `selective_scan.cpp:14,167-168`); the
output is cast back to the input dtype.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _prep(u, delta, A, B, C, D, delta_bias, delta_softplus):
    """Common validation + fp32 casting. Returns fp32 views and shapes."""
    batch, L, dim = u.shape
    d_a, N = A.shape
    if d_a != dim:
        raise ValueError(f"A dim {d_a} != u dim {dim}")
    if B.ndim != 4 or C.ndim != 4:
        raise ValueError("B and C must be (batch, L, G, N)")
    G = B.shape[2]
    if dim % G != 0:
        raise ValueError(f"dim {dim} not divisible by groups {G}")
    uf = u.astype(jnp.float32)
    df = delta.astype(jnp.float32)
    if delta_bias is not None:
        df = df + delta_bias.astype(jnp.float32)
    if delta_softplus:
        df = jax.nn.softplus(df)
    return (
        uf,
        df,
        A.astype(jnp.float32),
        B.astype(jnp.float32),
        C.astype(jnp.float32),
        None if D is None else D.astype(jnp.float32),
        (batch, L, dim, N, G),
    )


def selective_scan_seq(
    u: jax.Array,
    delta: jax.Array,
    A: jax.Array,
    B: jax.Array,
    C: jax.Array,
    D: Optional[jax.Array] = None,
    delta_bias: Optional[jax.Array] = None,
    delta_softplus: bool = False,
    return_last_state: bool = False,
    h0: Optional[jax.Array] = None,
):
    """Sequential reference implementation (`lax.scan` over L).

    h0: optional initial state (batch, dim, N) — used by the
    sequence-parallel wrapper to resume from an upstream shard's carry."""
    uf, df, Af, Bf, Cf, Df, (batch, L, dim, N, G) = _prep(
        u, delta, A, B, C, D, delta_bias, delta_softplus
    )
    dg = dim // G
    # (L, batch, ...) for lax.scan
    u_t = jnp.moveaxis(uf, 1, 0)  # (L, batch, D)
    d_t = jnp.moveaxis(df, 1, 0)
    B_t = jnp.moveaxis(Bf, 1, 0)  # (L, batch, G, N)
    C_t = jnp.moveaxis(Cf, 1, 0)

    if h0 is None:
        h0 = jnp.zeros((batch, dim, N), jnp.float32)
    else:
        h0 = h0.astype(jnp.float32)

    def step(h, inp):
        ut, dt, Bt, Ct = inp
        # dA: (batch, D, N); dBu: (batch, D, N)
        dA = jnp.exp(dt[..., None] * Af)
        Bt_d = jnp.repeat(Bt, dg, axis=1)  # (batch, D, N)
        Ct_d = jnp.repeat(Ct, dg, axis=1)
        h = dA * h + (dt * ut)[..., None] * Bt_d
        y = jnp.sum(h * Ct_d, axis=-1)  # (batch, D)
        return h, y

    h_last, ys = jax.lax.scan(step, h0, (u_t, d_t, B_t, C_t))
    y = jnp.moveaxis(ys, 0, 1)  # (batch, L, D)
    if Df is not None:
        y = y + uf * Df
    y = y.astype(u.dtype)
    if return_last_state:
        return y, h_last
    return y


def _hillis_scan(da, b, axis=1):
    """Inclusive scan of (a, b) pairs via explicit Hillis-Steele doubling.

    Same math as `lax.associative_scan` with the combine
    (aL,bL),(aR,bR) -> (aL*aR, aR*bL + bR), but written as plain
    pad/slice/multiply ops: the associative_scan lowering's TRANSPOSE
    (backward pass) crashes the XLA:TPU compiler at the trainer's shapes
    (fusion_util.cc TransformWindow check failure); this formulation
    differentiates through ordinary ops. Requires a power-of-two axis size.
    """
    n = da.shape[axis]
    assert (n & (n - 1)) == 0, "chunk must be a power of two"
    aa, bb = da, b
    k = 1
    while k < n:
        a_prev = jax.lax.slice_in_dim(aa, 0, n - k, axis=axis)
        b_prev = jax.lax.slice_in_dim(bb, 0, n - k, axis=axis)
        a_keep = jax.lax.slice_in_dim(aa, 0, k, axis=axis)
        b_keep = jax.lax.slice_in_dim(bb, 0, k, axis=axis)
        a_tail = jax.lax.slice_in_dim(aa, k, n, axis=axis)
        b_tail = jax.lax.slice_in_dim(bb, k, n, axis=axis)
        bb = jnp.concatenate(
            [b_keep, a_tail * b_prev + b_tail], axis=axis)
        aa = jnp.concatenate([a_keep, a_tail * a_prev], axis=axis)
        k *= 2
    return aa, bb


def _chunk_body(Af, dg, h, u_c, d_c, B_c, C_c):
    """One chunk of the chunked scan.

    h: (batch, D, N) carry; u_c/d_c: (batch, Ck, D); B_c/C_c: (batch, Ck, G, N).
    Returns (h_next, y_c (batch, Ck, D)).
    """
    batch, Ck, dim = u_c.shape
    N = Af.shape[1]
    G = B_c.shape[2]
    # a_t = exp(delta_t * A): (batch, Ck, D, N)
    da = jnp.exp(d_c[..., None] * Af)
    x = (d_c * u_c).reshape(batch, Ck, G, dg)
    b = (B_c[..., None, :] * x[..., None]).reshape(batch, Ck, dim, N)
    aa, bb = _hillis_scan(da, b, axis=1)
    h_all = aa * h[:, None] + bb  # (batch, Ck, D, N)
    y = jnp.einsum(
        "blgn,blgdn->blgd",
        C_c,
        h_all.reshape(batch, Ck, G, dg, N),
        preferred_element_type=jnp.float32,
    ).reshape(batch, Ck, dim)
    return h_all[:, -1], y


def selective_scan_xla(
    u: jax.Array,
    delta: jax.Array,
    A: jax.Array,
    B: jax.Array,
    C: jax.Array,
    D: Optional[jax.Array] = None,
    delta_bias: Optional[jax.Array] = None,
    delta_softplus: bool = False,
    return_last_state: bool = False,
    chunk_size: int = 64,
    h0: Optional[jax.Array] = None,
):
    """Chunked scan: `lax.scan` over L/chunk chunks, associative scan inside.

    Chunk bodies are checkpointed so the backward pass recomputes per-chunk
    intermediates from the carried states — the same memory/recompute
    trade-off as the reference CUDA backward
    (`cus/selective_scan_bwd_kernel.cuh:119-125`).
    """
    uf, df, Af, Bf, Cf, Df, (batch, L, dim, N, G) = _prep(
        u, delta, A, B, C, D, delta_bias, delta_softplus
    )
    dg = dim // G
    Ck = min(chunk_size, L)
    Ck = 1 << (Ck.bit_length() - 1)  # _hillis_scan needs a power of two
    if L % Ck != 0:
        # pad L to a multiple of the chunk (a=1 ~ exp(0*A)=handled via delta=0)
        pad = Ck - L % Ck
        uf = jnp.pad(uf, ((0, 0), (0, pad), (0, 0)))
        df = jnp.pad(df, ((0, 0), (0, pad), (0, 0)))
        Bf = jnp.pad(Bf, ((0, 0), (0, pad), (0, 0), (0, 0)))
        Cf = jnp.pad(Cf, ((0, 0), (0, pad), (0, 0), (0, 0)))
    Lp = uf.shape[1]
    nc = Lp // Ck

    u_ch = jnp.moveaxis(uf.reshape(batch, nc, Ck, dim), 1, 0)
    d_ch = jnp.moveaxis(df.reshape(batch, nc, Ck, dim), 1, 0)
    B_ch = jnp.moveaxis(Bf.reshape(batch, nc, Ck, G, N), 1, 0)
    C_ch = jnp.moveaxis(Cf.reshape(batch, nc, Ck, G, N), 1, 0)

    body = functools.partial(_chunk_body, Af, dg)

    @jax.checkpoint
    def scan_step(h, inp):
        u_c, d_c, B_c, C_c = inp
        return body(h, u_c, d_c, B_c, C_c)

    if h0 is None:
        h0 = jnp.zeros((batch, dim, N), jnp.float32)
    else:
        h0 = h0.astype(jnp.float32)
    h_last, y_ch = jax.lax.scan(scan_step, h0, (u_ch, d_ch, B_ch, C_ch))
    y = jnp.moveaxis(y_ch, 0, 1).reshape(batch, Lp, dim)[:, :L]
    if Df is not None:
        y = y + uf[:, :L] * Df
    y = y.astype(u.dtype)
    if return_last_state:
        return y, h_last
    return y


def selective_scan_flops(batch: int, L: int, dim: int, N: int, with_D: bool = True) -> int:
    """FLOPs model matching the reference accounting
    (`MambaSISR6_arch.py:101-122`): 9*B*L*D*N (+ B*D*L for the D skip)."""
    flops = 9 * batch * L * dim * N
    if with_D:
        flops += batch * dim * L
    return flops
