#!/usr/bin/env python
"""Scan-kernel variant race on the real chip.

Each variant is a (D, L)-layout selective-scan forward with the same
signature as `_scan_kernel` in vmambair_tpu/ops/pallas_scan.py. Parity is
checked against selective_scan_xla before timing.

Usage: python tools/kvariants.py [v0 v1_128 v3 ...]
"""

import argparse
import functools
import json
import math
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, L, D, G, N = 8, 16384, 96, 2, 16  # hot level-1 decoder shape
DIM = G * D
CHUNK = 1024
ITERS = 9
REPEATS = 3

# VMAMBAIR_KV_INTERPRET=1: tiny shapes + Pallas interpreter (CPU parity
# check of a new variant before burning chip time)
import os as _os  # noqa: E402

if _os.environ.get("VMAMBAIR_KV_INTERPRET"):
    B, L, CHUNK = 2, 512, 256
    ITERS, REPEATS = 2, 1
INTERPRET = bool(_os.environ.get("VMAMBAIR_KV_INTERPRET"))


def _softplus(x):
    return jnp.where(x > 20.0, x, jnp.log1p(jnp.exp(jnp.minimum(x, 20.0))))


def _prologue(u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref):
    d = d_ref[0].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)
    d = _softplus(d)
    u = u_ref[0].astype(jnp.float32)
    du = d * u
    y0 = Dskip_ref[...].astype(jnp.float32) * u
    B_blk = B_ref[0, 0].astype(jnp.float32)
    C_blk = C_ref[0, 0].astype(jnp.float32)
    A_t = A_ref[...].astype(jnp.float32)
    return d, du, y0, B_blk, C_blk, A_t


# ---------------------------------------------------------------- variants

def kernel_v0(u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref,
              y_ref, h_ref, *, nstate, chunk):
    """Round-1 kernel: full-chunk Hillis-Steele on (a,b) pairs."""
    c_idx = pl.program_id(2)

    @pl.when(c_idx == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)

    d, du, y, B_blk, C_blk, A_t = _prologue(
        u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref)
    dt = d.shape[0]
    a = jnp.exp(d[None] * A_t)
    b = du[None] * B_blk[:, None, :]
    for s in range(int(math.log2(chunk))):
        k = 1 << s
        ident_a = jnp.ones((nstate, dt, k), jnp.float32)
        ident_b = jnp.zeros((nstate, dt, k), jnp.float32)
        a_prev = jnp.concatenate([ident_a, a[:, :, :-k]], axis=2)
        b_prev = jnp.concatenate([ident_b, b[:, :, :-k]], axis=2)
        b = a * b_prev + b
        a = a * a_prev
    h0 = h_ref[...].astype(jnp.float32)
    h_all = a * h0 + b
    y = y + jnp.sum(C_blk[:, None, :] * h_all, axis=0)
    h_ref[...] = h_all[:, :, chunk - 1 : chunk]
    y_ref[0] = y.astype(y_ref.dtype)


def kernel_v1(u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref,
              y_ref, h_ref, *, nstate, chunk, sub):
    """Subchunk-sequential: Hillis within `sub`-lane subchunks, sequential
    carry across subchunks inside the body (python-unrolled)."""
    c_idx = pl.program_id(2)

    @pl.when(c_idx == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)

    d, du, y, B_blk, C_blk, A_t = _prologue(
        u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref)
    dt = d.shape[0]
    a = jnp.exp(d[None] * A_t)
    b = du[None] * B_blk[:, None, :]
    carry = h_ref[...].astype(jnp.float32)  # (N, Dt, 1)
    hs = []
    for i in range(chunk // sub):
        sl = slice(i * sub, (i + 1) * sub)
        a_i, b_i = a[:, :, sl], b[:, :, sl]
        for s in range(int(math.log2(sub))):
            k = 1 << s
            ident_a = jnp.ones((nstate, dt, k), jnp.float32)
            ident_b = jnp.zeros((nstate, dt, k), jnp.float32)
            a_prev = jnp.concatenate([ident_a, a_i[:, :, :-k]], axis=2)
            b_prev = jnp.concatenate([ident_b, b_i[:, :, :-k]], axis=2)
            b_i = a_i * b_prev + b_i
            a_i = a_i * a_prev
        h_i = a_i * carry + b_i
        carry = h_i[:, :, -1:]
        hs.append(h_i)
    h_all = jnp.concatenate(hs, axis=2)
    y = y + jnp.sum(C_blk[:, None, :] * h_all, axis=0)
    h_ref[...] = carry
    y_ref[0] = y.astype(y_ref.dtype)


def kernel_v3(u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref,
              y_ref, h_ref, *, nstate, chunk):
    """bf16 (a, b) stacks (fp32 carry + prologue/epilogue)."""
    c_idx = pl.program_id(2)

    @pl.when(c_idx == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)

    d, du, y, B_blk, C_blk, A_t = _prologue(
        u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref)
    dt = d.shape[0]
    a = jnp.exp(d[None] * A_t).astype(jnp.bfloat16)
    b = (du[None] * B_blk[:, None, :]).astype(jnp.bfloat16)
    for s in range(int(math.log2(chunk))):
        k = 1 << s
        ident_a = jnp.ones((nstate, dt, k), jnp.bfloat16)
        ident_b = jnp.zeros((nstate, dt, k), jnp.bfloat16)
        a_prev = jnp.concatenate([ident_a, a[:, :, :-k]], axis=2)
        b_prev = jnp.concatenate([ident_b, b[:, :, :-k]], axis=2)
        b = a * b_prev + b
        a = a * a_prev
    h0 = h_ref[...].astype(jnp.float32)
    h_all = a.astype(jnp.float32) * h0 + b.astype(jnp.float32)
    y = y + jnp.sum(C_blk[:, None, :] * h_all, axis=0)
    h_ref[...] = h_all[:, :, chunk - 1 : chunk]
    y_ref[0] = y.astype(y_ref.dtype)


def kernel_v4(u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref,
              y_ref, h_ref, *, nstate, chunk, sub):
    """Cumsum formulation within subchunks: P = exp(A cumsum d); w-scan is a
    plain cumulative sum. Sequential (P_edge, h) carry across subchunks."""
    c_idx = pl.program_id(2)

    @pl.when(c_idx == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)

    d, du, y, B_blk, C_blk, A_t = _prologue(
        u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref)
    dt = d.shape[0]
    duB = du[None] * B_blk[:, None, :]  # (N, Dt, chunk)
    carry = h_ref[...].astype(jnp.float32)
    hs = []
    for i in range(chunk // sub):
        sl = slice(i * sub, (i + 1) * sub)
        d_i = d[:, sl]
        # cumsum of d within subchunk: Hillis on (Dt, sub) -- N-fold cheaper
        s_i = d_i
        for s in range(int(math.log2(sub))):
            k = 1 << s
            s_i = s_i + jnp.concatenate(
                [jnp.zeros((dt, k), jnp.float32), s_i[:, :-k]], axis=1)
        E = A_t * s_i[None]              # (N, Dt, sub), <= 0 + noise
        P = jnp.exp(E)
        c_i = duB[:, :, sl] * jnp.exp(-E)
        # cumulative sum of c_i along lanes
        w = c_i
        for s in range(int(math.log2(sub))):
            k = 1 << s
            w = w + jnp.concatenate(
                [jnp.zeros((nstate, dt, k), jnp.float32), w[:, :, :-k]],
                axis=2)
        h_i = P * (w + carry)
        carry = h_i[:, :, -1:]
        hs.append(h_i)
    h_all = jnp.concatenate(hs, axis=2)
    y = y + jnp.sum(C_blk[:, None, :] * h_all, axis=0)
    h_ref[...] = carry
    y_ref[0] = y.astype(y_ref.dtype)


def kernel_v6(u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref,
              y_ref, h_ref, *, nstate, chunk):
    """roll + iota-mask shifts instead of concat."""
    c_idx = pl.program_id(2)

    @pl.when(c_idx == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)

    d, du, y, B_blk, C_blk, A_t = _prologue(
        u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref)
    dt = d.shape[0]
    a = jnp.exp(d[None] * A_t)
    b = du[None] * B_blk[:, None, :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, dt, chunk), 2)
    for s in range(int(math.log2(chunk))):
        k = 1 << s
        m = lane >= k
        a_prev = jnp.where(m, pltpu.roll(a, k, axis=2), 1.0)
        b_prev = jnp.where(m, pltpu.roll(b, k, axis=2), 0.0)
        b = a * b_prev + b
        a = a * a_prev
    h0 = h_ref[...].astype(jnp.float32)
    h_all = a * h0 + b
    y = y + jnp.sum(C_blk[:, None, :] * h_all, axis=0)
    h_ref[...] = h_all[:, :, chunk - 1 : chunk]
    y_ref[0] = y.astype(y_ref.dtype)


def kernel_v8(u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref,
              y_ref, h_ref, *, nstate, chunk):
    """Log-domain a-chain: maintain window sums of delta (shared across N,
    N-fold cheaper than the a-stack) and exponentiate in the combine.
    exp(A * window-sum) is always in (0, 1] -- exact and overflow-safe."""
    c_idx = pl.program_id(2)

    @pl.when(c_idx == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)

    d, du, y, B_blk, C_blk, A_t = _prologue(
        u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref)
    dt = d.shape[0]
    b = du[None] * B_blk[:, None, :]
    sd = d  # (Dt, chunk) window-1 sums
    for s in range(int(math.log2(chunk))):
        k = 1 << s
        e = jnp.exp(A_t * sd[None])  # a_k, in (0, 1]
        b_prev = jnp.concatenate(
            [jnp.zeros((nstate, dt, k), jnp.float32), b[:, :, :-k]], axis=2)
        b = e * b_prev + b
        # double the window (clipped at chunk start -> cumsum at the end)
        sd = sd + jnp.concatenate(
            [jnp.zeros((dt, k), jnp.float32), sd[:, :-k]], axis=1)
    P = jnp.exp(A_t * sd[None])  # full prefix products (window clipped)
    h0 = h_ref[...].astype(jnp.float32)
    h_all = P * h0 + b
    y = y + jnp.sum(C_blk[:, None, :] * h_all, axis=0)
    h_ref[...] = h_all[:, :, chunk - 1 : chunk]
    y_ref[0] = y.astype(y_ref.dtype)


def kernel_v8s(u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref,
               y_ref, h_ref, *, nstate, chunk, sub):
    """v8 within `sub`-lane subchunks + sequential carry across subchunks."""
    c_idx = pl.program_id(2)

    @pl.when(c_idx == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)

    d, du, y, B_blk, C_blk, A_t = _prologue(
        u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref)
    dt = d.shape[0]
    b_full = du[None] * B_blk[:, None, :]
    carry = h_ref[...].astype(jnp.float32)
    hs = []
    for i in range(chunk // sub):
        sl = slice(i * sub, (i + 1) * sub)
        b = b_full[:, :, sl]
        sd = d[:, sl]
        for s in range(int(math.log2(sub))):
            k = 1 << s
            e = jnp.exp(A_t * sd[None])
            b_prev = jnp.concatenate(
                [jnp.zeros((nstate, dt, k), jnp.float32), b[:, :, :-k]],
                axis=2)
            b = e * b_prev + b
            sd = sd + jnp.concatenate(
                [jnp.zeros((dt, k), jnp.float32), sd[:, :-k]], axis=1)
        P = jnp.exp(A_t * sd[None])
        h_i = P * carry + b
        carry = h_i[:, :, -1:]
        hs.append(h_i)
    h_all = jnp.concatenate(hs, axis=2)
    y = y + jnp.sum(C_blk[:, None, :] * h_all, axis=0)
    h_ref[...] = carry
    y_ref[0] = y.astype(y_ref.dtype)


def kernel_v9(u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref,
              y_ref, h_ref, b0_ref, b1_ref, *, nstate, chunk):
    """v8 + ping-pong VMEM scratch for the b-stack (no concat temps)."""
    c_idx = pl.program_id(2)

    @pl.when(c_idx == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)

    d, du, y, B_blk, C_blk, A_t = _prologue(
        u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref)
    b0_ref[...] = du[None] * B_blk[:, None, :]
    sd = d
    dt = d.shape[0]
    src, dst = b0_ref, b1_ref
    for s in range(int(math.log2(chunk))):
        k = 1 << s
        e = jnp.exp(A_t * sd[None])
        dst[:, :, k:] = e[:, :, k:] * src[:, :, :-k] + src[:, :, k:]
        dst[:, :, :k] = src[:, :, :k]
        sd = sd + jnp.concatenate(
            [jnp.zeros((dt, k), jnp.float32), sd[:, :-k]], axis=1)
        src, dst = dst, src
    P = jnp.exp(A_t * sd[None])
    h0 = h_ref[...].astype(jnp.float32)
    h_all = P * h0 + src[...]
    y = y + jnp.sum(C_blk[:, None, :] * h_all, axis=0)
    h_ref[...] = h_all[:, :, chunk - 1 : chunk]
    y_ref[0] = y.astype(y_ref.dtype)


def kernel_v10(u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref,
               y_ref, h_ref, *, nstate, chunk, sub):
    """v8s with bf16 b-stack (e stays fp32-exact; carry fp32)."""
    c_idx = pl.program_id(2)

    @pl.when(c_idx == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)

    d, du, y, B_blk, C_blk, A_t = _prologue(
        u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref)
    dt = d.shape[0]
    b_full = (du[None] * B_blk[:, None, :]).astype(jnp.bfloat16)
    carry = h_ref[...].astype(jnp.float32)
    hs = []
    for i in range(chunk // sub):
        sl = slice(i * sub, (i + 1) * sub)
        b = b_full[:, :, sl]
        sd = d[:, sl]
        for s in range(int(math.log2(sub))):
            k = 1 << s
            e = jnp.exp(A_t * sd[None]).astype(jnp.bfloat16)
            b_prev = jnp.concatenate(
                [jnp.zeros((nstate, dt, k), jnp.bfloat16), b[:, :, :-k]],
                axis=2)
            b = e * b_prev + b
            sd = sd + jnp.concatenate(
                [jnp.zeros((dt, k), jnp.float32), sd[:, :-k]], axis=1)
        P = jnp.exp(A_t * sd[None])
        h_i = P * carry + b.astype(jnp.float32)
        carry = h_i[:, :, -1:]
        hs.append(h_i)
    h_all = jnp.concatenate(hs, axis=2)
    y = y + jnp.sum(C_blk[:, None, :] * h_all, axis=0)
    h_ref[...] = carry
    y_ref[0] = y.astype(y_ref.dtype)


def kernel_v11(u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref,
               y_ref, h_ref, *, nstate, chunk, sub):
    """v8s + tail-region ops: positions < k are unchanged at step k, so the
    exp/fma run on the [k:] slice only (~14% less VPU work in theory)."""
    c_idx = pl.program_id(2)

    @pl.when(c_idx == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)

    d, du, y, B_blk, C_blk, A_t = _prologue(
        u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref)
    dt = d.shape[0]
    b_full = du[None] * B_blk[:, None, :]
    carry = h_ref[...].astype(jnp.float32)
    hs = []
    for i in range(chunk // sub):
        sl = slice(i * sub, (i + 1) * sub)
        b = b_full[:, :, sl]
        sd = d[:, sl]
        for s in range(int(math.log2(sub))):
            k = 1 << s
            sd_t = sd[:, k:]
            e_t = jnp.exp(A_t * sd_t[None])
            b = jnp.concatenate(
                [b[:, :, :k], e_t * b[:, :, :-k] + b[:, :, k:]], axis=2)
            sd = jnp.concatenate(
                [sd[:, :k], sd_t + sd[:, :-k]], axis=1)
        P = jnp.exp(A_t * sd[None])
        h_i = P * carry + b
        carry = h_i[:, :, -1:]
        hs.append(h_i)
    h_all = jnp.concatenate(hs, axis=2)
    y = y + jnp.sum(C_blk[:, None, :] * h_all, axis=0)
    h_ref[...] = carry
    y_ref[0] = y.astype(y_ref.dtype)


def kernel_v12_ld(u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref,
                  y_ref, h_ref, *, nstate, chunk, sub):
    """Log-domain algorithm in CHANNELS-LAST layout: u/d/y (1, chunk, Dt),
    scan along the SUBLANE axis. B/C arrive as (1, 1, N, chunk, 1);
    A (N, 1, Dt); h scratch (N, 8, Dt) (sublane-1 scratch aborts Mosaic).
    Retests the round-1 '2.3x slower' claim under the new op mix."""
    c_idx = pl.program_id(2)

    @pl.when(c_idx == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)

    d = d_ref[0].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)
    d = _softplus(d)
    u = u_ref[0].astype(jnp.float32)          # (chunk, Dt)
    du = d * u
    y = Dskip_ref[...].astype(jnp.float32) * u
    B_blk = B_ref[0, 0].astype(jnp.float32)   # (N, chunk, 1)
    C_blk = C_ref[0, 0].astype(jnp.float32)
    A_t = A_ref[...].astype(jnp.float32)      # (N, 1, Dt)
    dt = u.shape[1]

    b_full = du[None] * B_blk                 # (N, chunk, Dt)
    hv = h_ref[...].astype(jnp.float32)
    carry = hv[:, 7:8, :]                     # (N, 1, Dt)
    hs = []
    for i in range(chunk // sub):
        sl = slice(i * sub, (i + 1) * sub)
        b = b_full[:, sl, :]
        sd = d[sl, :]
        for s in range(int(math.log2(sub))):
            k = 1 << s
            e = jnp.exp(A_t * sd[None])
            b_prev = jnp.concatenate(
                [jnp.zeros((nstate, k, dt), jnp.float32), b[:, :-k, :]],
                axis=1)
            b = e * b_prev + b
            sd = sd + jnp.concatenate(
                [jnp.zeros((k, dt), jnp.float32), sd[:-k, :]], axis=0)
        P = jnp.exp(A_t * sd[None])
        h_i = P * carry + b
        carry = h_i[:, -1:, :]
        hs.append(h_i)
    h_all = jnp.concatenate(hs, axis=1)
    y = y + jnp.sum(C_blk * h_all, axis=0)
    h_ref[...] = jnp.broadcast_to(carry, (nstate, 8, dt))
    y_ref[0] = y.astype(y_ref.dtype)


LOG2E = 1.4426950408889634


def kernel_v13(u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref,
               y_ref, h_ref, *, nstate, chunk, sub, exp2=False):
    """v8s with the subchunk carry FOLDED into b[0]: the h_{-1} contribution
    enters the scan as b0 += exp(A*d0)*carry (narrow (N,Dt,1) ops), which
    eliminates the full-width P*carry combine (exp-mul + exp + FMA) per
    subchunk; the final sd update of each subchunk (which only fed P) is
    also dropped.  exp2=True additionally pre-scales A by log2(e) and uses
    exp2 in the step combine."""
    c_idx = pl.program_id(2)

    @pl.when(c_idx == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)

    d, du, y, B_blk, C_blk, A_t = _prologue(
        u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref)
    dt = d.shape[0]
    exp = jnp.exp2 if exp2 else jnp.exp
    if exp2:
        A_t = A_t * LOG2E
    b_full = du[None] * B_blk[:, None, :]
    carry = h_ref[...].astype(jnp.float32)
    n_steps = int(math.log2(sub))
    hs = []
    for i in range(chunk // sub):
        lo, hi = i * sub, (i + 1) * sub
        d0 = d[:, lo : lo + 1]                       # (Dt, 1)
        b0 = b_full[:, :, lo : lo + 1] + exp(A_t * d0[None]) * carry
        b = jnp.concatenate([b0, b_full[:, :, lo + 1 : hi]], axis=2)
        sd = d[:, lo:hi]
        for s in range(n_steps):
            k = 1 << s
            e = exp(A_t * sd[None])
            b_prev = jnp.concatenate(
                [jnp.zeros((nstate, dt, k), jnp.float32), b[:, :, :-k]],
                axis=2)
            b = e * b_prev + b
            if s < n_steps - 1:
                sd = sd + jnp.concatenate(
                    [jnp.zeros((dt, k), jnp.float32), sd[:, :-k]], axis=1)
        carry = b[:, :, -1:]
        hs.append(b)
    h_all = jnp.concatenate(hs, axis=2)
    y = y + jnp.sum(C_blk[:, None, :] * h_all, axis=0)
    h_ref[...] = carry
    y_ref[0] = y.astype(y_ref.dtype)


def kernel_v19(u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref,
               y_ref, h_ref, *, nstate, chunk, sub):
    """v13_fold_exp2 with a multiplicatively-CARRIED decay array: ONE
    exp2 per element at init (E = exp2(A*log2e*d)), then the per-step
    window doubling is E = E * shift(E) — no per-step transcendental.
    E underflows to 0 for long windows, which is the correct decay value.
    The subchunk-carry fold reuses E's first column (drops the narrow
    exp2 too).

    MEASURED (v5e, hot shape): 17.30 ms vs production v13_fold_exp2
    13.49 ms — REJECTED. The E-update (full-width mul + shift per step)
    costs more VPU issue slots than the per-step exp2 it removes, and
    doubles the live fp32 working set. Confirms the kernel is
    issue/access-bound, not transcendental-bound."""
    c_idx = pl.program_id(2)

    @pl.when(c_idx == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)

    d, du, y, B_blk, C_blk, A_t = _prologue(
        u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref)
    dt = d.shape[0]
    A2 = A_t * LOG2E
    b_full = du[None] * B_blk[:, None, :]
    E_full = jnp.exp2(A2 * d[None])              # (nb, Dt, chunk)
    carry = h_ref[...].astype(jnp.float32)
    n_steps = int(math.log2(sub))
    hs = []
    for i in range(chunk // sub):
        lo, hi = i * sub, (i + 1) * sub
        b0 = b_full[:, :, lo : lo + 1] + E_full[:, :, lo : lo + 1] * carry
        b = jnp.concatenate([b0, b_full[:, :, lo + 1 : hi]], axis=2)
        E = E_full[:, :, lo:hi]
        for s in range(n_steps):
            k = 1 << s
            zb = jnp.zeros((nstate, dt, k), jnp.float32)
            b = E * jnp.concatenate([zb, b[:, :, :-k]], axis=2) + b
            if s < n_steps - 1:
                E = E * jnp.concatenate([zb, E[:, :, :-k]], axis=2)
        carry = b[:, :, -1:]
        hs.append(b)
    h_all = jnp.concatenate(hs, axis=2)
    y = y + jnp.sum(C_blk[:, None, :] * h_all, axis=0)
    h_ref[...] = carry
    y_ref[0] = y.astype(y_ref.dtype)


def kernel_v14(u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref,
               y_ref, h_ref, *, nstate, chunk, sub):
    """v8s with exp2 + pre-scaled A (saves the inner scale mul if the HW
    exp lowers via exp2)."""
    c_idx = pl.program_id(2)

    @pl.when(c_idx == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)

    d, du, y, B_blk, C_blk, A_t = _prologue(
        u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref)
    dt = d.shape[0]
    A2 = A_t * LOG2E
    b_full = du[None] * B_blk[:, None, :]
    carry = h_ref[...].astype(jnp.float32)
    hs = []
    for i in range(chunk // sub):
        sl = slice(i * sub, (i + 1) * sub)
        b = b_full[:, :, sl]
        sd = d[:, sl]
        for s in range(int(math.log2(sub))):
            k = 1 << s
            e = jnp.exp2(A2 * sd[None])
            b_prev = jnp.concatenate(
                [jnp.zeros((nstate, dt, k), jnp.float32), b[:, :, :-k]],
                axis=2)
            b = e * b_prev + b
            sd = sd + jnp.concatenate(
                [jnp.zeros((dt, k), jnp.float32), sd[:, :-k]], axis=1)
        P = jnp.exp2(A2 * sd[None])
        h_i = P * carry + b
        carry = h_i[:, :, -1:]
        hs.append(h_i)
    h_all = jnp.concatenate(hs, axis=2)
    y = y + jnp.sum(C_blk[:, None, :] * h_all, axis=0)
    h_ref[...] = carry
    y_ref[0] = y.astype(y_ref.dtype)


def kernel_v15(u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref,
               y_ref, h_ref, *, nstate, chunk, sub):
    """Brent-Kung (work-efficient) subchunk scan, log-domain combine
    (VERDICT r2 next#2a). Combine((sd1,b1),(sd2,b2)) = (sd1+sd2,
    exp2(A*sd2)*b1 + b2); carry folded into b[0] like v13.

    Does O(n) combines vs Hillis-Steele's O(n log n) — but the up/down
    sweeps run 2*log2(sub) levels of NARROWING width, and a VPU op below
    128 lanes costs the same issue slots as a 128-lane op (ops cost
    ~ceil(rows/8)*ceil(cols/128) cycles), so the narrow tree levels don't
    get cheaper and the level count doubles. Expected slower than v13;
    raced to close the work-efficient-scan question with a number.
    """
    c_idx = pl.program_id(2)

    @pl.when(c_idx == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)

    d, du, y, B_blk, C_blk, A_t = _prologue(
        u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref)
    dt = d.shape[0]
    A2 = A_t * LOG2E
    b_full = du[None] * B_blk[:, None, :]
    carry = h_ref[...].astype(jnp.float32)
    n_lv = int(math.log2(sub))
    hs = []
    for i in range(chunk // sub):
        lo, hi = i * sub, (i + 1) * sub
        d0 = d[:, lo : lo + 1]
        b0 = b_full[:, :, lo : lo + 1] + jnp.exp2(A2 * d0[None]) * carry
        b = jnp.concatenate([b0, b_full[:, :, lo + 1 : hi]], axis=2)
        sd = d[:, lo:hi]
        # up-sweep: pairwise-combine to levels of width sub/2 ... 1
        levels = [(sd, b)]
        for _l in range(n_lv):
            sd_c, b_c = levels[-1]
            w = sd_c.shape[-1]
            sd2 = sd_c.reshape(dt, w // 2, 2)
            b2 = b_c.reshape(nstate, dt, w // 2, 2)
            sd_o = sd2[..., 1]
            levels.append((
                sd2[..., 0] + sd_o,
                jnp.exp2(A2 * sd_o[None]) * b2[..., 0] + b2[..., 1],
            ))
        # down-sweep: inclusive prefixes back to full width; at level of
        # width 2w: I[2j+1] = I_above[j], I[2j] = combine(I_above[j-1],
        # x[2j]) with zero prefix at j=0 (carry already folded into b[0])
        I = levels[-1][1]  # width 1: the subchunk total
        for l in range(n_lv - 1, -1, -1):
            sd_c, b_c = levels[l]
            w2 = sd_c.shape[-1]
            sd_e = sd_c.reshape(dt, w2 // 2, 2)[..., 0]
            b_e = b_c.reshape(nstate, dt, w2 // 2, 2)[..., 0]
            zi = jnp.zeros((nstate, dt, 1), jnp.float32)
            I_prev = jnp.concatenate([zi, I[:, :, :-1]], axis=2)
            I_even = jnp.exp2(A2 * sd_e[None]) * I_prev + b_e
            I = jnp.stack([I_even, I], axis=-1).reshape(nstate, dt, w2)
        carry = I[:, :, -1:]
        hs.append(I)
    h_all = jnp.concatenate(hs, axis=2)
    y = y + jnp.sum(C_blk[:, None, :] * h_all, axis=0)
    h_ref[...] = carry
    y_ref[0] = y.astype(y_ref.dtype)


def kernel_v15b(u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref,
                y_ref, h_ref, *, nstate, chunk, sub):
    """Brent-Kung via full-width masked updates — the only form Mosaic can
    lower (v15's even/odd deinterleave reshape dies with 'Invalid type':
    no strided lane addressing). Every one of the 2*log2(sub)-2 tree
    levels is a full-width select/combine, so the O(n) combine count
    buys nothing: expected ~2x v13. Raced for the record."""
    c_idx = pl.program_id(2)

    @pl.when(c_idx == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)

    d, du, y, B_blk, C_blk, A_t = _prologue(
        u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref)
    dt = d.shape[0]
    A2 = A_t * LOG2E
    b_full = du[None] * B_blk[:, None, :]
    carry = h_ref[...].astype(jnp.float32)
    n_lv = int(math.log2(sub))
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, dt, sub), 2)
    hs = []
    for i in range(chunk // sub):
        lo, hi = i * sub, (i + 1) * sub
        d0 = d[:, lo : lo + 1]
        b0 = b_full[:, :, lo : lo + 1] + jnp.exp2(A2 * d0[None]) * carry
        b = jnp.concatenate([b0, b_full[:, :, lo + 1 : hi]], axis=2)
        sd = d[:, lo:hi]
        # up-sweep: at level l combine x[p-k] into x[p] for p = 2k-1 mod 2k
        for l in range(n_lv):
            k = 1 << l
            upd = (lane % (2 * k)) == (2 * k - 1)
            zb = jnp.zeros((nstate, dt, k), jnp.float32)
            zs = jnp.zeros((dt, k), jnp.float32)
            b_sh = jnp.concatenate([zb, b[:, :, :-k]], axis=2)
            sd_sh = jnp.concatenate([zs, sd[:, :-k]], axis=1)
            b = jnp.where(upd, jnp.exp2(A2 * sd[None]) * b_sh + b, b)
            sd = jnp.where(upd[0], sd + sd_sh, sd)
        # down-sweep: combine x[p-k] into x[p] for p = 3k-1 mod 2k
        for l in range(n_lv - 2, -1, -1):
            k = 1 << l
            upd = (lane % (2 * k)) == (3 * k - 1) % (2 * k)
            upd = jnp.logical_and(upd, lane >= 3 * k - 1)
            zb = jnp.zeros((nstate, dt, k), jnp.float32)
            b_sh = jnp.concatenate([zb, b[:, :, :-k]], axis=2)
            b = jnp.where(upd, jnp.exp2(A2 * sd[None]) * b_sh + b, b)
        carry = b[:, :, -1:]
        hs.append(b)
    h_all = jnp.concatenate(hs, axis=2)
    y = y + jnp.sum(C_blk[:, None, :] * h_all, axis=0)
    h_ref[...] = carry
    y_ref[0] = y.astype(y_ref.dtype)


def kernel_v16(u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref,
               y_ref, y2_ref, h_ref, *, nstate, chunk, sub):
    """Lower-bound probe for ONE combined fwd+rev grid pass (VERDICT r2
    next#2b): the exact forward scan PLUS a chunk-LOCAL reverse scan of
    the same chunk, sharing the u/delta read and the prologue
    (softplus/du/Dskip*u). The reverse direction's cross-chunk carry is
    anti-causal vs the grid walk, so a real combined kernel would
    additionally need (a) per-chunk reverse totals + a full-width
    suffix-decay correction pass (exp + FMA per state-element, ~+10%),
    and (b) separate B/C inputs for the reverse directions (their
    projection weights differ), doubling B/C DMA back to the two-call
    level. If this probe already costs >= 2x v13, the combined pass
    cannot win.
    """
    c_idx = pl.program_id(2)

    @pl.when(c_idx == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)

    d, du, y, B_blk, C_blk, A_t = _prologue(
        u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref)
    dt = d.shape[0]
    A2 = A_t * LOG2E
    b_full = du[None] * B_blk[:, None, :]
    n_steps = int(math.log2(sub))

    def hs_scan(b_seed_carry, reverse):
        carry = b_seed_carry
        hs = []
        rng = range(chunk // sub)
        for i in (reversed(rng) if reverse else rng):
            lo, hi = i * sub, (i + 1) * sub
            edge = hi - 1 if reverse else lo
            d0 = d[:, edge : edge + 1]
            b0 = b_full[:, :, edge : edge + 1] + jnp.exp2(
                A2 * d0[None]) * carry
            if reverse:
                b = jnp.concatenate([b_full[:, :, lo : hi - 1], b0], axis=2)
            else:
                b = jnp.concatenate([b0, b_full[:, :, lo + 1 : hi]], axis=2)
            sd = d[:, lo:hi]
            for s in range(n_steps):
                k = 1 << s
                e = jnp.exp2(A2 * sd[None])
                zb = jnp.zeros((nstate, dt, k), jnp.float32)
                if reverse:
                    b_prev = jnp.concatenate([b[:, :, k:], zb], axis=2)
                else:
                    b_prev = jnp.concatenate([zb, b[:, :, :-k]], axis=2)
                b = e * b_prev + b
                if s < n_steps - 1:
                    zs = jnp.zeros((dt, k), jnp.float32)
                    if reverse:
                        sd = sd + jnp.concatenate([sd[:, k:], zs], axis=1)
                    else:
                        sd = sd + jnp.concatenate([zs, sd[:, :-k]], axis=1)
            carry = b[:, :, :1] if reverse else b[:, :, -1:]
            hs.append(b)
        if reverse:
            hs = hs[::-1]
        return jnp.concatenate(hs, axis=2), carry

    h_fwd, carry = hs_scan(h_ref[...].astype(jnp.float32), reverse=False)
    h_ref[...] = carry
    # chunk-local reverse scan (zero carry each chunk; correction omitted)
    h_rev, _ = hs_scan(jnp.zeros((nstate, dt, 1), jnp.float32), reverse=True)
    y2 = Dskip_ref[...].astype(jnp.float32) * u_ref[0].astype(jnp.float32)
    y_ref[0] = (y + jnp.sum(C_blk[:, None, :] * h_fwd, axis=0)
                ).astype(y_ref.dtype)
    y2_ref[0] = (y2 + jnp.sum(C_blk[:, None, :] * h_rev, axis=0)
                 ).astype(y2_ref.dtype)


def kernel_v22(u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref,
               y_ref, h_ref, *, nstate, chunk, sub, blk, zdt="float32"):
    """Matmul-dual (SSD-style) formulation — VERDICT r4 next-round #1.

    Within each `sub`-lane window the inclusive scan is computed on the
    MXU instead of the VPU Hillis-Steele: with block-local
    s_t = A*log2e * cumsum(delta) (<= 0),

        Z_p = exp2(-s_p) * b_p                 (VPU, 2 ops)
        H   = Z @ T                            (MXU; T constant, T[p,t] =
                                                p<=t and same blk-block)
        h_t = exp2(s_t) * (H_t + h_prevblock)  (VPU; exact <=0 exponents)

    `blk` bounds the separated-exponent range to |A|*sum_blk(delta)
    (fp32-exact iff < ~120 bits; Z exponent clamped there as an inf
    guard); blocks chain through exact <=0-exponent fix-ups, windows
    chain through the usual boundary carry-fold, so blk=sub reproduces
    the pure tril-matmul dual and smaller blk trades a few narrow VPU
    fix-ups for an exponent-range bound. The cumsum itself is the same
    T matmul applied to delta.
    """
    c_idx = pl.program_id(2)

    @pl.when(c_idx == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)

    d, du, y, B_blk, C_blk, A_t = _prologue(
        u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref)
    dt = d.shape[0]
    A2 = A_t * LOG2E
    b_full = du[None] * B_blk[:, None, :]
    carry = h_ref[...].astype(jnp.float32)
    zdtype = jnp.dtype(zdt)

    pi = jax.lax.broadcasted_iota(jnp.int32, (sub, sub), 0)
    ti = jax.lax.broadcasted_iota(jnp.int32, (sub, sub), 1)
    mask = (pi <= ti) & ((pi // blk) == (ti // blk))
    T32 = jnp.where(mask, 1.0, 0.0).astype(jnp.float32)
    Tz = T32.astype(zdtype)
    m = sub // blk

    hs = []
    for i in range(chunk // sub):
        lo = i * sub
        sd = d[:, lo : lo + sub]                     # (Dt, sub)
        sig = jnp.dot(sd, T32, preferred_element_type=jnp.float32)
        s = A2 * sig[None]                           # (N, Dt, sub) <= 0 bits
        d0 = sd[:, :1]
        b0 = b_full[:, :, lo : lo + 1] + jnp.exp2(A2 * d0[None]) * carry
        b = jnp.concatenate(
            [b0, b_full[:, :, lo + 1 : lo + sub]], axis=2)
        E = jnp.exp2(s)
        Z = jnp.exp2(jnp.minimum(-s, 120.0)) * b
        H = jnp.dot(
            Z.reshape(nstate * dt, sub).astype(zdtype), Tz,
            preferred_element_type=jnp.float32,
        ).reshape(nstate, dt, sub)
        if m == 1:
            h_i = E * H
        else:
            pieces = []
            hprev = None
            for j in range(m):
                Hj = H[:, :, j * blk : (j + 1) * blk]
                if j:
                    Hj = Hj + hprev
                hj = E[:, :, j * blk : (j + 1) * blk] * Hj
                hprev = hj[:, :, blk - 1 : blk]
                pieces.append(hj)
            h_i = jnp.concatenate(pieces, axis=2)
        carry = h_i[:, :, sub - 1 : sub]
        hs.append(h_i)
    h_all = jnp.concatenate(hs, axis=2)
    y = y + jnp.sum(C_blk[:, None, :] * h_all, axis=0)
    h_ref[...] = carry
    y_ref[0] = y.astype(y_ref.dtype)


def kernel_v24(u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref,
               y_ref, h_ref, *, nstate, chunk, sub, blk, mid=False):
    """Matmul-dual with MATMUL-ASSISTED cross-block fix-ups (v22's 3.5 ms
    fix-up cost came from sliced sub-128-lane VPU ops: each costs a full
    issue slot). Here block-end values are extracted with a one-hot
    picker matmul, the m-step entering-carry chain runs on narrow
    (nb, Dt, 1) tensors, and the corrections are broadcast back with a
    second (m, sub) selector matmul + ONE full-width FMA.

    mid=True shifts each block's exponent reference to the block MIDDLE
    (two-sided clamp): the separated-factor exposure halves to
    |A|*sum(delta)/2 per block, so blk=64-mid has blk=32-start safety at
    half the fix-up count.
    """
    c_idx = pl.program_id(2)

    @pl.when(c_idx == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)

    d, du, y, B_blk, C_blk, A_t = _prologue(
        u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref)
    dt = d.shape[0]
    A2 = A_t * LOG2E
    b_full = du[None] * B_blk[:, None, :]
    carry = h_ref[...].astype(jnp.float32)
    m = sub // blk

    pi = jax.lax.broadcasted_iota(jnp.int32, (sub, sub), 0)
    ti = jax.lax.broadcasted_iota(jnp.int32, (sub, sub), 1)
    T = jnp.where((pi <= ti) & (pi // blk == ti // blk), 1.0, 0.0)
    li = jax.lax.broadcasted_iota(jnp.int32, (sub, m), 0)
    bi = jax.lax.broadcasted_iota(jnp.int32, (sub, m), 1)
    Pend = jnp.where(li == bi * blk + blk - 1, 1.0, 0.0)   # (sub, m)
    S = jnp.where(li // blk == bi, 1.0, 0.0).T             # (m, sub)
    if mid:
        Pmid = jnp.where(li == bi * blk + blk // 2 - 1, 1.0, 0.0)

    hs = []
    for i in range(chunk // sub):
        lo = i * sub
        sd = d[:, lo : lo + sub]
        sig = jnp.dot(sd, T, preferred_element_type=jnp.float32)
        d0 = sd[:, :1]
        b0 = b_full[:, :, lo : lo + 1] + jnp.exp2(A2 * d0[None]) * carry
        b = jnp.concatenate([b0, b_full[:, :, lo + 1 : lo + sub]], axis=2)
        if mid:
            # per-block mid reference, broadcast back over the block —
            # both on the n-shared (Dt, ·) tensors. E_t is then the decay
            # from the block MID, so decays-from-entry pick up an extra
            # per-block factor Emid = exp2(A*sig_mid) in the fix-ups.
            mids = jnp.dot(sig, Pmid, preferred_element_type=jnp.float32)
            sig = sig - jnp.dot(mids, S, preferred_element_type=jnp.float32)
            Emid = jnp.exp2(A2 * mids[None])     # (nb, Dt, m)
        s = A2 * sig[None]                       # (nb, Dt, sub)
        E = jnp.exp2(jnp.minimum(s, 120.0))
        Z = jnp.exp2(jnp.minimum(-s, 120.0)) * b
        H = jnp.dot(
            Z.reshape(nstate * dt, sub), T,
            preferred_element_type=jnp.float32,
        ).reshape(nstate, dt, sub)
        h_i = E * H
        if m > 1:
            flat = h_i.reshape(nstate * dt, sub)
            ends_h = jnp.dot(flat, Pend,
                             preferred_element_type=jnp.float32
                             ).reshape(nstate, dt, m)
            ends_E = jnp.dot(E.reshape(nstate * dt, sub), Pend,
                             preferred_element_type=jnp.float32
                             ).reshape(nstate, dt, m)
            dec = ends_E * Emid if mid else ends_E  # full-block decays
            cs = [jnp.zeros((nstate, dt, 1), jnp.float32),
                  ends_h[:, :, 0:1]]
            for j in range(2, m):
                cs.append(ends_h[:, :, j - 1 : j]
                          + dec[:, :, j - 1 : j] * cs[-1])
            cvec = jnp.concatenate(cs, axis=2)   # (nb, Dt, m)
            if mid:
                cvec = cvec * Emid               # decay mid->entry side
            corr = jnp.dot(
                cvec.reshape(nstate * dt, m), S,
                preferred_element_type=jnp.float32,
            ).reshape(nstate, dt, sub)
            h_i = h_i + E * corr
        carry = h_i[:, :, sub - 1 : sub]
        hs.append(h_i)
    h_all = jnp.concatenate(hs, axis=2)
    y = y + jnp.sum(C_blk[:, None, :] * h_all, axis=0)
    h_ref[...] = carry
    y_ref[0] = y.astype(y_ref.dtype)


def kernel_v26(u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref,
               y_ref, h_ref, *, nstate, chunk, sub, blk):
    """v25 (mid-shift dual) micro-optimized: one merged h = E*(H + corr)
    FMA; block-end decays derived from the n-shared sigma ends (tiny
    (Dt, sub) @ (sub, m) matmul + narrow exp2) instead of a full-width
    E picker; corr built by selector matmul."""
    c_idx = pl.program_id(2)

    @pl.when(c_idx == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)

    d, du, y, B_blk, C_blk, A_t = _prologue(
        u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref)
    dt = d.shape[0]
    A2 = A_t * LOG2E
    b_full = du[None] * B_blk[:, None, :]
    carry = h_ref[...].astype(jnp.float32)
    m = sub // blk

    pi = jax.lax.broadcasted_iota(jnp.int32, (sub, sub), 0)
    ti = jax.lax.broadcasted_iota(jnp.int32, (sub, sub), 1)
    T = jnp.where((pi <= ti) & (pi // blk == ti // blk), 1.0, 0.0)
    li = jax.lax.broadcasted_iota(jnp.int32, (sub, m), 0)
    bi = jax.lax.broadcasted_iota(jnp.int32, (sub, m), 1)
    Pend = jnp.where(li == bi * blk + blk - 1, 1.0, 0.0)   # (sub, m)
    Pmid = jnp.where(li == bi * blk + blk // 2 - 1, 1.0, 0.0)
    S = jnp.where(li // blk == bi, 1.0, 0.0).T             # (m, sub)

    hs = []
    for i in range(chunk // sub):
        lo = i * sub
        sd = d[:, lo : lo + sub]
        sig = jnp.dot(sd, T, preferred_element_type=jnp.float32)
        d0 = sd[:, :1]
        b0 = b_full[:, :, lo : lo + 1] + jnp.exp2(A2 * d0[None]) * carry
        b = jnp.concatenate([b0, b_full[:, :, lo + 1 : lo + sub]], axis=2)
        mids = jnp.dot(sig, Pmid, preferred_element_type=jnp.float32)
        sig_ends = jnp.dot(sig, Pend, preferred_element_type=jnp.float32)
        sig = sig - jnp.dot(mids, S, preferred_element_type=jnp.float32)
        Emid = jnp.exp2(A2 * mids[None])         # (nb, Dt, m) narrow
        s = A2 * sig[None]
        E = jnp.exp2(jnp.minimum(s, 120.0))
        Z = jnp.exp2(jnp.minimum(-s, 120.0)) * b
        H = jnp.dot(
            Z.reshape(nstate * dt, sub), T,
            preferred_element_type=jnp.float32,
        ).reshape(nstate, dt, sub)
        if m == 1:
            h_i = E * H
        else:
            # h at block ends (uncorrected): E_end*H_end with
            # E_end = exp2(A*(sig_end - mid)) from the tiny sigma ends
            E_ends = jnp.exp2(A2 * (sig_ends - mids)[None])
            H_ends = jnp.dot(H.reshape(nstate * dt, sub), Pend,
                             preferred_element_type=jnp.float32
                             ).reshape(nstate, dt, m)
            ends_h = E_ends * H_ends
            dec = jnp.exp2(A2 * sig_ends[None])  # full-block decays
            cs = [jnp.zeros((nstate, dt, 1), jnp.float32),
                  ends_h[:, :, 0:1]]
            for j in range(2, m):
                cs.append(ends_h[:, :, j - 1 : j]
                          + dec[:, :, j - 1 : j] * cs[-1])
            cvec = jnp.concatenate(cs, axis=2) * Emid
            corr = jnp.dot(
                cvec.reshape(nstate * dt, m), S,
                preferred_element_type=jnp.float32,
            ).reshape(nstate, dt, sub)
            h_i = E * (H + corr)
        carry = h_i[:, :, sub - 1 : sub]
        hs.append(h_i)
    h_all = jnp.concatenate(hs, axis=2)
    y = y + jnp.sum(C_blk[:, None, :] * h_all, axis=0)
    h_ref[...] = carry
    y_ref[0] = y.astype(y_ref.dtype)


VARIANTS = {
    "v0": (kernel_v0, {}),
    "v26_midopt_128_64": (kernel_v26, {"sub": 128, "blk": 64}),
    "v26_midopt_128_32": (kernel_v26, {"sub": 128, "blk": 32}),
    "v24_mmfix_128_32": (kernel_v24, {"sub": 128, "blk": 32}),
    "v24_mmfix_128_16": (kernel_v24, {"sub": 128, "blk": 16}),
    "v25_mid_128_64": (kernel_v24, {"sub": 128, "blk": 64, "mid": True}),
    "v25_mid_256_64": (kernel_v24, {"sub": 256, "blk": 64, "mid": True}),
    "v25_mid_256_128": (kernel_v24, {"sub": 256, "blk": 128, "mid": True}),
    "v25_mid_128_32": (kernel_v24, {"sub": 128, "blk": 32, "mid": True}),
    "v22_dual_128_128": (kernel_v22, {"sub": 128, "blk": 128}),
    "v22_dual_128_64": (kernel_v22, {"sub": 128, "blk": 64}),
    "v22_dual_128_32": (kernel_v22, {"sub": 128, "blk": 32}),
    "v22_dual_128_16": (kernel_v22, {"sub": 128, "blk": 16}),
    "v22_dual_256_32": (kernel_v22, {"sub": 256, "blk": 32}),
    "v23_dualbf16_128_32": (kernel_v22, {"sub": 128, "blk": 32,
                                         "zdt": "bfloat16"}),
    "v15_blelloch_128": (kernel_v15, {"sub": 128}),
    "v15b_masked_128": (kernel_v15b, {"sub": 128}),
    "v16_combined_128": (kernel_v16, {"sub": 128}),
    "v13_fold_128": (kernel_v13, {"sub": 128}),
    "v13_fold_exp2_128": (kernel_v13, {"sub": 128, "exp2": True}),
    "v19_ecarry_128": (kernel_v19, {"sub": 128}),
    "v14_exp2_128": (kernel_v14, {"sub": 128}),
    "v8s_64": (kernel_v8s, {"sub": 64}),
    "v10_128": (kernel_v10, {"sub": 128}),
    "v11_128": (kernel_v11, {"sub": 128}),
    "v12_ld_128": (kernel_v12_ld, {"sub": 128}),
    "v12_ld_8": (kernel_v12_ld, {"sub": 8}),
    "v1_128": (kernel_v1, {"sub": 128}),
    "v1_256": (kernel_v1, {"sub": 256}),
    "v3": (kernel_v3, {}),
    "v4_128": (kernel_v4, {"sub": 128}),
    "v6": (kernel_v6, {}),
    "v8": (kernel_v8, {}),
    "v8s_128": (kernel_v8s, {"sub": 128}),
    "v8s_256": (kernel_v8s, {"sub": 256}),
    "v9": (kernel_v9, {}),
}
PINGPONG = {"v9"}


def build_ld(kernel, extra, chunk=CHUNK, d_tile=D, seq_len=None):
    """Channels-last builder for v12_ld: u/d/y (B, L, DIM) blocks
    (1, chunk, d_tile); B/C (B, G, N, L, 1) blocks (1, 1, N, chunk, 1)."""
    seq = seq_len or L
    n_chunks = seq // chunk
    n_dtiles = DIM // d_tile
    dg_tiles = (DIM // G) // d_tile
    k = functools.partial(kernel, nstate=N, chunk=chunk, **extra)

    def fwd(u, d, A, B4, C4, Dskip, bias):
        # relayout from the DL test harness inputs
        u_ld = jnp.swapaxes(u, 1, 2)
        d_ld = jnp.swapaxes(d, 1, 2)
        B5 = B4[..., None]
        C5 = C4[..., None]
        A_ld = jnp.swapaxes(A[:, :, 0], 0, 1)[:, None, :]  # (N, 1, DIM)
        y_ld = pl.pallas_call(
            k,
            grid=(B, n_dtiles, n_chunks),
            in_specs=[
                pl.BlockSpec((1, chunk, d_tile),
                             lambda b, dt, c: (b, c, dt)),
                pl.BlockSpec((1, chunk, d_tile),
                             lambda b, dt, c: (b, c, dt)),
                pl.BlockSpec((N, 1, d_tile), lambda b, dt, c: (0, 0, dt)),
                pl.BlockSpec((1, 1, N, chunk, 1),
                             lambda b, dt, c: (b, dt // dg_tiles, 0, c, 0)),
                pl.BlockSpec((1, 1, N, chunk, 1),
                             lambda b, dt, c: (b, dt // dg_tiles, 0, c, 0)),
                pl.BlockSpec((1, d_tile), lambda b, dt, c: (0, dt)),
                pl.BlockSpec((1, d_tile), lambda b, dt, c: (0, dt)),
            ],
            out_specs=pl.BlockSpec(
                (1, chunk, d_tile), lambda b, dt, c: (b, c, dt)),
            out_shape=jax.ShapeDtypeStruct((B, seq, DIM), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((N, 8, d_tile), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
        )(u_ld, d_ld, A_ld, B5, C5,
          jnp.swapaxes(Dskip, 0, 1), jnp.swapaxes(bias, 0, 1))
        return jnp.swapaxes(y_ld, 1, 2)

    return fwd


def build(kernel, extra, chunk=CHUNK, d_tile=D, seq_len=None):
    if kernel is kernel_v12_ld:
        return build_ld(kernel, extra, chunk=chunk, d_tile=d_tile,
                        seq_len=seq_len)
    seq = seq_len or L
    n_chunks = seq // chunk
    n_dtiles = DIM // d_tile
    dg_tiles = (DIM // G) // d_tile
    k = functools.partial(kernel, nstate=N, chunk=chunk, **extra)
    scratch = [pltpu.VMEM((N, d_tile, 1), jnp.float32)]
    if kernel is kernel_v9:
        scratch += [pltpu.VMEM((N, d_tile, chunk), jnp.float32)] * 2
    n_out = 2 if kernel is kernel_v16 else 1

    def fwd(u, d, A, B4, C4, Dskip, bias):
        o_spec = pl.BlockSpec((1, d_tile, chunk), lambda b, dt, c: (b, dt, c))
        o_shape = jax.ShapeDtypeStruct((B, DIM, seq), jnp.bfloat16)
        y = pl.pallas_call(
            k,
            grid=(B, n_dtiles, n_chunks),
            in_specs=[
                pl.BlockSpec((1, d_tile, chunk), lambda b, dt, c: (b, dt, c)),
                pl.BlockSpec((1, d_tile, chunk), lambda b, dt, c: (b, dt, c)),
                pl.BlockSpec((N, d_tile, 1), lambda b, dt, c: (0, dt, 0)),
                pl.BlockSpec((1, 1, N, chunk),
                             lambda b, dt, c: (b, dt // dg_tiles, 0, c)),
                pl.BlockSpec((1, 1, N, chunk),
                             lambda b, dt, c: (b, dt // dg_tiles, 0, c)),
                pl.BlockSpec((d_tile, 1), lambda b, dt, c: (dt, 0)),
                pl.BlockSpec((d_tile, 1), lambda b, dt, c: (dt, 0)),
            ],
            out_specs=o_spec if n_out == 1 else [o_spec] * n_out,
            out_shape=o_shape if n_out == 1 else [o_shape] * n_out,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            interpret=INTERPRET,
        )(u, d, A, B4, C4, Dskip, bias)
        # v16's second output (chunk-local reverse) is part of the kernel's
        # work but not the parity/chaining surface
        return y[0] if n_out > 1 else y

    return fwd


def make_inputs(seed):
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    u = jax.random.normal(ks[0], (B, DIM, L), jnp.bfloat16)
    if _os.environ.get("VMAMBAIR_KV_DELTA") == "real":
        # Mamba-init-realistic delta: post-softplus values log-uniform in
        # [1e-3, 0.1] (the reference's dt_init range) — the default
        # |N|*0.5 raw delta softpluses to ~0.92/step, ~20-50x hotter than
        # any model init, which matters for range-sensitive formulations
        # (v22 dual). Raw = inverse-softplus of the target.
        tgt = jnp.exp(jax.random.uniform(
            ks[1], (B, DIM, L), jnp.float32,
            minval=jnp.log(1e-3), maxval=jnp.log(0.1)))
        delta = jnp.log(jnp.expm1(tgt)).astype(jnp.bfloat16)
    else:
        delta = jnp.abs(
            jax.random.normal(ks[1], (B, DIM, L), jnp.bfloat16)) * 0.5
    Bm = jax.random.normal(ks[2], (B, G, N, L), jnp.bfloat16)
    Cm = jax.random.normal(ks[3], (B, G, N, L), jnp.bfloat16)
    if _os.environ.get("VMAMBAIR_KV_DELTA") == "real":
        # reference init: A[d, n] = -n, n = 1..N (S4D-real)
        A = -jnp.tile(jnp.arange(1, N + 1, dtype=jnp.float32)[None], (DIM, 1))
    else:
        A = -jnp.exp(jax.random.normal(ks[4], (DIM, N)) * 0.5)
    AT = A.T[:, :, None]
    Dv = jnp.ones((DIM, 1), jnp.float32)
    bias = jax.random.normal(ks[5], (DIM, 1)) * 0.01
    return u, delta, AT, Bm, Cm, Dv, bias, A


def parity(fwd, name):
    from vmambair_tpu.ops.selective_scan import selective_scan_xla

    u, delta, AT, Bm, Cm, Dv, bias, A = make_inputs(42)
    # shrink for parity: L=2048 slice
    Ls = min(2048, L)
    us, ds = u[:, :, :Ls], delta[:, :, :Ls]
    Bs, Cs = Bm[:, :, :, :Ls], Cm[:, :, :, :Ls]

    fwd_s = build(*VARIANTS[name], seq_len=Ls)
    y = fwd_s(us, ds, AT, Bs, Cs, Dv, bias)
    y_ref = selective_scan_xla(
        jnp.swapaxes(us, 1, 2), jnp.swapaxes(ds, 1, 2), A,
        jnp.moveaxis(Bs, 3, 1), jnp.moveaxis(Cs, 3, 1),
        Dv[:, 0], bias[:, 0], delta_softplus=True)
    y_ref = jnp.swapaxes(y_ref, 1, 2)
    err = float(jnp.max(jnp.abs(y.astype(jnp.float32) -
                                y_ref.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32)))) + 1e-9
    return err, err / scale


def time_variant(fwd):
    @jax.jit
    def run_n(u, d, AT, Bm, Cm, Dv, bias):
        def body(i, u):
            y = fwd(u, d, AT, Bm, Cm, Dv, bias)
            return y
        return fwd(jax.lax.fori_loop(0, ITERS - 1, body, u),
                   d, AT, Bm, Cm, Dv, bias)

    args0 = make_inputs(0)[:7]
    jax.block_until_ready(run_n(*args0))
    ts = []
    for rep in range(REPEATS):
        args = make_inputs(rep + 1)[:7]
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        y = run_n(*args)
        _ = float(jnp.sum(y[0, 0, :4].astype(jnp.float32)))
        jax.block_until_ready(y)
        ts.append(time.perf_counter() - t0)
    return min(ts) / ITERS


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", default=list(VARIANTS))
    ap.add_argument("--skip-parity", action="store_true")
    args = ap.parse_args()
    for name in args.names:
        fwd = build(*VARIANTS[name])
        row = {"variant": name}
        try:
            if not args.skip_parity:
                err, rel = parity(fwd, name)
                row["max_abs_err"] = round(err, 5)
                row["rel_err"] = round(rel, 6)
            t = time_variant(fwd)
            row["ms"] = round(t * 1e3, 3)
            row["gelem_per_s"] = round(B * L * DIM * N / t / 1e9, 2)
        except Exception as e:  # noqa: BLE001
            row["error"] = repr(e)[:300]
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
