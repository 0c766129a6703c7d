#!/usr/bin/env python
"""Fused GDFN (EFFN) Pallas kernel probe (round 4, non-scan headroom).

kabl attribution: EFFN + its norm2 cost ~35 ms of the 591 ms step while
their HBM-optimal cost is ~5 ms — XLA round-trips the 2*2.66*dim-channel
intermediates (project_in -> dwconv3x3 -> gelu gate -> project_out) through
HBM five times. This probe fuses the whole residual branch
`x + Wout @ (gelu(x1) * x2)` with `[x1|x2] = dw3x3(Win @ LN(x))` into one
VMEM-resident kernel per (batch, row-tile):

  * LayerNorm in-kernel (per-pixel over C, fp32), zero-masked at the
    padded border so dwconv's zero padding is exact (project_in has no
    bias, so proj(0) == 0 and padding commutes with the projection)
  * one MXU matmul to the 2h hidden channels of the row tile + halo rows
  * depthwise 3x3 as 9 shifted multiply-adds on the VMEM tile (VPU)
  * gate split lane-aligned: weight columns are pre-padded so x1/x2 sit
    at 128-lane boundaries (hid=127/255/510/1021 are all odd offsets)
  * gelu gate + project_out matmul + residual add, one HBM write

Parity + race vs the XLA composite at every MambaSISR6 level shape.
Run on the real chip: `python tools/keffn.py [--interpret]`.
"""

import functools
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 17
REPEATS = 3


def _round_up(v, m):
    return (v + m - 1) // m * m


def _gdfn_kernel(x_ref, lnw_ref, lnb_ref, win_ref, wdw_ref, wout_ref,
                 o_ref, *, H, W, Wp, Hb, hp, eps):
    """Grid step (b, t): rows [t*Hb, t*Hb+Hb) of batch b.

    x_ref (1, H+2, Wp, C) zero-padded input (whole image, fetched once per
    batch — the block is grid-invariant in t); o_ref (1, Hb, W, C).
    """
    t = pl.program_id(1)
    r0 = t * Hb
    xs = x_ref[0, pl.ds(r0, Hb + 2)]                   # (Hb+2, Wp, C)
    xf = xs.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    zn = (xf - mu) * jax.lax.rsqrt(var + eps) * lnw_ref[0] + lnb_ref[0]
    # zero the padded border (rows 0/H+1 globally, cols outside [1, W])
    rows = jax.lax.broadcasted_iota(jnp.int32, (Hb + 2, Wp, 1), 0) + r0
    cols = jax.lax.broadcasted_iota(jnp.int32, (Hb + 2, Wp, 1), 1)
    valid = (rows != 0) & (rows != H + 1) & (cols >= 1) & (cols <= W)
    zn = jnp.where(valid, zn, 0.0).astype(x_ref.dtype)

    y1 = jnp.dot(zn.reshape((Hb + 2) * Wp, -1), win_ref[...],
                 preferred_element_type=jnp.float32)
    y1 = y1.reshape(Hb + 2, Wp, 2 * hp)

    acc = None
    for dy in range(3):
        for dx in range(3):
            w = wdw_ref[3 * dy + dx].astype(jnp.float32)
            term = y1[dy:dy + Hb, dx:dx + W] * w
            acc = term if acc is None else acc + term

    g = jax.nn.gelu(acc[..., :hp], approximate=True) * acc[..., hp:]
    g = g.astype(x_ref.dtype)
    out = jnp.dot(g.reshape(Hb * W, hp), wout_ref[...],
                  preferred_element_type=jnp.float32)
    res = x_ref[0, pl.ds(r0 + 1, Hb)][:, 1:W + 1].astype(jnp.float32)
    o_ref[0] = (res + out.reshape(Hb, W, -1)).astype(o_ref.dtype)


def gdfn_fused(x, ln_w, ln_b, w_in, w_dw, w_out, *, eps=1e-5,
               interpret=False):
    """x (B,H,W,C); w_in (C, 2h); w_dw (3,3,2h); w_out (h, C).
    Returns x + GDFN(LN(x))."""
    B, H, W, C = x.shape
    hid = w_out.shape[0]
    hp = _round_up(hid, 128)
    cdt = x.dtype

    win = w_in.astype(cdt)
    wdw = w_dw.reshape(9, 2 * hid).astype(cdt)
    wout = w_out.astype(cdt)
    zc = jnp.zeros((C, 2 * hp), cdt)
    win_p = zc.at[:, :hid].set(win[:, :hid]).at[:, hp:hp + hid].set(
        win[:, hid:])
    zd = jnp.zeros((9, 2 * hp), cdt)
    wdw_p = zd.at[:, :hid].set(wdw[:, :hid]).at[:, hp:hp + hid].set(
        wdw[:, hid:])
    wout_p = jnp.zeros((hp, C), cdt).at[:hid].set(wout)

    Wp = _round_up(W + 2, 8)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, Wp - W - 1), (0, 0)))
    Hb = min(H, 16)
    T = H // Hb

    kern = functools.partial(
        _gdfn_kernel, H=H, W=W, Wp=Wp, Hb=Hb, hp=hp, eps=eps)
    flops = (B * H * W * (C * 2 * hp + hp * C) * 2
             + B * H * W * 2 * hp * 9 * 2)
    return pl.pallas_call(
        kern,
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, H + 2, Wp, C), lambda b, t: (b, 0, 0, 0)),
            pl.BlockSpec((1, C), lambda b, t: (0, 0)),
            pl.BlockSpec((1, C), lambda b, t: (0, 0)),
            pl.BlockSpec((C, 2 * hp), lambda b, t: (0, 0)),
            pl.BlockSpec((9, 2 * hp), lambda b, t: (0, 0)),
            pl.BlockSpec((hp, C), lambda b, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Hb, W, C), lambda b, t: (b, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * B * H * W * C * x.dtype.itemsize,
            transcendentals=B * H * W * hp,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xp, ln_w.reshape(1, C).astype(jnp.float32),
      ln_b.reshape(1, C).astype(jnp.float32), win_p, wdw_p, wout_p)


def gdfn_xla(x, ln_w, ln_b, w_in, w_dw, w_out, *, eps=1e-5):
    """The model's current composite (LayerNorm2d + 3 Conv2d + gate)."""
    cdt = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
    zn = ((xf - mu) * jax.lax.rsqrt(var + eps) * ln_w + ln_b).astype(cdt)
    y = jax.lax.conv_general_dilated(
        zn, w_in[None, None].astype(cdt), (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        y, w_dw[:, :, None].astype(cdt), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=y.shape[-1])
    hid = w_out.shape[0]
    g = jax.nn.gelu(y[..., :hid], approximate=True) * y[..., hid:]
    out = jax.lax.conv_general_dilated(
        g, w_out[None, None].astype(cdt), (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return x + out


def make_params(key, C, dtype=jnp.float32):
    hid = int(C * 2.66)
    ks = jax.random.split(key, 5)
    s = lambda *sh: 0.05 * jax.random.normal(ks[len(sh)], sh, jnp.float32)
    return dict(
        ln_w=1.0 + 0.1 * jax.random.normal(ks[0], (C,), jnp.float32),
        ln_b=0.1 * jax.random.normal(ks[1], (C,), jnp.float32),
        w_in=0.1 * jax.random.normal(ks[2], (C, 2 * hid), jnp.float32),
        w_dw=0.3 * jax.random.normal(ks[3], (3, 3, 2 * hid), jnp.float32),
        w_out=0.1 * jax.random.normal(ks[4], (hid, C), jnp.float32),
    )


def time_fn(fn, shape, dtype, params):
    """Difference-timed (t(N) - t(1)) to cancel the tunnel RTT, min over
    repeats, fresh inputs per timed call — the bench.py protocol."""

    @functools.partial(jax.jit, static_argnums=(1,))
    def run(x0, n):
        def body(i, x):
            return fn(x, **params).astype(x.dtype)
        return jax.lax.fori_loop(0, n, body, x0)

    def t(n, seed):
        x0 = jax.random.normal(
            jax.random.PRNGKey(seed), shape, jnp.float32).astype(dtype) * 0.5
        jax.block_until_ready(x0)
        t0 = time.perf_counter()
        y = run(x0, n)
        _ = float(jnp.sum(y[0, :2, :2, 0].astype(jnp.float32)))
        jax.block_until_ready(y)
        return time.perf_counter() - t0

    jax.block_until_ready(run(jnp.zeros(shape, dtype), 1))
    jax.block_until_ready(run(jnp.zeros(shape, dtype), ITERS))
    t1 = min(t(1, 101 + i) for i in range(REPEATS))
    tn = min(t(ITERS, 501 + i) for i in range(REPEATS))
    return max(tn - t1, 1e-9) / (ITERS - 1)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # noqa: BLE001
        pass
    interpret = "--interpret" in sys.argv
    shapes = [(8, 128, 128, 48), (8, 128, 128, 96), (8, 64, 64, 96),
              (8, 32, 32, 192), (8, 16, 16, 384)]
    if interpret:
        shapes = [(2, 16, 16, 48)]
    out = {}
    for (B, H, W, C) in shapes:
        params = make_params(jax.random.PRNGKey(C + H), C)
        for dtype, tag in [(jnp.bfloat16, "bf16")]:
            x = jax.random.normal(
                jax.random.PRNGKey(1), (B, H, W, C), jnp.float32
            ).astype(dtype) * 0.5
            ref = gdfn_xla(x, **params)
            got = gdfn_fused(x, interpret=interpret, **params)
            err = float(
                jnp.max(jnp.abs(got.astype(jnp.float32)
                                - ref.astype(jnp.float32)))
                / (jnp.max(jnp.abs(ref.astype(jnp.float32))) + 1e-9))
            key = f"{H}x{W}x{C}"
            out[key + "_relerr"] = round(err, 6)
            if not interpret:
                out[key + "_xla_ms"] = round(
                    time_fn(gdfn_xla, (B, H, W, C), dtype, params) * 1e3, 3)
                out[key + "_fused_ms"] = round(
                    time_fn(
                        functools.partial(gdfn_fused, interpret=False),
                        (B, H, W, C), dtype, params) * 1e3, 3)
            print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
