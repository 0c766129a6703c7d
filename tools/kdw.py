#!/usr/bin/env python
"""Depthwise-3x3 lowering race (round 4, non-scan headroom).

The OSS block and EFFN both carry a 3x3 depthwise conv (48-254 channels at
(8, 128, 128, C)). XLA lowers `feature_group_count=C` convs through the
convolution emitter; this probe races that against a 9-shift elementwise
formulation (pad + 9 shifted multiply-adds, which XLA fuses into one
VPU kernel) and a dense-3x3 baseline for context, all with the fused
SiLU epilogue the model applies.

Protocol: chained fori loop inside jit, fresh inputs per timed call,
host-fetched checksum, min over repeats (the bench.py tunnel rules).
Run on the real chip: `python tools/kdw.py [C ...]`.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

B, H, W = 8, 128, 128
ITERS = 33
REPEATS = 3


def dw_conv(x, w, b):
    """XLA grouped-conv lowering (what flax nn.Conv emits today)."""
    c = x.shape[-1]
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    ) + b
    return jax.nn.silu(y)


def dw_shift(x, w, b):
    """9 shifted multiply-adds over the padded tensor (pure elementwise;
    w is the same (3, 3, 1, C) kernel)."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            t = xp[:, dy : dy + H, dx : dx + W, :] * w[dy, dx, 0]
            acc = t if acc is None else acc + t
    return jax.nn.silu(acc + b)


def dense_conv(x, w9, b):
    """Dense 3x3 (MXU) baseline: C->C full conv for context."""
    y = jax.lax.conv_general_dilated(
        x, w9, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    return jax.nn.silu(y)


def time_fn(fn, *consts):
    import functools

    @functools.partial(jax.jit, static_argnums=())
    def run(x0):
        def body(i, x):
            return fn(x, *consts).astype(x.dtype)
        return jax.lax.fori_loop(0, ITERS, body, x0)

    c = consts[0].shape[-1]
    shape = (B, H, W, c)

    def t(seed):
        x0 = jax.random.normal(
            jax.random.PRNGKey(seed), shape, jnp.bfloat16) * 0.1
        jax.block_until_ready(x0)
        t0 = time.perf_counter()
        y = run(x0)
        _ = float(jnp.sum(y[0, :2, :2, 0].astype(jnp.float32)))
        jax.block_until_ready(y)
        return time.perf_counter() - t0

    jax.block_until_ready(run(jax.random.normal(
        jax.random.PRNGKey(0), shape, jnp.bfloat16)))
    return min(t(101 + i) for i in range(REPEATS)) / ITERS


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # noqa: BLE001
        pass

    out = {}
    chans = [int(a) for a in sys.argv[1:]] or [48, 96, 254]
    for c in chans:
        k = jax.random.split(jax.random.PRNGKey(c), 3)
        wdw = jax.random.normal(k[0], (3, 3, 1, c), jnp.float32) * 0.1
        bias = jax.random.normal(k[1], (c,), jnp.float32) * 0.1
        out[f"dw_conv_c{c}_ms"] = round(time_fn(dw_conv, wdw, bias) * 1e3, 3)
        out[f"dw_shift_c{c}_ms"] = round(
            time_fn(dw_shift, wdw, bias) * 1e3, 3)
        if c <= 96:
            w9 = jax.random.normal(k[2], (3, 3, c, c), jnp.float32) * 0.02
            out[f"dense_c{c}_ms"] = round(
                time_fn(dense_conv, w9, bias) * 1e3, 3)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
