#!/usr/bin/env python
"""Probe Mosaic support + cost for in-kernel transpose and small matmuls
(building blocks of the fused projection+scan kernel)."""

import functools
import json
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, L, D = 8, 16384, 96
CHUNK = 1024
RN = 38  # R + 2N at the hot shape
ITERS = 9


def timeit(fn, *args):
    @jax.jit
    def run_n(x, *rest):
        def body(i, x):
            return fn(x, *rest).astype(x.dtype) if False else fn(x, *rest)
        y = x
        for _ in range(1):
            pass
        return jax.lax.fori_loop(0, ITERS, lambda i, v: fn(v, *rest), x)

    y = jax.block_until_ready(run_n(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        y = run_n(*args)
        _ = float(jnp.sum(y[(0,) * (y.ndim - 1)][:2].astype(jnp.float32)))
        jax.block_until_ready(y)
        ts.append(time.perf_counter() - t0)
    return min(ts) / ITERS


def probe_transpose():
    """(chunk, D) -> (D, chunk) transpose + trivial op + transpose back,
    per (b, chunk) grid step."""

    def kern(u_ref, y_ref):
        u = u_ref[0]                      # (chunk, D)
        ut = u.T.astype(jnp.float32)      # (D, chunk)
        yt = ut * 1.000001
        y_ref[0] = yt.T.astype(y_ref.dtype)

    def fn(u):
        return pl.pallas_call(
            kern,
            grid=(B, L // CHUNK),
            in_specs=[pl.BlockSpec((1, CHUNK, D), lambda b, c: (b, c, 0))],
            out_specs=pl.BlockSpec((1, CHUNK, D), lambda b, c: (b, c, 0)),
            out_shape=jax.ShapeDtypeStruct((B, L, D), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel", "arbitrary"),
            ),
        )(u)

    u = jax.random.normal(jax.random.PRNGKey(0), (B, L, D), jnp.bfloat16)
    try:
        t = timeit(fn, u)
        print(json.dumps({"probe": "transpose_pair_in_kernel",
                          "ms_per_call": round(t * 1e3, 3)}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"probe": "transpose_pair_in_kernel",
                          "error": repr(e)[:400]}), flush=True)


def probe_proj():
    """Fused-style projections per grid step: uT=(D,chunk) from transpose,
    xdblT = Wxp @ uT, deltaT = Wdt @ xdblT[:R]."""
    R = 6

    def kern(u_ref, wxp_ref, wdt_ref, y_ref):
        u = u_ref[0]                      # (chunk, D) bf16
        ut = u.T                          # (D, chunk)
        xdbl = jnp.dot(wxp_ref[...], ut.astype(jnp.float32),
                       preferred_element_type=jnp.float32)  # (RN, chunk)
        delta = jnp.dot(wdt_ref[...], xdbl[:R],
                        preferred_element_type=jnp.float32)  # (D, chunk)
        y_ref[0] = (delta + xdbl[R:R+1] * 0.5).T.astype(y_ref.dtype)

    def fn(u, wxp, wdt):
        return pl.pallas_call(
            kern,
            grid=(B, L // CHUNK),
            in_specs=[
                pl.BlockSpec((1, CHUNK, D), lambda b, c: (b, c, 0)),
                pl.BlockSpec((RN, D), lambda b, c: (0, 0)),
                pl.BlockSpec((D, R), lambda b, c: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, CHUNK, D), lambda b, c: (b, c, 0)),
            out_shape=jax.ShapeDtypeStruct((B, L, D), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel", "arbitrary"),
            ),
        )(u, wxp, wdt)

    k = jax.random.PRNGKey(1)
    u = jax.random.normal(k, (B, L, D), jnp.bfloat16)
    wxp = jax.random.normal(k, (RN, D), jnp.float32)
    wdt = jax.random.normal(k, (D, 6), jnp.float32)
    try:
        t = timeit(fn, u, wxp, wdt)
        print(json.dumps({"probe": "proj_in_kernel",
                          "ms_per_call": round(t * 1e3, 3)}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"probe": "proj_in_kernel",
                          "error": repr(e)[:400]}), flush=True)


if __name__ == "__main__":
    probe_transpose()
    probe_proj()
