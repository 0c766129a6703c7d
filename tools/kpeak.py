#!/usr/bin/env python
"""Measure VPU primitive throughput on-chip: fp32/bf16 FMA, exp, lane-roll,
sublane-broadcast mul. Establishes the roofline for the scan kernel."""

import functools
import json
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, LANES = 1024, 1024  # per-block working set: 1024x1024 fp32 = 4MB
GRID = 16                 # blocks per call
REP = 64                  # inner op repetitions per element
ITERS = 5


def run(kern, dtype, tag, ops_per_rep, work_bufs=1):
    def fn(x):
        return pl.pallas_call(
            kern,
            grid=(GRID,),
            in_specs=[pl.BlockSpec((1, ROWS, LANES), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((1, ROWS, LANES), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((GRID, ROWS, LANES), dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel",),
            ),
        )(x)

    x = (jax.random.uniform(jax.random.PRNGKey(0), (GRID, ROWS, LANES),
                            jnp.float32) * 0.1 + 0.5).astype(dtype)

    @jax.jit
    def loop(x):
        return jax.lax.fori_loop(0, ITERS, lambda i, v: fn(v), x)

    y = jax.block_until_ready(loop(x))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        y = loop(x)
        _ = float(jnp.sum(y[0, 0, :2].astype(jnp.float32)))
        jax.block_until_ready(y)
        ts.append(time.perf_counter() - t0)
    t = min(ts) / ITERS / GRID
    elems = ROWS * LANES
    tops = elems * REP * ops_per_rep / t / 1e12
    print(json.dumps({"probe": tag, "us_per_block": round(t * 1e6, 1),
                      "t_ops_per_s": round(tops, 2)}), flush=True)


def kern_fma(x_ref, y_ref):
    # 8 independent chains to expose ILP (a single chain is latency-bound)
    v = x_ref[0]
    a = v * 0.999
    chains = [v * (1.0 + 0.01 * i) for i in range(8)]
    for _ in range(REP // 8):
        chains = [a * c + 0.001 for c in chains]
    acc = chains[0]
    for c in chains[1:]:
        acc = acc + c
    y_ref[0] = acc


def kern_exp(x_ref, y_ref):
    v = x_ref[0]
    for _ in range(REP):
        v = jnp.exp(v * -0.5)
    y_ref[0] = v


def kern_roll(x_ref, y_ref):
    v = x_ref[0]
    for i in range(REP):
        v = v + pltpu.roll(v, 1 + (i % 8), axis=1)
    y_ref[0] = v * 1e-30


def kern_shift_concat(x_ref, y_ref):
    v = x_ref[0]
    for i in range(REP):
        k = 1 << (i % 7)
        v = v + jnp.concatenate(
            [jnp.zeros((ROWS, k), v.dtype), v[:, :-k]], axis=1)
    y_ref[0] = v * 1e-30


if __name__ == "__main__":
    run(kern_fma, jnp.float32, "fma_fp32", 2)
    run(kern_fma, jnp.bfloat16, "fma_bf16", 2)
    run(kern_exp, jnp.float32, "exp_fp32", 1)
    run(kern_roll, jnp.float32, "roll+add_fp32", 2)
    run(kern_shift_concat, jnp.float32, "concatshift+add_fp32", 2)
