#!/usr/bin/env python
"""Quick raw-kernel probe: chunk-size (VMAMBAIR_SCAN_CHUNK_X) sweep at the
hot shape, same chained-fori timing protocol as tools/kbench.py."""

import importlib
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

B, L, D, G, N = 8, 16384, 96, 2, 16
DIM = G * D
ITERS = 9
REPEATS = 3


def run(chunk_x):
    os.environ["VMAMBAIR_SCAN_CHUNK_X"] = str(chunk_x)
    # the default 32MB working-set budget clamps chunk back to 1024; scale
    # it with the requested chunk so the sweep actually changes the tile —
    # but cap at 90MB: pallas_call's vmem_limit_bytes is 100MB, and a
    # budget beyond it makes the largest sweep point abort in Mosaic
    # instead of measuring (ADVICE r2)
    os.environ["VMAMBAIR_SCAN_VMEM_MB"] = str(min(32 * chunk_x, 90))
    import vmambair_tpu.ops.pallas_scan as ps
    importlib.reload(ps)
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    u = jax.random.normal(ks[0], (B, DIM, L), jnp.bfloat16)
    d = jnp.abs(jax.random.normal(ks[1], (B, DIM, L), jnp.bfloat16)) * 0.5
    A = -jnp.exp(jax.random.normal(ks[2], (DIM, N)) * 0.5)
    Bm = jax.random.normal(ks[3], (B, G, N, L), jnp.bfloat16)
    Cm = jax.random.normal(ks[4], (B, G, N, L), jnp.bfloat16)
    Dv = jnp.ones((DIM,), jnp.float32)
    bias = jnp.zeros((DIM,), jnp.float32)

    chunk, d_tile = ps._pick_tiles(L, DIM, G, N)

    @jax.jit
    def run_n(u, d, Bm, Cm):
        def body(i, u):
            return ps.selective_scan_dl(
                u, d, A, Bm, Cm, Dv, bias, softplus=True
            ).astype(u.dtype)
        y = jax.lax.fori_loop(0, ITERS - 1, body, u)
        return ps.selective_scan_dl(y, d, A, Bm, Cm, Dv, bias, softplus=True)

    jax.block_until_ready(run_n(u, d, Bm, Cm))
    ts = []
    for rep in range(REPEATS):
        ui = jax.random.normal(
            jax.random.PRNGKey(100 + rep), (B, DIM, L), jnp.bfloat16)
        jax.block_until_ready(ui)
        t0 = time.perf_counter()
        y = run_n(ui, d, Bm, Cm)
        _ = float(jnp.sum(y[0, 0, :4].astype(jnp.float32)))
        jax.block_until_ready(y)
        ts.append(time.perf_counter() - t0)
    t = min(ts) / ITERS
    print(json.dumps({
        "chunk_x": chunk_x, "chunk": chunk, "d_tile": d_tile,
        "ms": round(t * 1e3, 3),
        "gelem_per_s": round(B * L * DIM * N / t / 1e9, 2),
    }), flush=True)


if __name__ == "__main__":
    for cx in [int(a) for a in (sys.argv[1:] or ["1", "2", "4"])]:
        run(cx)
