#!/usr/bin/env python
"""Probe: (L, D)-native fused scan kernel — MXU relayout instead of XLA
transposes.

The production fused path (`_make_fused_vjp_op.pallas_fwd`) transposes
u2 (B, L, G, D) -> (B, G, D, L) before the kernel and the output back
after it. kbench measured the standalone transpose pair at ~8.4 ms at the
hot shape — same order as the kernel itself (14.3 ms), and because a
pallas_call is opaque to XLA the transposes must materialize.

This variant reads natural (chunk, D) blocks of a (B, G, L, D) array and
relayouts ON THE MXU:

* u -> (D, chunk): fold an identity block into the projection weight
  (wxp_aug = [Wxp; I_D]) so the ONE existing projection matmul also emits
  u in scan layout — zero extra instructions;
* y (D, chunk) -> (chunk, D): one identity contraction per grid step
  (2*chunk*D*D FLOPs ~ 19 MFLOP, trivial on the MXU).

Race: production fused op (incl. its XLA transposes) vs this, end to end
from the model's layout. Run with --interpret on CPU for parity first.

MEASURED (v5e, hot shape): 12.67 ms vs production-with-XLA-transposes
13.11 ms — only 3.5%. In context XLA overlaps/fuses the relayouts far
better than the standalone 8.4 ms transpose probe suggested, so the MXU
identity-relayout mechanism works (bitwise-exact parity) but the prize
is too small to justify forking the production kernel. Kept as a probe.
"""

import argparse
import functools
import math
import os
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vmambair_tpu.ops.pallas_scan import (  # noqa: E402
    _pick_tiles,
    _scan_core,
    _softplus,
    oss_scan_fused,
)

B, L, G, D, N, R = 8, 16384, 2, 96, 16, 6
ITERS = 9
REPEATS = 3


def _eye(d, dtype=jnp.float32):
    r = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (d, d), 1)
    return (r == c).astype(dtype)


def _ld_kernel(u_ref, wxpa_ref, wdt_ref, A_ref, Dskip_ref, bias_ref,
               y_ref, h_ref, *, nstate, dt_rank, dim, chunk, softplus,
               reverse):
    """(B, G, L, D) layout grid step; grid (B, G, chunks)."""
    c_idx = pl.program_id(2)

    @pl.when(c_idx == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)

    u_ld = u_ref[0, 0].astype(jnp.float32)          # (chunk, D)
    # ONE matmul: projections AND the u relayout (identity block rows)
    xdbl = jax.lax.dot_general(
        wxpa_ref[0].astype(jnp.float32), u_ld,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                               # (R+2N+D, chunk)
    u = xdbl[dt_rank + 2 * nstate:]                 # (D, chunk)
    d = jnp.dot(wdt_ref[0].astype(jnp.float32), xdbl[:dt_rank],
                preferred_element_type=jnp.float32)
    d = d + bias_ref[0].astype(jnp.float32)
    if softplus:
        d = _softplus(d)
    y = _scan_core(
        d, u,
        A_ref[0].astype(jnp.float32),
        xdbl[dt_rank : dt_rank + nstate],
        xdbl[dt_rank + nstate : dt_rank + 2 * nstate],
        Dskip_ref[0].astype(jnp.float32),
        h_ref, nstate=nstate, chunk=chunk, reverse=reverse,
    )                                               # (D, chunk)
    y_ld = jax.lax.dot_general(                     # MXU relayout back
        y, _eye(dim), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                               # (chunk, D)
    y_ref[0, 0] = y_ld.astype(y_ref.dtype)


@functools.lru_cache(maxsize=None)
def build_ld_fused(BT, g, dim, l, n, r, chunk, softplus, interpret,
                   out_dtype_name, reverse):
    n_chunks = l // chunk
    grid = (BT, g, n_chunks)
    cix = (lambda c: n_chunks - 1 - c) if reverse else (lambda c: c)
    kernel = functools.partial(
        _ld_kernel, nstate=n, dt_rank=r, dim=dim, chunk=chunk,
        softplus=softplus, reverse=reverse,
    )

    def fwd(u_gld, wxpa, wdt, A_t, Dskip, bias):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, 1, chunk, dim), lambda b, gg, c: (b, gg, cix(c), 0)
                ),
                pl.BlockSpec((1, r + 2 * n + dim, dim),
                             lambda b, gg, c: (gg, 0, 0)),
                pl.BlockSpec((1, dim, r), lambda b, gg, c: (gg, 0, 0)),
                pl.BlockSpec((1, n, dim, 1), lambda b, gg, c: (gg, 0, 0, 0)),
                pl.BlockSpec((1, dim, 1), lambda b, gg, c: (gg, 0, 0)),
                pl.BlockSpec((1, dim, 1), lambda b, gg, c: (gg, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, chunk, dim), lambda b, gg, c: (b, gg, cix(c), 0)
            ),
            out_shape=jax.ShapeDtypeStruct(
                (BT, g, l, dim), jnp.dtype(out_dtype_name)
            ),
            scratch_shapes=[pltpu.VMEM((n, dim, 1), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(u_gld, wxpa, wdt, A_t, Dskip, bias)

    return fwd


def ld_fused(u_gld, xw, dw, db, A, Ds, *, softplus=True, reverse=False,
             interpret=False):
    """u_gld (B, G, L, D) -> y (B, G, L, D); weights as oss_scan_fused."""
    bt, g, l, dim = u_gld.shape
    n = A.shape[2]
    r = dw.shape[2]
    chunk, _ = _pick_tiles(l, g * dim, g, n)
    fwd = build_ld_fused(bt, g, dim, l, n, r, chunk, softplus, interpret,
                         str(u_gld.dtype), reverse)
    wxpa = jnp.concatenate(
        [xw.astype(jnp.float32),
         jnp.broadcast_to(jnp.eye(dim, dtype=jnp.float32), (g, dim, dim))],
        axis=1,
    )
    A_t = jnp.transpose(A, (0, 2, 1))[..., None]    # (G, N, D, 1)
    return fwd(u_gld, wxpa, dw, A_t, Ds[..., None], db[..., None])


def make_inputs(seed):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    u2 = jax.random.normal(ks[0], (B, L, G, D), jnp.bfloat16)
    xw = jax.random.normal(ks[1], (G, R + 2 * N, D), jnp.float32) * 0.2
    dw = jax.random.normal(ks[2], (G, D, R), jnp.float32) * 0.2
    db = 0.1 * jax.random.normal(ks[3], (G, D), jnp.float32)
    A = -0.5 - jnp.exp(jax.random.normal(ks[4], (G, D, N)) * 0.5)
    Ds = jax.random.normal(ks[5], (G, D), jnp.float32)
    return u2, xw, dw, db, A, Ds


def make_inputs_small(seed):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    l, dim = 2048, D
    u2 = jax.random.normal(ks[0], (2, l, G, dim), jnp.bfloat16)
    xw = jax.random.normal(ks[1], (G, R + 2 * N, dim), jnp.float32) * 0.2
    dw = jax.random.normal(ks[2], (G, dim, R), jnp.float32) * 0.2
    db = 0.1 * jax.random.normal(ks[3], (G, dim), jnp.float32)
    A = -0.5 - jnp.exp(jax.random.normal(ks[4], (G, dim, N)) * 0.5)
    Ds = jax.random.normal(ks[5], (G, dim), jnp.float32)
    return u2, xw, dw, db, A, Ds


def check_parity(interpret, reverse):
    mk = make_inputs_small if interpret else make_inputs
    u2, xw, dw, db, A, Ds = mk(0)
    y_ref = oss_scan_fused(u2, xw, dw, db, A, Ds, softplus=True,
                           reverse=reverse, interpret=interpret)
    u_gld = jnp.moveaxis(u2, 2, 1)                  # (B, G, L, D)
    y_ld = ld_fused(u_gld, xw, dw, db, A, Ds, softplus=True,
                    reverse=reverse, interpret=interpret)
    y_ld = jnp.moveaxis(y_ld, 1, 2)
    num = float(jnp.max(jnp.abs(y_ld.astype(jnp.float32)
                                - y_ref.astype(jnp.float32))))
    den = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32)))) + 1e-9
    print(f"parity reverse={reverse}: rel err {num / den:.3e}")
    assert num / den < 3e-2, "LD-fused mismatch"


def timed(fn, mk, chain):
    @jax.jit
    def run_n(*xs):
        def body(i, xs):
            y = fn(*xs)
            return chain(y, *xs)
        xs = jax.lax.fori_loop(0, ITERS - 1, body, xs)
        return fn(*xs)

    jax.block_until_ready(run_n(*mk(0)))
    ts = []
    for rep in range(REPEATS):
        xs = jax.block_until_ready(mk(rep + 1))
        t0 = time.perf_counter()
        y = run_n(*xs)
        _ = float(jnp.sum(y[(0,) * (y.ndim - 1)][:1]))
        jax.block_until_ready(y)
        ts.append(time.perf_counter() - t0)
    return min(ts) / ITERS


def race():
    import json

    def chain_prod(y, u2, *rest):
        return (y.astype(u2.dtype),) + rest

    t_prod = timed(
        lambda *a: oss_scan_fused(*a, softplus=True),
        make_inputs, chain_prod,
    )
    print(json.dumps({"piece": "fused_prod_BLGD", "ms": round(t_prod * 1e3, 3)}))

    def mk_ld(seed):
        u2, *rest = make_inputs(seed)
        return (jnp.moveaxis(u2, 2, 1),) + tuple(rest)

    t_ld = timed(
        lambda *a: ld_fused(*a, softplus=True),
        mk_ld, chain_prod,
    )
    print(json.dumps({"piece": "fused_ld_BGLD", "ms": round(t_ld * 1e3, 3),
                      "speedup_vs_prod": round(t_prod / t_ld, 3)}))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--race", action="store_true")
    args = ap.parse_args()
    if args.interpret:
        check_parity(True, False)
        check_parity(True, True)
    if args.race:
        check_parity(False, False)
        race()
