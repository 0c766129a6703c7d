#!/usr/bin/env python
"""Sequential-over-L scan kernel probe (v20 family).

Every raced variant so far (tools/kvariants.py v0..v19) parallelizes over
L with lanes holding sequence positions, paying ~25 VMEM accesses per
(b,l,d,n) element (7 Hillis-Steele passes x 3 + pack/unpack) — the
measured access-rate roofline (~1.3 Tacc/s) caps that formulation at
~3.8 MP/s model throughput.  This probe races the opposite design:

  * lanes hold CHANNELS (one group's d_inner), sublanes hold the batch
    (B=8 exactly), n is a 16-deep register array
  * the recurrence h[n,b,d] = a*h + B[n,b]*du[b,d] runs as a fori_loop
    over timesteps; the state h never touches VMEM except once per chunk
  * per-element VMEM traffic drops to the raw I/O (~0.3 accesses per
    (b,l,d,n) element); cost moves to VPU issue slots

All arrays carry a leading G (group) grid dim so trailing block dims can
equal the array dims exactly (Pallas requires trailing block dims
divisible by (8, 128) or equal to the array's).  B and C are supplied as
(G, L, N, 8, 1) so the per-step operand is a direct (N, 8, 1)
sublane-layout load — no in-kernel transpose (memory: in-kernel
transposes cost ~4 ms, never do them).

Usage:
  VMAMBAIR_KSEQ_INTERPRET=1 python tools/kseq.py   # CPU parity first
  python tools/kseq.py                             # chip race

VERDICT (v5e, 2026-08-17, hot shape B=8 L=16384 DIM=192 N=16): REJECTED.
  v20_seq 11.27 ms | v20_seq_u4 10.11 | v20_seq_u8 10.30 | v21_win8 10.12
  | v21_win16 10.16 (production log-domain Hillis kernel: 12.35 ms; all
  numbers +~3 ms with the model-layout relayout included).
The design plateaus at ~10.1 ms regardless of unroll or windowed loads —
the per-iteration floor is the (N,8,Dg) fori_loop carry itself: Mosaic
spills the 16-vreg state to VMEM every iteration (~32 accesses/step),
reproducing the very access-bound behavior the design was meant to avoid.
The "state stays in registers" premise does not hold for multi-vreg
carries; with the spill, sequential-over-L has no advantage over the
production kernel's 25-access Hillis formulation and loses its lane
parallelism. Do NOT re-race; shrinking the live state (n-blocked grid,
bf16 state) trades the loss onto other axes (double input DMA /
state precision).
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, L, D, G, N = 8, 16384, 96, 2, 16  # hot level-1 decoder shape
DIM = G * D
CHUNK = 512
ITERS = 9
REPEATS = 3

INTERPRET = bool(os.environ.get("VMAMBAIR_KSEQ_INTERPRET"))
if INTERPRET:
    L, CHUNK = 512, 128
    ITERS, REPEATS = 2, 1

LOG2E = 1.4426950408889634


def _softplus(x):
    return jnp.where(x > 20.0, x, jnp.log1p(jnp.exp(jnp.minimum(x, 20.0))))


def kernel_seq(u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref,
               y_ref, h_ref, *, chunk, unroll=1, reverse=False):
    """Sequential recurrence; state (N, 8, Dg) carried in registers."""
    c_idx = pl.program_id(1)

    @pl.when(c_idx == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)

    A2 = A_ref[0].astype(jnp.float32) * LOG2E     # (N, 1, Dg)
    bias = bias_ref[0].astype(jnp.float32)        # (1, Dg)
    Dsk = Dskip_ref[0].astype(jnp.float32)        # (1, Dg)

    def step(i, h):
        l = chunk - 1 - i if reverse else i
        d = d_ref[0, pl.ds(l, 1)][0].astype(jnp.float32) + bias   # (8, Dg)
        d = _softplus(d)
        u = u_ref[0, pl.ds(l, 1)][0].astype(jnp.float32)          # (8, Dg)
        du = d * u
        Bl = B_ref[0, pl.ds(l, 1)][0].astype(jnp.float32)         # (N, 8, 1)
        Cl = C_ref[0, pl.ds(l, 1)][0].astype(jnp.float32)         # (N, 8, 1)
        a = jnp.exp2(A2 * d[None])                                # (N, 8, Dg)
        h = a * h + Bl * du[None]
        y = jnp.sum(Cl * h, axis=0) + Dsk * u                     # (8, Dg)
        y_ref[0, pl.ds(l, 1)] = y[None].astype(y_ref.dtype)
        return h

    def body(i, h):
        i0 = i * unroll
        for j in range(unroll):
            h = step(i0 + j, h)
        return h

    h_ref[...] = jax.lax.fori_loop(0, chunk // unroll, body, h_ref[...])


def kernel_seq_win(u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref,
                   y_ref, h_ref, *, chunk, win=8, reverse=False):
    """Windowed sequential recurrence: one dynamic VMEM load per `win`
    timesteps (value-sliced statically inside), one windowed store."""
    c_idx = pl.program_id(1)

    @pl.when(c_idx == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)

    A2 = A_ref[0].astype(jnp.float32) * LOG2E     # (N, 1, Dg)
    bias = bias_ref[0].astype(jnp.float32)        # (1, Dg)
    Dsk = Dskip_ref[0].astype(jnp.float32)        # (1, Dg)

    def body(i, h):
        l0 = i * win
        dw = d_ref[0, pl.ds(l0, win)].astype(jnp.float32) + bias[None]
        dw = _softplus(dw)                                  # (win, 8, Dg)
        uw = u_ref[0, pl.ds(l0, win)].astype(jnp.float32)   # (win, 8, Dg)
        duw = dw * uw
        Bw = B_ref[0, pl.ds(l0, win)].astype(jnp.float32)   # (win, N, 8, 1)
        Cw = C_ref[0, pl.ds(l0, win)].astype(jnp.float32)
        ys = []
        idx = range(win - 1, -1, -1) if reverse else range(win)
        for j in idx:
            a = jnp.exp2(A2 * dw[j][None])                  # (N, 8, Dg)
            h = a * h + Bw[j] * duw[j][None]
            ys.append(jnp.sum(Cw[j] * h, axis=0) + Dsk * uw[j])
        if reverse:
            ys.reverse()
        y_ref[0, pl.ds(l0, win)] = jnp.stack(ys).astype(y_ref.dtype)
        return h

    n_win = chunk // win
    if reverse:
        def rbody(i, h):
            return body(n_win - 1 - i, h)
        h_ref[...] = jax.lax.fori_loop(0, n_win, rbody, h_ref[...])
    else:
        h_ref[...] = jax.lax.fori_loop(0, n_win, body, h_ref[...])


def build_seq(chunk=CHUNK, seq=None, unroll=1, reverse=False, win=None):
    seq = seq or L
    n_chunks = seq // chunk
    if win:
        k = functools.partial(kernel_seq_win, chunk=chunk, win=win,
                              reverse=reverse)
    else:
        k = functools.partial(kernel_seq, chunk=chunk, unroll=unroll,
                              reverse=reverse)
    if reverse:
        def cmap(c):
            return n_chunks - 1 - c
    else:
        def cmap(c):
            return c

    def fwd(u_s, d_s, A_s, B_s, C_s, Dskip, bias):
        # u_s, d_s: (G, L, 8, Dg) bf16; A_s: (G, N, 1, Dg) f32
        # B_s, C_s: (G, L, N, 8, 1) bf16; Dskip, bias: (G, 1, Dg) f32
        return pl.pallas_call(
            k,
            grid=(G, n_chunks),
            in_specs=[
                pl.BlockSpec((1, chunk, 8, D), lambda g, c: (g, cmap(c), 0, 0)),
                pl.BlockSpec((1, chunk, 8, D), lambda g, c: (g, cmap(c), 0, 0)),
                pl.BlockSpec((1, N, 1, D), lambda g, c: (g, 0, 0, 0)),
                pl.BlockSpec((1, chunk, N, 8, 1),
                             lambda g, c: (g, cmap(c), 0, 0, 0)),
                pl.BlockSpec((1, chunk, N, 8, 1),
                             lambda g, c: (g, cmap(c), 0, 0, 0)),
                pl.BlockSpec((1, 1, D), lambda g, c: (g, 0, 0)),
                pl.BlockSpec((1, 1, D), lambda g, c: (g, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, chunk, 8, D),
                                   lambda g, c: (g, cmap(c), 0, 0)),
            out_shape=jax.ShapeDtypeStruct((G, seq, 8, DIM // G), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((N, 8, D), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=INTERPRET,
        )(u_s, d_s, A_s, B_s, C_s, Dskip, bias)

    return fwd


def make_inputs_seq(seed, seq=None):
    """Inputs natively in the sequential kernel's layout."""
    seq = seq or L
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    u = jax.random.normal(ks[0], (G, seq, 8, D), jnp.bfloat16)
    delta = jnp.abs(jax.random.normal(ks[1], (G, seq, 8, D),
                                      jnp.bfloat16)) * 0.5
    Bm = jax.random.normal(ks[2], (G, seq, N, 8, 1), jnp.bfloat16)
    Cm = jax.random.normal(ks[3], (G, seq, N, 8, 1), jnp.bfloat16)
    A = -jnp.exp(jax.random.normal(ks[4], (DIM, N)) * 0.5)
    A_s = jnp.transpose(A.reshape(G, D, N), (0, 2, 1))[:, :, None, :]
    Dv = jnp.ones((G, 1, D), jnp.float32)
    bias = jax.random.normal(ks[5], (G, 1, D)) * 0.01
    return u, delta, A_s, Bm, Cm, Dv, bias, A


def parity(chunk=CHUNK, seq=2048, **cfg):
    from vmambair_tpu.ops.selective_scan import selective_scan_xla

    seq = min(seq, L)
    u, delta, A_s, Bm, Cm, Dv, bias, A = make_inputs_seq(42, seq=seq)
    fwd_s = build_seq(chunk=min(chunk, seq), seq=seq, **cfg)
    y = fwd_s(u, delta, A_s, Bm, Cm, Dv, bias)     # (G, seq, 8, Dg)

    # reference expects (B, L, DIM) / (B, L, G, N); reverse == xla scan on
    # the flipped sequence, output flipped back
    rev = cfg.get("reverse", False)
    flip = (lambda x: x[:, ::-1]) if rev else (lambda x: x)

    def to_bld(x):  # (G, L, 8, Dg) -> (8, L, G*Dg)
        return jnp.transpose(x, (2, 1, 0, 3)).reshape(8, seq, DIM)

    u_r = flip(to_bld(u))
    d_r = flip(to_bld(delta))
    B_r = flip(jnp.transpose(Bm[..., 0], (3, 1, 0, 2)))  # (8, L, G, N)
    C_r = flip(jnp.transpose(Cm[..., 0], (3, 1, 0, 2)))
    y_ref = selective_scan_xla(u_r, d_r, A, B_r, C_r,
                               Dv.reshape(-1), bias.reshape(-1),
                               delta_softplus=True)
    y_ref = flip(y_ref)
    y_cmp = to_bld(y)
    err = float(jnp.max(jnp.abs(y_cmp.astype(jnp.float32) -
                                y_ref.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32)))) + 1e-9
    return err, err / scale


def time_fwd(fwd, relayout=False):
    if relayout:
        # include XLA transposes from the model's (B, L, G, D) layout
        def wrapped(u_m, d_m, A_s, B_m, C_m, Dv, bias):
            u_s = jnp.transpose(u_m, (2, 1, 0, 3))
            d_s = jnp.transpose(d_m, (2, 1, 0, 3))
            B_s = jnp.transpose(B_m, (2, 1, 3, 0))[..., None]
            C_s = jnp.transpose(C_m, (2, 1, 3, 0))[..., None]
            return fwd(u_s, d_s, A_s, B_s, C_s, Dv, bias)

        def mk(seed):
            u, delta, A_s, Bm, Cm, Dv, bias, _ = make_inputs_seq(seed)
            u_m = jnp.transpose(u, (2, 1, 0, 3))       # (8, L, G, Dg)
            d_m = jnp.transpose(delta, (2, 1, 0, 3))
            B_m = jnp.transpose(Bm[..., 0], (3, 1, 0, 2))  # (8, L, G, N)
            C_m = jnp.transpose(Cm[..., 0], (3, 1, 0, 2))
            return u_m, d_m, A_s, B_m, C_m, Dv, bias

        fn, make = wrapped, mk
    else:
        fn, make = fwd, lambda seed: make_inputs_seq(seed)[:7]

    @jax.jit
    def run_n(u, d, A_s, Bm, Cm, Dv, bias):
        def body(i, u):
            y = fn(u, d, A_s, Bm, Cm, Dv, bias)
            return u + y.reshape(u.shape).astype(u.dtype) * 1e-6
        return fn(jax.lax.fori_loop(0, ITERS - 1, body, u),
                  d, A_s, Bm, Cm, Dv, bias)

    args0 = make(0)
    jax.block_until_ready(run_n(*args0))
    ts = []
    for rep in range(REPEATS):
        args = make(rep + 1)
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        y = run_n(*args)
        _ = float(jnp.sum(y[0, 0].astype(jnp.float32)))
        jax.block_until_ready(y)
        ts.append(time.perf_counter() - t0)
    return min(ts) / ITERS


def main():
    names = sys.argv[1:] or ["v20_seq"]
    cfgs = {
        "v20_seq": dict(unroll=1),
        "v20_seq_u4": dict(unroll=4),
        "v20_seq_u8": dict(unroll=8),
        "v20_seq_c1024": dict(unroll=1, chunk=1024),
        "v20_seq_c128": dict(unroll=1, chunk=128),
        "v20_seq_rev": dict(unroll=1, reverse=True),
        "v21_win8": dict(win=8),
        "v21_win16": dict(win=16),
        "v21_win8_c1024": dict(win=8, chunk=1024),
        "v21_win8_rev": dict(win=8, reverse=True),
        "v20_seq_u8c1024": dict(unroll=8, chunk=1024),
    }
    for name in names:
        cfg = dict(cfgs[name])
        chunk = cfg.pop("chunk", CHUNK)
        fwd = build_seq(chunk=chunk, **cfg)
        row = {"variant": name}
        try:
            err, rel = parity(chunk=chunk, **cfg)
            row["max_abs_err"] = round(err, 5)
            row["rel_err"] = round(rel, 6)
            if not INTERPRET:
                t = time_fwd(fwd)
                row["ms"] = round(t * 1e3, 3)
                row["gelem_per_s"] = round(B * L * DIM * N / t / 1e9, 2)
                t2 = time_fwd(fwd, relayout=True)
                row["ms_with_relayout"] = round(t2 * 1e3, 3)
        except Exception as e:  # noqa: BLE001
            row["error"] = repr(e)[:300]
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
