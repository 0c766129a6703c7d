#!/usr/bin/env python
"""Kernel/step micro-benchmark on the real TPU chip.

Times individual pieces of the hot path (the level-1 SpatialScan shapes of
MambaSISR6 at the bench tile protocol) with the chained-fori protocol from
bench.py: the repeat loop lives INSIDE jit (tunnel RTT ~0.1-3s per dispatch,
identical requests are response-cached), fresh PRNG inputs per timed call,
host-fetched checksum, min over repeats.

Usage: python tools/kbench.py [piece ...]
Pieces: model scan kernel xla_parts  (default: all)
"""

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp

# level-1 decoder/refinement shape at the bench protocol (B=8 tiles of 128^2)
B, H, W = 8, 128, 128
L = H * W
D = 96          # per-direction channels (dim*2 at level 1 decoder)
G = 2           # direction pairs per call
N = 16          # d_state = ceil(96/6)
R = 6           # dt_rank = ceil(96/16)
ITERS = 9
REPEATS = 3


def timed(fn, make_inputs, iters=ITERS, repeats=REPEATS, chain=None):
    """fn(x...) -> y; chain(y, x...) -> next x tuple (defaults to identity
    on arg 0 if shapes match)."""

    @jax.jit
    def run_n(*xs):
        def body(i, xs):
            y = fn(*xs)
            return chain(y, *xs) if chain else (y,) + xs[1:]
        xs = jax.lax.fori_loop(0, iters - 1, body, xs)
        return fn(*xs)

    x0 = make_inputs(0)
    y = jax.block_until_ready(run_n(*x0))  # compile
    ts = []
    for rep in range(repeats):
        xs = jax.block_until_ready(make_inputs(rep + 1))
        t0 = time.perf_counter()
        y = run_n(*xs)
        leaf = jax.tree_util.tree_leaves(y)[0]
        _ = float(jnp.sum(leaf[(0,) * (leaf.ndim - 1)][:1]))
        jax.block_until_ready(y)
        ts.append(time.perf_counter() - t0)
    return min(ts) / iters


def report(name, secs, work_elems=None):
    out = {"piece": name, "ms": round(secs * 1e3, 3)}
    if work_elems:
        out["gelem_per_s"] = round(work_elems / secs / 1e9, 2)
    print(json.dumps(out), flush=True)


def bench_model():
    from vmambair_tpu.models import build_network

    net = build_network(dict(type="MambaSISR6", dtype=jnp.bfloat16))
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (B, H, W, 3), jnp.float32)
    params = jax.jit(net.init)(key, x[:1])

    def fwd(params, x):
        y = net.apply(params, x)
        return y[:, :H, :W, :]

    def mk(seed):
        return (params,
                jax.random.uniform(jax.random.PRNGKey(seed), (B, H, W, 3)))

    t = timed(fwd, mk, chain=lambda y, p, x: (p, y))
    report("model_step", t)
    out_mp = B * (H * 4) ** 2 / 1e6
    print(json.dumps({"piece": "model_mps", "mps": round(out_mp / t, 3)}),
          flush=True)


def bench_model_ablate():
    """Model step with (a) xla scan, (b) scan bypassed -> time breakdown."""
    import vmambair_tpu.models.oss as oss_mod
    from vmambair_tpu.models import build_network

    real_scan = oss_mod.selective_scan

    def fake_scan(u, delta, A, Bm, Cm, D=None, delta_bias=None,
                  delta_softplus=False, return_last_state=False,
                  impl="auto", interpret=False, reverse=False):
        # stand-in with negligible cost but same shapes/dtypes
        return (u * D.astype(u.dtype)[None, None, :]
                + Bm.reshape(u.shape[0], u.shape[1], -1)[:, :, :1]
                * delta).astype(u.dtype)

    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (B, H, W, 3), jnp.float32)

    import os
    tags = os.environ.get("ABLATE", "pallas,bypass").split(",")
    # nochan: only the CHANNEL scans stubbed out (spatial scans real) —
    # isolates the cost of the 62 tiny L=C `impl="xla"` scans
    table = {"pallas": ("auto", None), "xla": ("xla", None),
             "bypass": ("auto", fake_scan), "nochan": ("auto", "chan")}
    real_fused = oss_mod.oss_scan_fused
    real_mds = oss_mod._multi_dir_scan

    def fake_mds(xs, *a, **kw):
        return xs * 0.9

    def fake_fused(u2, xw, dw, db, A, Ds, **kw):
        return (u2 * Ds[None, None]).astype(u2.dtype)

    for tag in tags:
        impl, patch = table[tag]
        if patch == "chan":
            oss_mod._multi_dir_scan = fake_mds
        elif patch is not None:
            oss_mod.selective_scan = patch
            oss_mod.oss_scan_fused = fake_fused
        try:
            net = build_network(dict(type="MambaSISR6", dtype=jnp.bfloat16,
                                     scan_impl=impl))
            params = jax.jit(net.init)(key, x[:1])

            def fwd(params, x):
                return net.apply(params, x)[:, :H, :W, :]

            def mk(seed):
                return (params, jax.random.uniform(
                    jax.random.PRNGKey(seed), (B, H, W, 3)))

            t = timed(fwd, mk, chain=lambda y, p, x: (p, y))
            out_mp = B * (H * 4) ** 2 / 1e6
            print(json.dumps({"piece": f"model_{tag}",
                              "ms": round(t * 1e3, 2),
                              "mps": round(out_mp / t, 3)}), flush=True)
        finally:
            oss_mod.selective_scan = real_scan
            oss_mod.oss_scan_fused = real_fused
            oss_mod._multi_dir_scan = real_mds


def _scan_inputs(seed, dl=False):
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    dim = G * D
    if dl:
        u = jax.random.normal(ks[0], (B, dim, L), jnp.bfloat16)
        delta = jax.random.normal(ks[1], (B, dim, L), jnp.bfloat16) * 0.1
        Bm = jax.random.normal(ks[2], (B, G, N, L), jnp.bfloat16)
        Cm = jax.random.normal(ks[3], (B, G, N, L), jnp.bfloat16)
    else:
        u = jax.random.normal(ks[0], (B, L, dim), jnp.bfloat16)
        delta = jax.random.normal(ks[1], (B, L, dim), jnp.bfloat16) * 0.1
        Bm = jax.random.normal(ks[2], (B, L, G, N), jnp.bfloat16)
        Cm = jax.random.normal(ks[3], (B, L, G, N), jnp.bfloat16)
    A = -jnp.exp(jax.random.normal(ks[4], (dim, N)) * 0.5)
    Dv = jnp.ones((dim,), jnp.float32)
    bias = jax.random.normal(ks[5], (dim,)) * 0.01
    return u, delta, A, Bm, Cm, Dv, bias


def bench_scan():
    """Full selective_scan call (channels-last API, incl. transposes)."""
    from vmambair_tpu.ops.pallas_scan import selective_scan

    def fn(u, delta, A, Bm, Cm, Dv, bias):
        return selective_scan(u, delta, A, Bm, Cm, Dv, bias,
                              delta_softplus=True, impl="pallas")

    def chain(y, u, *rest):
        return (y.astype(u.dtype),) + rest

    t = timed(fn, lambda s: _scan_inputs(s), chain=chain)
    report("selective_scan_full", t, work_elems=B * L * G * D * N)


def bench_kernel():
    """Raw DL-layout kernel only (no transposes/einsums)."""
    from vmambair_tpu.ops.pallas_scan import selective_scan_dl

    def fn(u, delta, A, Bm, Cm, Dv, bias):
        return selective_scan_dl(u, delta, A, Bm, Cm, Dv, bias,
                                 softplus=True)

    def chain(y, u, *rest):
        return (y.astype(u.dtype),) + rest

    t = timed(fn, lambda s: _scan_inputs(s, dl=True), chain=chain)
    report("pallas_kernel_dl", t, work_elems=B * L * G * D * N)


def bench_kernel_bwd():
    """Raw scan VJP cost at the hot shape: fwd-only loss vs fwd+grad
    through the Pallas backward kernel — reports the bwd/fwd ratio
    (pre-r3 XLA-recompute backward measured ~20x the forward).

    Grads are taken w.r.t. ALL 7 inputs with full-leaf sums so nothing
    the backward kernel computes can be DCE'd — an earlier argnums=(0,1)
    version of this probe reported 1.02x, not comparable with the
    in-context ~2.4x (tools/ktrain.py); the kernel's intrinsic work is
    ~22 vs 9 flops/element."""
    from vmambair_tpu.ops.pallas_scan import selective_scan

    def loss(u, delta, A, Bm, Cm, Dv, bias):
        y = selective_scan(u, delta, A, Bm, Cm, Dv, bias,
                           delta_softplus=True, impl="pallas")
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def fwd_only(u, delta, A, Bm, Cm, Dv, bias):
        return loss(u, delta, A, Bm, Cm, Dv, bias).reshape(1)

    def with_grad(u, delta, A, Bm, Cm, Dv, bias):
        l, g = jax.value_and_grad(loss, argnums=tuple(range(7)))(
            u, delta, A, Bm, Cm, Dv, bias)
        return (l + sum(jnp.sum(x.astype(jnp.float32)) for x in g)
                * 1e-12).reshape(1)

    def chain(y, u, *rest):
        return (u * (1.0 + 1e-9 * y[0]).astype(u.dtype),) + rest

    t_f = timed(fwd_only, lambda s: _scan_inputs(s), chain=chain)
    t_g = timed(with_grad, lambda s: _scan_inputs(s), chain=chain)
    report("scan_fwd_loss", t_f, work_elems=B * L * G * D * N)
    report("scan_fwd_plus_grad", t_g, work_elems=B * L * G * D * N)
    print(json.dumps({"piece": "scan_bwd_fwd_ratio",
                      "ratio": round((t_g - t_f) / t_f, 2)}), flush=True)


def bench_xla_parts():
    """The XLA ops around the kernel: projections + layout changes."""
    k = jax.random.PRNGKey(7)
    Wxp = jax.random.normal(k, (G, R + 2 * N, D), jnp.float32)
    Wdt = jax.random.normal(k, (G, D, R), jnp.float32)

    def proj(u2):
        x_dbl = jnp.einsum("blgd,gcd->blgc", u2, Wxp)
        dts, Bs, Cs = jnp.split(x_dbl, [R, R + N], axis=-1)
        dts = jnp.einsum("blgr,gdr->blgd", dts, Wdt)
        return dts, Bs, Cs

    def mk(seed):
        return (jax.random.normal(jax.random.PRNGKey(seed), (B, L, G, D),
                                  jnp.bfloat16),)

    t = timed(lambda u2: proj(u2), mk,
              chain=lambda y, u2: (u2 + y[0].astype(u2.dtype) * 0,))
    report("xla_projections", t)

    def transposes(u):
        u_dl = jnp.swapaxes(u, 1, 2)
        return jnp.swapaxes(u_dl * 1.000001, 1, 2)

    def mk2(seed):
        return (jax.random.normal(jax.random.PRNGKey(seed), (B, L, G * D),
                                  jnp.bfloat16),)

    t = timed(transposes, mk2, chain=lambda y, u: (y,))
    report("xla_transpose_pair", t)


PIECES = {
    "model": bench_model,
    "model_ablate": bench_model_ablate,
    "scan": bench_scan,
    "kernel": bench_kernel,
    "kernel_bwd": bench_kernel_bwd,
    "xla_parts": bench_xla_parts,
    # "trainstep" resolves via the globals() fallback in main()
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("pieces", nargs="*", default=list(PIECES))
    args = ap.parse_args()
    print(json.dumps({"backend": jax.default_backend(),
                      "device": str(jax.devices()[0])}), flush=True)
    for p in args.pieces:
        (PIECES.get(p) or globals()[f"bench_{p}"])()




def bench_trainstep():
    """Training-step time: jitted L1 value_and_grad + adam update on
    MambaSISR6 at the S1 recipe shapes (256^2 GT crops, batch 8/chip)."""
    import optax

    from vmambair_tpu.models import build_network

    net = build_network(dict(type="MambaSISR6", dtype=jnp.bfloat16))
    key = jax.random.PRNGKey(0)
    lq = jax.random.uniform(key, (8, 64, 64, 3), jnp.float32)
    gt = jax.random.uniform(key, (8, 256, 256, 3), jnp.float32)
    params = jax.jit(net.init)(key, lq[:1])
    tx = optax.adam(2e-4)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, lq, gt):
        def loss_fn(p):
            y = net.apply(p, lq)
            return jnp.mean(jnp.abs(y.astype(jnp.float32) - gt))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def run_n(params, opt_state, lq, gt, n=5):
        def body(i, c):
            p, o, _ = step(c[0], c[1], lq + c[2] * 1e-9, gt)
            return (p, o, c[2] + 1.0)
        p, o, i = jax.lax.fori_loop(0, n, body, (params, opt_state, 0.0))
        return step(p, o, lq, gt)

    import time as _t

    out = jax.block_until_ready(run_n(params, opt_state, lq, gt))
    ts = []
    for rep in range(3):
        lqr = jax.random.uniform(jax.random.PRNGKey(rep + 1),
                                 (8, 64, 64, 3), jnp.float32)
        jax.block_until_ready(lqr)
        t0 = _t.perf_counter()
        p, o, loss = run_n(params, opt_state, lqr, gt)
        _ = float(loss)
        jax.block_until_ready(p)
        ts.append(_t.perf_counter() - t0)
    t = min(ts) / 6
    print(json.dumps({"piece": "train_step", "ms": round(t * 1e3, 2),
                      "px_per_s_like": round(8 * 256 * 256 / t / 1e6, 3)}),
          flush=True)


if __name__ == "__main__":
    main()
