#!/usr/bin/env python
"""Train-step decomposition probe on the real TPU chip.

BENCH_r03 shows the model-level backward at ~2.9x the forward while the
raw scan-kernel VJP is ~1.0x — this probe splits the gap at the bench
train protocol (MambaSISR6, lq 8x64x64, L1 loss):

  fwd_loss        inference-path forward + loss (op(), no carry saving)
  vjp_fwd         TRAINING forward: jax.vjp primal — runs the
                  save_carries kernel build at the backward's chunking
  grad            full value_and_grad (no optimizer)
  grad_fakescan   value_and_grad with every scan op's VJP replaced by an
                  identity pass-through (du=g, zero weight grads): the
                  rest-of-model backward with the scan backward free

  scan bwd cost in context = grad - grad_fakescan
  carry-save fwd overhead  = vjp_fwd - fwd_loss

Timing protocol per CLAUDE.md: loop inside jit, fresh PRNG inputs per
timed call, host-fetched checksum, min over repeats.

Usage: python tools/ktrain.py [piece ...]   (default: all)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

BATCH, LQ = 8, 64
ITERS = 5
REPEATS = 3


def _build():
    from vmambair_tpu.models import build_network

    net = build_network(dict(type="MambaSISR6", dtype=jnp.bfloat16))
    key = jax.random.PRNGKey(0)
    lq0 = jax.random.uniform(key, (BATCH, LQ, LQ, 3), jnp.float32)
    params = jax.jit(net.init)(key, lq0[:1])
    gt = jax.random.uniform(jax.random.PRNGKey(2),
                            (BATCH, LQ * 4, LQ * 4, 3), jnp.float32)

    def loss_fn(p, lq):
        y = net.apply(p, lq)
        return jnp.mean(jnp.abs(y.astype(jnp.float32) - gt))

    return net, params, loss_fn


def _timed(step, params):
    """step(p, lq) -> scalar; chained fori loop inside jit."""

    n = ITERS

    @jax.jit
    def run_n(p, lq):
        def body(i, c):
            acc, bump = c
            return (acc + step(p, lq + bump * 1e-9), bump + 1.0)
        acc, _ = jax.lax.fori_loop(0, n - 1, body, (0.0, 0.0))
        return acc + step(p, lq)

    lq = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, LQ, LQ, 3),
                            jnp.float32)
    jax.block_until_ready(run_n(params, lq))  # compile
    ts = []
    for rep in range(REPEATS):
        lqr = jax.random.uniform(jax.random.PRNGKey(50 + rep),
                                 (BATCH, LQ, LQ, 3), jnp.float32)
        jax.block_until_ready(lqr)
        t0 = time.perf_counter()
        out = run_n(params, lqr)
        _ = float(out)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts) / n


def report(name, secs):
    print(json.dumps({"piece": name, "ms": round(secs * 1e3, 2)}),
          flush=True)
    return secs


def _grad_step(loss_fn):
    def step(p, lq):
        l, g = jax.value_and_grad(loss_fn)(p, lq)
        # touch EVERY grad leaf so XLA cannot DCE any weight-gradient
        # computation.  Full-leaf sums, NOT one-element slices: slicing a
        # single output channel makes XLA specialize the depthwise-conv
        # weight grad into a batch_group_count conv with a 1-channel
        # filter, which the TPU AOT compiler rejects ("output feature
        # dimension size 1 not a multiple of batch group count 96").
        leaves = jax.tree_util.tree_leaves(g)
        return l + sum(jnp.sum(x.astype(jnp.float32)) for x in leaves) * 1e-12
    return step


def _fake_scan_ops():
    """Identity-VJP stand-ins: real Pallas forward, free backward that
    passes the y-cotangent straight to u (same shape) and zeros for the
    rest — upstream layers still receive nonzero cotangents, so the
    rest-of-model backward is fully exercised."""
    import vmambair_tpu.models.oss as oss_mod

    real_ss = oss_mod.selective_scan
    real_fused = oss_mod.oss_scan_fused

    def _make_ss_id(reverse):
        @jax.custom_vjp
        def ss_id(u, delta, A, Bm, Cm, Dv, bias):
            # the REAL production forward (incl. D-skip and direction) so
            # grad_fakescan's forward matches fwd_loss exactly and the
            # decomposition subtraction is unbiased
            return real_ss(u, delta, A, Bm, Cm, D=Dv, delta_bias=bias,
                           delta_softplus=True, reverse=reverse)

        def ss_fwd(u, delta, A, Bm, Cm, Dv, bias):
            args = (u, delta, A, Bm, Cm, Dv, bias)
            return ss_id(*args), args

        def ss_bwd(res, g):
            u, delta, A, Bm, Cm, Dv, bias = res
            return (g.astype(u.dtype), jnp.zeros_like(delta),
                    jnp.zeros_like(A), jnp.zeros_like(Bm),
                    jnp.zeros_like(Cm), jnp.zeros_like(Dv),
                    jnp.zeros_like(bias))

        ss_id.defvjp(ss_fwd, ss_bwd)
        return ss_id

    ss_ids = {False: _make_ss_id(False), True: _make_ss_id(True)}

    def fake_ss(u, delta, A, Bm, Cm, D=None, delta_bias=None,
                delta_softplus=True, reverse=False, **kw):
        dim = u.shape[-1]
        if D is None:  # zeros == the reference's no-D-skip semantics
            D = jnp.zeros((dim,), jnp.float32)
        if delta_bias is None:
            delta_bias = jnp.zeros((dim,), jnp.float32)
        return ss_ids[bool(reverse)](u, delta, A, Bm, Cm, D, delta_bias)

    def _make_fused_id(reverse):
        @jax.custom_vjp
        def fused_id(u2, xw, dw, db, A, Ds):
            return real_fused(u2, xw, dw, db, A, Ds, softplus=True,
                              reverse=reverse)

        def fused_fwd(u2, xw, dw, db, A, Ds):
            args = (u2, xw, dw, db, A, Ds)
            return fused_id(*args), args

        def fused_bwd(res, g):
            u2, xw, dw, db, A, Ds = res
            return (g.astype(u2.dtype), jnp.zeros_like(xw),
                    jnp.zeros_like(dw), jnp.zeros_like(db),
                    jnp.zeros_like(A), jnp.zeros_like(Ds))

        fused_id.defvjp(fused_fwd, fused_bwd)
        return fused_id

    fused_ids = {False: _make_fused_id(False), True: _make_fused_id(True)}

    def fake_fused(u2, xw, dw, db, A, Ds, reverse=False, **kw):
        fid = fused_ids[bool(reverse)]
        if kw.get("dl"):
            # SpatialScan's shared-transpose path passes (B, G, D, L);
            # the identity stand-in works in L-major, so wrap in the
            # same transposes the real dl op elides
            u_blgd = jnp.transpose(u2, (0, 3, 1, 2))
            y = fid(u_blgd, xw, dw, db, A, Ds)
            return jnp.transpose(y, (0, 2, 3, 1))
        return fid(u2, xw, dw, db, A, Ds)

    return fake_ss, fake_fused


def main():
    pieces = sys.argv[1:] or ["fwd", "vjp_fwd", "grad", "grad_fakescan"]
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # noqa: BLE001
        pass
    net, params, loss_fn = _build()
    res = {}

    if "fwd" in pieces:
        res["fwd"] = report("fwd_loss", _timed(loss_fn, params))
    if "vjp_fwd" in pieces:
        def vjp_primal(p, lq):
            y, _ = jax.vjp(loss_fn, p, lq)
            return y
        res["vjp_fwd"] = report("vjp_fwd", _timed(vjp_primal, params))
    if "grad" in pieces:
        res["grad"] = report("grad", _timed(_grad_step(loss_fn), params))
    if "grad_fakescan" in pieces:
        import vmambair_tpu.models.oss as oss_mod

        real_ss = oss_mod.selective_scan
        real_fused = oss_mod.oss_scan_fused
        fake_ss, fake_fused = _fake_scan_ops()
        oss_mod.selective_scan = fake_ss
        oss_mod.oss_scan_fused = fake_fused
        try:
            net2, params2, loss2 = _build()
            res["grad_fakescan"] = report(
                "grad_fakescan", _timed(_grad_step(loss2), params2))
        finally:
            oss_mod.selective_scan = real_ss
            oss_mod.oss_scan_fused = real_fused

    if {"fwd", "vjp_fwd", "grad", "grad_fakescan"} <= res.keys():
        f, vf, g, gf = (res[k] for k in
                        ("fwd", "vjp_fwd", "grad", "grad_fakescan"))
        # grad          = vjp_fwd(carry-save) + scan_bwd + rest_bwd
        # grad_fakescan = fwd(inference path) + rest_bwd
        rest_bwd = gf - f
        print(json.dumps({
            "piece": "decomposition",
            "carry_save_fwd_overhead_ms": round((vf - f) * 1e3, 2),
            "rest_of_model_bwd_ms": round(rest_bwd * 1e3, 2),
            "scan_bwd_in_context_ms": round((g - vf - rest_bwd) * 1e3, 2),
            "model_bwd_fwd_ratio": round((g - f) / f, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
