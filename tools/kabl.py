#!/usr/bin/env python
"""Non-scan component attribution for the x4 SR inference step (round 4).

bench.py's scan ablation (VERDICT r3 #2) splits the step into
scan_bundle_ms + other_ms; this tool attributes `other_ms` to components by
patching each one's flax `__call__` with a near-free stand-in (params stay
valid — flax tolerates unused params) and difference-timing the chained
step exactly like bench.py:

  dwconv  — every grouped (depthwise) Conv2d -> identity (same channels);
            removes the OSS 3x3 dwconv and the EFFN 254-ch dwconv
  norms   — every LayerNorm2d -> identity (block norm1/norm2, out_norm,
            channel_norm)
  effn    — FeedForward -> zeros (XLA then also DCEs norm2 feeding it)
  channel — ChannelScan -> ones gate
  scan    — bench.py's scan stand-in (consistency check vs BENCH_DETAILS)

Run on the real chip (ambient env): `python tools/kabl.py`.
Each ablation costs two XLA compiles through the tunnel (~minutes cold).
"""

import contextlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

TILE = int(os.environ.get("VMAMBAIR_BENCH_TILE", "128"))
BATCH = int(os.environ.get("VMAMBAIR_BENCH_BATCH", "8"))
ITERS = 17
REPEATS = 3


def _mark(m):
    print(f"[kabl] {m}", file=sys.stderr, flush=True)


@contextlib.contextmanager
def patched(*entries):
    """entries: (obj, attr, replacement). Restores on exit."""
    saved = [(o, a, getattr(o, a)) for o, a, _ in entries]
    try:
        for o, a, r in entries:
            setattr(o, a, r)
        yield
    finally:
        for o, a, v in saved:
            setattr(o, a, v)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # noqa: BLE001
        pass

    import functools

    import vmambair_tpu.models.layers as L
    import vmambair_tpu.models.oss as O
    from vmambair_tpu.models import build_network

    net = build_network(dict(type="MambaSISR6", dtype=jnp.bfloat16))
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (BATCH, TILE, TILE, 3), jnp.float32)
    params = jax.jit(net.init)(key, x[:1])

    def timed_step(tag):
        @functools.partial(jax.jit, static_argnums=(2,))
        def run_n(params, x, n):
            def body(i, xin):
                y = net.apply(params, xin)
                return y[:, :TILE, :TILE, :]
            return net.apply(params, jax.lax.fori_loop(0, n - 1, body, x))

        _mark(f"{tag}: compile")
        jax.block_until_ready(run_n(params, x, 1))
        jax.block_until_ready(run_n(params, x, ITERS))

        def t(n, seed):
            xi = jax.random.uniform(
                jax.random.PRNGKey(seed), (BATCH, TILE, TILE, 3),
                jnp.float32)
            jax.block_until_ready(xi)
            t0 = time.perf_counter()
            y = run_n(params, xi, n)
            _ = float(jnp.sum(y[0, :2, :2, 0]))
            jax.block_until_ready(y)
            return time.perf_counter() - t0

        t1 = min(t(1, 101 + i) for i in range(REPEATS))
        tn = min(t(ITERS, 501 + i) for i in range(REPEATS))
        step = max(tn - t1, 1e-9) / (ITERS - 1)
        _mark(f"{tag}: {step * 1e3:.1f} ms/step")
        return step * 1e3

    conv_call = L.Conv2d.__call__

    def conv_no_dw(self, x):
        if self.groups > 1:
            return x  # depthwise: same channel count -> identity
        return conv_call(self, x)

    def ln_identity(self, x):
        return x

    def ffn_zero(self, x):
        return jnp.zeros_like(x)

    def ffn_res_ident(self, x, ln_w, ln_b, eps=1e-5, interpret=False):
        # fused path stand-in: the residual branch contributes nothing
        e = (jnp.sum(ln_w) + jnp.sum(ln_b)) * 1e-12
        return (x.astype(jnp.float32) * (1.0 + e)).astype(x.dtype)

    def chan_ones(self, y2):
        b, h, w, c = y2.shape
        return jnp.ones((b, 1, 1, c), y2.dtype)

    def scan_ident(u, delta, A, B, C, D=None, delta_bias=None, **kw):
        eps = (jnp.sum(A) + jnp.sum(B[0, 0]) + jnp.sum(C[0, 0])) * 1e-12
        return (u.astype(jnp.float32) * (1.0 + eps)).astype(u.dtype)

    def fused_ident(u2, xw, dw, db, A, Ds, **kw):
        eps = (jnp.sum(xw) + jnp.sum(dw) + jnp.sum(A)) * 1e-12
        return (u2.astype(jnp.float32) * (1.0 + eps)).astype(u2.dtype)

    def tail_unsupported(shape, interpret=False):
        return False

    results = {"full": timed_step("full")}
    cases = {
        "no_dwconv": [(L.Conv2d, "__call__", conv_no_dw)],
        "no_norms": [(L.LayerNorm2d, "__call__", ln_identity)],
        "no_effn": [(L.FeedForward, "__call__", ffn_zero),
                    (L.FeedForward, "fused_residual", ffn_res_ident)],
        "no_channel": [(O.ChannelScan, "__call__", chan_ones)],
        "no_scan": [(O, "selective_scan", scan_ident),
                    (O, "oss_scan_fused", fused_ident)],
        # fused-vs-unfused OSS tail race (merge+out_norm+gate Pallas
        # kernel): `full - no_tailfuse` < 0 means the fusion WINS by
        # that many ms (reported tailfuse_ms is the fused path's cost
        # delta, negative = speedup)
        "no_tailfuse": [(O, "oss_tail_supported", tail_unsupported)],
    }
    only = sys.argv[1:] or list(cases)
    for tag in only:
        if tag == "full":
            continue  # always timed above; `kabl.py full` = step timing only
        with patched(*cases[tag]):
            results[tag] = timed_step(tag)

    full = results["full"]
    out = {"step_ms": round(full, 1)}
    for tag, ms in results.items():
        if tag == "full":
            continue
        out[tag.replace("no_", "") + "_ms"] = round(full - ms, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
