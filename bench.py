#!/usr/bin/env python
"""Headline benchmark: x4 SR tiled-inference throughput (MP/s/chip).

Protocol (BASELINE.md): MambaSISR6 at its shipped full size
(`SRGAN/options/MambaSISR15_x4.yml:55-62`), static-shape tiled inference
(the reference's chop/tile path, `MambaSISR2_model.py:99-195`), bf16
activations / fp32 weights, batch of tiles filling one chip. Metric =
OUTPUT megapixels per second per chip.

`vs_baseline` divides by an A100 reference estimate (the repo publishes no
throughput numbers — BASELINE.json `published: {}`): 10 output-MP/s for the
PyTorch+CUDA-scan reference on A100 with the same tiling, derived from the
model's ~8 MFLOPs/input-pixel and eager-mode launch overhead of the 6+
kernel-launch scan chain. Held FIXED across rounds so the number tracks our
progress; >=2.0 means the >=2x A100 target is met.

Timing: iterations are CHAINED (each consumes the previous output) and the
final value is fetched to host, so the axon tunnel cannot cache or overlap
identical requests.
"""

import json
import time

import jax
import jax.numpy as jnp

BASELINE_MPS = 10.0  # estimated A100 reference, output MP/s (see docstring)

TILE = 128      # input tile (output 512x512)
BATCH = int(__import__("os").environ.get("VMAMBAIR_BENCH_BATCH", "8"))
SCALE = 4
WARMUP = 2
ITERS = 17
REPEATS = 3


def main():
    import os

    from vmambair_tpu.models import build_network

    dtype = jnp.bfloat16 if os.environ.get(
        "VMAMBAIR_BENCH_DTYPE", "bf16") == "bf16" else jnp.float32
    # bf16 activations / fp32 weights + fp32 scan state — the production
    # inference posture (the reference's RealESRGANer offers fp16 half mode)
    net = build_network(dict(type="MambaSISR6", dtype=dtype))
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (BATCH, TILE, TILE, 3), jnp.float32)
    params = jax.jit(net.init)(key, x[:1])

    import functools

    @functools.partial(jax.jit, static_argnums=(2,))
    def run_n(params, x, n):
        # the iteration loop lives INSIDE jit: the axon tunnel adds
        # ~100ms+ RTT per dispatch and caches identical requests, so
        # per-call host loops measure the tunnel, not the chip
        def body(i, xin):
            y = net.apply(params, xin)
            return y[:, :TILE, :TILE, :]  # chain: output feeds next input
        return net.apply(params, jax.lax.fori_loop(0, n - 1, body, x))

    # compile both loop lengths
    jax.block_until_ready(run_n(params, x, 1))
    jax.block_until_ready(run_n(params, x, ITERS))

    def timed(n, seed):
        # fresh input per timed call — the tunnel caches identical requests
        xi = jax.random.uniform(
            jax.random.PRNGKey(seed), (BATCH, TILE, TILE, 3), jnp.float32
        )
        jax.block_until_ready(xi)
        t0 = time.perf_counter()
        y = run_n(params, xi, n)
        # host fetch of a data-dependent scalar defeats response caching
        chk = float(jnp.sum(y[0, :2, :2, 0]))
        jax.block_until_ready(y)
        return time.perf_counter() - t0, chk

    # tunnel RTT is large and erratic: take the MIN over repeats of both
    # loop lengths, difference out the fixed dispatch cost
    t_one = min(timed(1, 101 + i)[0] for i in range(REPEATS))
    pairs = [timed(ITERS, 501 + i) for i in range(REPEATS)]
    t_n = min(p[0] for p in pairs)
    checksum = pairs[-1][1]
    dt = max(t_n - t_one, 1e-9) * ITERS / (ITERS - 1)

    out_mp = BATCH * (TILE * SCALE) ** 2 / 1e6
    mps = out_mp * ITERS / dt

    # MFU: per-step model FLOPs (XLA cost analysis) / step time / peak
    mfu_pct = None
    try:
        cost = (
            jax.jit(lambda p, xi: net.apply(p, xi))
            .lower(params, x).compile().cost_analysis()
        )
        flops = float((cost or {}).get("flops", 0.0))
        if flops > 0:
            step_t = dt / ITERS
            mfu_pct = round(100.0 * flops / step_t / 197e12, 3)  # v5e bf16
    except Exception:  # noqa: BLE001 — cost analysis is best-effort
        pass

    # on-chip compiled-kernel parity: Pallas vs chunked-XLA scan at a hot
    # shape (the CPU suite only exercises interpret mode; this catches
    # Mosaic-compile divergence, VERDICT r1 Missing #4)
    parity_rel = None
    try:
        from vmambair_tpu.ops.pallas_scan import selective_scan

        ks = jax.random.split(jax.random.PRNGKey(9), 6)
        pb, pl_, pd, pn, pg = 2, 4096, 192, 16, 2
        u = jax.random.normal(ks[0], (pb, pl_, pd), jnp.bfloat16)
        delta = 0.5 * jax.random.uniform(ks[1], (pb, pl_, pd), jnp.bfloat16)
        A = -0.5 - jnp.exp(jax.random.normal(ks[2], (pd, pn)) * 0.5)
        Bm = jax.random.normal(ks[3], (pb, pl_, pg, pn), jnp.bfloat16)
        Cm = jax.random.normal(ks[4], (pb, pl_, pg, pn), jnp.bfloat16)
        Dv = jax.random.normal(ks[5], (pd,), jnp.float32)
        args = (u, delta, A, Bm, Cm, Dv)
        y_p = jax.jit(
            lambda *a: selective_scan(*a, delta_softplus=True,
                                      impl="pallas")
        )(*args)
        y_x = jax.jit(
            lambda *a: selective_scan(*a, delta_softplus=True, impl="xla")
        )(*args)
        num = float(jnp.max(jnp.abs(
            y_p.astype(jnp.float32) - y_x.astype(jnp.float32))))
        den = float(jnp.max(jnp.abs(y_x.astype(jnp.float32)))) + 1e-9
        parity_rel = round(num / den, 6)
    except Exception:  # noqa: BLE001
        pass

    print(json.dumps({
        "metric": "x4_sr_tiled_inference_throughput",
        "value": round(mps, 3),
        "unit": "output_megapixels_per_sec_per_chip",
        "vs_baseline": round(mps / BASELINE_MPS, 3),
        "detail": {
            "tile_in": TILE, "batch": BATCH, "iters": ITERS,
            "seconds": round(dt, 3), "t_one": round(t_one, 3),
            "checksum": checksum,
            "mfu_pct_v5e_bf16": mfu_pct,
            "kernel_parity_rel_err_compiled": parity_rel,
            "baseline_note": (
                "A100 baseline (10 MP/s) is an ESTIMATE from the model's "
                "~8 MFLOP/px + eager scan-chain launch overhead, NOT a "
                "measurement (the reference publishes no throughput "
                "numbers); vs_baseline is progress vs that fixed constant "
                "— headline numbers are MP/s and MFU"
            ),
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
