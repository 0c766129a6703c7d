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

Timeout discipline (round-4, after BENCH_r03 lost its number to a driver
timeout): the ONE headline JSON line is printed and flushed IMMEDIATELY
after the throughput timing. Diagnostics (kernel parity, scan-ablation
decomposition, roofline probes, train step) run afterwards under a
wall-clock budget (`VMAMBAIR_BENCH_BUDGET_S`, default 1600 s from process
start); sections that would start over budget are skipped and listed in
`detail.skipped`. Results are checkpointed to `BENCH_DETAILS.json` next to
this file after every section; stdout carries exactly ONE JSON line total,
so any parser convention (first/last/sole line) records the same number.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

_T0 = time.monotonic()


def _mark(msg):
    # progress to stderr (the driver consumes only the stdout JSON lines)
    print(f"[bench +{time.monotonic() - _T0:.0f}s] {msg}",
          file=sys.stderr, flush=True)


BASELINE_MPS = 10.0  # estimated A100 reference, output MP/s (see docstring)

TILE = int(os.environ.get("VMAMBAIR_BENCH_TILE", "128"))
BATCH = int(os.environ.get("VMAMBAIR_BENCH_BATCH", "8"))
SCALE = 4
WARMUP = 2
ITERS = 17
REPEATS = 3
BUDGET_S = float(os.environ.get("VMAMBAIR_BENCH_BUDGET_S", "1600"))


def _over_budget(section, skipped):
    """True (and records the section) if the diagnostics budget is spent."""
    if time.monotonic() - _T0 > BUDGET_S:
        _mark(f"skip {section}: over {BUDGET_S:.0f}s budget")
        skipped.append(section)
        return True
    return False


def _attempts(section, n=3):
    """Retry generator for transient axon-tunnel failures (remote_compile
    HTTP stream aborts, RTT timeouts): yields attempt indices; the caller
    breaks on success. Sleeps between attempts to let the tunnel recover."""
    for i in range(n):
        if i:
            _mark(f"{section}: transient failure, retry {i}")
            time.sleep(10)
        yield i


def bench_train_step(net, params):
    """Training-step throughput (VERDICT r2 #1): jitted L1 value_and_grad +
    adam on MambaSISR6 at the S1 recipe shapes (256^2 GT crops, batch
    8/chip, `SRGAN/options/MambaSISR15_x4.yml:29-31`), chained-fori
    protocol. Also times the forward-only loss under the same protocol to
    report the backward/forward ratio (Pallas reverse-scan backward kernel
    vs the pre-r3 ~20x XLA recompute)."""
    err = {}
    for _ in _attempts("train step"):
        try:
            return _train_step_once(net, params)
        except Exception as e:  # noqa: BLE001
            err = {"train_step_error": repr(e)[:200]}
    return err


def _train_step_once(net, params):
    import optax

    lq = jax.random.uniform(jax.random.PRNGKey(1), (8, 64, 64, 3),
                            jnp.float32)
    gt = jax.random.uniform(jax.random.PRNGKey(2), (8, 256, 256, 3),
                            jnp.float32)
    tx = optax.adam(2e-4)
    opt_state = tx.init(params)

    def loss_fn(p, lq, gt):
        y = net.apply(p, lq)
        return jnp.mean(jnp.abs(y.astype(jnp.float32) - gt))

    def step(params, opt_state, lq, gt):
        loss, grads = jax.value_and_grad(loss_fn)(params, lq, gt)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    n = 6

    @jax.jit
    def run_train(params, opt_state, lq, gt):
        def body(i, c):
            p, o, _ = step(c[0], c[1], lq + c[2] * 1e-9, gt)
            return (p, o, c[2] + 1.0)
        p, o, _ = jax.lax.fori_loop(
            0, n - 1, body, (params, opt_state, 0.0))
        return step(p, o, lq, gt)

    @jax.jit
    def run_fwd(params, lq, gt):
        def body(i, c):
            return (c[0] + loss_fn(params, lq + c[1] * 1e-9, gt), c[1] + 1.0)
        acc, _ = jax.lax.fori_loop(0, n - 1, body, (0.0, 0.0))
        return acc + loss_fn(params, lq, gt)

    def timed(fn, fetch, *args):
        jax.block_until_ready(fn(*args))  # compile
        ts = []
        for rep in range(REPEATS):
            lqr = jax.random.uniform(
                jax.random.PRNGKey(50 + rep), (8, 64, 64, 3),
                jnp.float32)
            jax.block_until_ready(lqr)
            a = (args[0],) + args[1:-2] + (lqr, args[-1])
            t0 = time.perf_counter()
            out = fn(*a)
            _ = fetch(out)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        return min(ts) / n

    t_train = timed(run_train, lambda o: float(o[2]),
                    params, opt_state, lq, gt)
    t_fwd = timed(run_fwd, float, params, lq, gt)
    return {
        "train_step_ms": round(t_train * 1e3, 2),
        "train_mps": round(8 * 256 * 256 / t_train / 1e6, 3),
        "fwd_loss_ms": round(t_fwd * 1e3, 2),
        "bwd_fwd_ratio": round(max(t_train - t_fwd, 0.0) / t_fwd, 2),
    }


def bench_train_step_reduced():
    """Budgeted IN-DRIVER train-step timing (VERDICT r4 missing #4 /
    next #6): the same chained value_and_grad + adam protocol as
    `bench_train_step`, on a REDUCED MambaSISR6 (num_blocks [2,1,1,1] +
    2 refinement at dim 48 — 9 OSS blocks vs the flagship's 48) whose
    backward compiles inside the bench budget. The full-size train
    numbers remain tools/ptrain.py's offline measurements; this gives
    the driver a train-step number it re-measures every round. Shapes
    are the S1 recipe's (lq 64^2, batch 8, x4)."""
    err = {}
    for _ in _attempts("train step reduced"):
        try:
            from vmambair_tpu.models import build_network

            net = build_network(dict(
                type="OSSNet", scale=4, dim=48, num_blocks=[2, 1, 1, 1],
                num_refinement_blocks=2, dtype=jnp.bfloat16))
            params = jax.jit(net.init)(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 64, 64, 3), jnp.float32))
            out = _train_step_once(net, params)
            out = {k.replace("train_", "train_reduced_")
                    .replace("fwd_loss", "train_reduced_fwd_loss")
                    .replace("bwd_fwd", "train_reduced_bwd_fwd"): v
                   for k, v in out.items()}
            out["train_reduced_measured_at"] = time.strftime(
                "%Y-%m-%dT%H:%M:%S")
            return out
        except Exception as e:  # noqa: BLE001
            err = {"train_reduced_error": repr(e)[:200]}
    return err


def bench_scan_ablation(net, params, x, dt_full):
    """Directly measured step decomposition (VERDICT r3 #2): time the SAME
    chained-inference graph with every scan replaced by a one-pass
    elementwise stand-in (operands kept live so XLA cannot dead-code the
    surrounding graph). scan_bundle = spatial scan kernels INCLUDING their
    in-kernel MXU projections (the fused kernel computes x_proj/dt_proj
    internally, so they cannot be separated from the recurrence here) plus
    the tiny channel scans. By construction
    `scan_bundle_ms + other_ms == step_ms`, and the empirical ceiling
    `scan_only_mps` (throughput if other_ms were zero) is what the r3
    analytic roofline contradicted."""
    err = {}
    for _ in _attempts("scan ablation"):
        try:
            return _scan_ablation_once(net, params, x, dt_full)
        except Exception as e:  # noqa: BLE001
            err = {"ablation_error": repr(e)[:200]}
    return err


def _scan_ablation_once(net, params, x, dt_full):
    import functools

    import vmambair_tpu.models.oss as oss_mod

    real_ss = oss_mod.selective_scan
    real_fused = oss_mod.oss_scan_fused

    def ablate_ss(u, delta, A, B, C, D=None, delta_bias=None, **kw):
        # consume every operand through near-zero-cost reductions so the
        # producing einsums stay in the graph; one elementwise pass over u
        # keeps the y-shaped I/O floor
        eps = (jnp.sum(A) + jnp.sum(B[0, 0]) + jnp.sum(C[0, 0])) * 1e-12
        return (u.astype(jnp.float32) * (1.0 + eps)).astype(u.dtype)

    def ablate_fused(u2, xw, dw, db, A, Ds, softplus=True, reverse=False,
                     interpret=False, dl=False, **kw):
        eps = (jnp.sum(xw) + jnp.sum(dw) + jnp.sum(A)) * 1e-12
        return (u2.astype(jnp.float32) * (1.0 + eps)).astype(u2.dtype)

    oss_mod.selective_scan = ablate_ss
    oss_mod.oss_scan_fused = ablate_fused
    try:
        @functools.partial(jax.jit, static_argnums=(2,))
        def run_abl(params, x, n):
            def body(i, xin):
                y = net.apply(params, xin)
                return y[:, :TILE, :TILE, :]
            return net.apply(params, jax.lax.fori_loop(0, n - 1, body, x))

        _mark("compile scan-ablated model")
        jax.block_until_ready(run_abl(params, x, 1))
        jax.block_until_ready(run_abl(params, x, ITERS))
        _mark("timing scan-ablated model")

        def timed(n, seed):
            xi = jax.random.uniform(
                jax.random.PRNGKey(seed), (BATCH, TILE, TILE, 3),
                jnp.float32)
            jax.block_until_ready(xi)
            t0 = time.perf_counter()
            y = run_abl(params, xi, n)
            _ = float(jnp.sum(y[0, :2, :2, 0]))
            jax.block_until_ready(y)
            return time.perf_counter() - t0

        t_one_a = min(timed(1, 301 + i) for i in range(REPEATS))
        t_n_a = min(timed(ITERS, 701 + i) for i in range(REPEATS))
        dt_abl = max(t_n_a - t_one_a, 1e-9) * ITERS / (ITERS - 1)
    finally:
        oss_mod.selective_scan = real_ss
        oss_mod.oss_scan_fused = real_fused

    step_ms = dt_full / ITERS * 1e3
    other_ms = dt_abl / ITERS * 1e3
    scan_ms = max(step_ms - other_ms, 1e-9)
    out_mp = BATCH * (TILE * SCALE) ** 2 / 1e6
    return {
        "step_ms": round(step_ms, 1),
        "scan_bundle_ms": round(scan_ms, 1),
        "other_ms": round(other_ms, 1),
        "scan_share": round(scan_ms / step_ms, 3),
        "scan_only_mps": round(out_mp / (scan_ms / 1e3), 2),
    }


def bench_roofline(net, params, x, measured_mps, ablation):
    """Roofline diagnostics, reconciled (VERDICT r3 weak #2).

    The binding ceiling reported (`roofline_mps`) is now the EMPIRICAL one:
    the measured scan-ablation decomposition's `scan_only_mps` (throughput
    if all non-scan time were zero) — by construction it is consistent with
    the step decomposition. The r3 analytic bound
    (access_rate_probe / (25 accesses/elem * elems/px)) is kept as
    `access_floor_mps`, a diagnostic: the round-3 discrepancy (measured
    scan-only rate ABOVE the analytic floor) means the dependent-chain
    probe under-measures the rate the pipelined kernel actually sustains;
    `kernel_achieved_tacc_s` quantifies that directly from the ablation.
    """
    err = {}
    for _ in _attempts("roofline"):
        try:
            return _roofline_once(net, params, x, measured_mps, ablation)
        except Exception as e:  # noqa: BLE001
            err = {"roofline_error": repr(e)[:200]}
    return err


# Minimum VMEM accesses per (b,l,d,n) element of the log-domain
# formulation at SUBCHUNK=128: 7 Hillis steps x (read operand + read
# shifted operand + write result) = 21, plus read Bu + write weighted
# value (pack) + read + write y (exp2 unpack) = 4. sd-window traffic,
# carry folds, projections and HBM DMA are overhead ON TOP.
MIN_ACCESSES_PER_ELEM = 25


def _roofline_once(net, params, x, measured_mps, ablation):
    import vmambair_tpu.models.oss as oss_mod

    counts = {"elems": 0}
    real_ss = oss_mod.selective_scan
    real_fused = oss_mod.oss_scan_fused

    def count_ss(u, delta, A, B, C, *a, **kw):
        counts["elems"] += (
            u.shape[0] * u.shape[1] * u.shape[2] * A.shape[1]
        )
        return real_ss(u, delta, A, B, C, *a, **kw)

    def count_fused(u2, xw, dw, db, A, Ds, **kw):
        if kw.get("dl"):
            b, g, d, l = u2.shape
        else:
            b, l, g, d = u2.shape
        counts["elems"] += b * l * g * d * A.shape[2]
        return real_fused(u2, xw, dw, db, A, Ds, **kw)

    oss_mod.selective_scan = count_ss
    oss_mod.oss_scan_fused = count_fused
    try:
        jax.eval_shape(net.apply, params, x)
    finally:
        oss_mod.selective_scan = real_ss
        oss_mod.oss_scan_fused = real_fused
    out_px = x.shape[0] * (x.shape[1] * SCALE) * (x.shape[2] * SCALE)
    elems_per_px = counts["elems"] / out_px

    # dependent-chain access-rate probe (diagnostic; see docstring). The
    # tunnel adds 50-3000ms of RTT per dispatch, so the rate comes from
    # the TIME DIFFERENCE between a long and a short chain.
    probe_shape = (8, 512, 1024)  # 16MB fp32: VMEM-resident per fusion
    K_LO, K_HI = 1024, 16384
    PROBE_REPEATS = 5

    def make_probe(K, body):
        @jax.jit
        def probe(b0, s):
            return jax.lax.fori_loop(0, K, body, b0)
        return probe

    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    s = jax.random.uniform(ks[1], probe_shape, jnp.float32)

    def fma_body(i, b):
        return b * 0.999 + s * 1e-4

    def measure(body):
        probes = {k: make_probe(k, body) for k in (K_LO, K_HI)}

        def time_k(K, rep):
            b0r = jax.random.normal(
                jax.random.PRNGKey(60 + 7 * K + rep), probe_shape,
                jnp.float32)
            jax.block_until_ready(b0r)
            t0 = time.perf_counter()
            out = probes[K](b0r, s)
            _ = float(out[0, 0, 0])
            jax.block_until_ready(out)
            return time.perf_counter() - t0

        for k in (K_LO, K_HI):
            time_k(k, 99)  # compile + warm
        t_lo = min(time_k(K_LO, r) for r in range(PROBE_REPEATS))
        t_hi = min(time_k(K_HI, r) for r in range(PROBE_REPEATS))
        n_elems = probe_shape[0] * probe_shape[1] * probe_shape[2]
        return n_elems * (K_HI - K_LO) / max(t_hi - t_lo, 1e-9)

    access_rate = 3.0 * measure(fma_body)
    access_floor_mps = access_rate / (
        MIN_ACCESSES_PER_ELEM * elems_per_px) / 1e6

    out = {
        "elems_per_out_px": round(elems_per_px, 1),
        "vmem_access_rate_probe_tacc_s": round(access_rate / 1e12, 3),
        "access_floor_mps": round(access_floor_mps, 2),
    }
    scan_only = (ablation or {}).get("scan_only_mps")
    if scan_only:
        # rate the scan bundle actually sustained, at the formulation's
        # 25-access minimum per element (a LOWER bound on the real rate:
        # the bundle also spends accesses on projections/carries)
        achieved = (
            scan_only * 1e6 * elems_per_px * MIN_ACCESSES_PER_ELEM / 1e12
        )
        out.update({
            "kernel_achieved_tacc_s": round(achieved, 3),
            "roofline_mps": scan_only,
            "roofline_achieved_frac": round(measured_mps / scan_only, 3),
            "roofline_note": (
                "roofline_mps = measured scan-only ceiling from the "
                "ablation decomposition (step time with non-scan work "
                "removed); consistent by construction with "
                "scan_bundle_ms + other_ms = step_ms. access_floor_mps "
                "is the r3 analytic bound from the dependent-chain "
                "probe; kernel_achieved_tacc_s above the probe rate "
                "means the pipelined kernel sustains more VMEM traffic "
                "than a serial-dependent chain can, i.e. the probe was "
                "a miscalibrated ceiling (VERDICT r3 weak #2)"
            ),
        })
    else:
        out.update({
            "roofline_mps": round(access_floor_mps, 2),
            "roofline_achieved_frac": round(
                measured_mps / access_floor_mps, 3),
            "roofline_note": (
                "ablation section unavailable — falling back to the "
                "analytic access-floor ceiling (known to under-estimate "
                "the sustained rate; see VERDICT r3 weak #2)"
            ),
        })
    return out


def main():
    try:  # persist XLA compiles regardless of the ambient env (the full
        # bench compile set is ~30 min cold on this 1-core host)
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # noqa: BLE001
        pass

    from vmambair_tpu.models import build_network

    dtype = jnp.bfloat16 if os.environ.get(
        "VMAMBAIR_BENCH_DTYPE", "bf16") == "bf16" else jnp.float32
    # bf16 activations / fp32 weights + fp32 scan state — the production
    # inference posture (the reference's RealESRGANer offers fp16 half mode)
    _mark("build + init")
    net = build_network(dict(type="MambaSISR6", dtype=dtype))
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (BATCH, TILE, TILE, 3), jnp.float32)
    params = jax.jit(net.init)(key, x[:1])

    @jax.jit
    def run_n(params, x, n):
        # the iteration loop lives INSIDE jit: the axon tunnel adds
        # ~100ms+ RTT per dispatch and caches identical requests, so
        # per-call host loops measure the tunnel, not the chip. The trip
        # count is a TRACED scalar (fori_loop lowers to while_loop), so
        # ONE compiled program serves both the n=1 and n=ITERS timings —
        # the persistent compile cache misses across processes on the
        # axon backend (session-scoped cache key), so every bench run
        # pays the compile and halving it halves time-to-headline.
        def body(i, xin):
            y = net.apply(params, xin)
            return y[:, :TILE, :TILE, :]  # chain: output feeds next input
        return net.apply(params, jax.lax.fori_loop(0, n - 1, body, x))

    _mark("compile inference (single dynamic-trip-count program)")
    jax.block_until_ready(run_n(params, x, jnp.int32(1)))
    _mark("timing inference")

    def timed(n, seed):
        # fresh input per timed call — the tunnel caches identical requests
        xi = jax.random.uniform(
            jax.random.PRNGKey(seed), (BATCH, TILE, TILE, 3), jnp.float32
        )
        jax.block_until_ready(xi)
        t0 = time.perf_counter()
        y = run_n(params, xi, jnp.int32(n))
        # host fetch of a data-dependent scalar defeats response caching
        chk = float(jnp.sum(y[0, :2, :2, 0]))
        jax.block_until_ready(y)
        return time.perf_counter() - t0, chk

    # tunnel RTT is large and erratic: take the MIN over repeats of both
    # loop lengths, difference out the fixed dispatch cost
    t_one = min(timed(1, 101 + i)[0] for i in range(REPEATS))
    _mark("timing inference: chained loop")
    pairs = [timed(ITERS, 501 + i) for i in range(REPEATS)]
    t_n = min(p[0] for p in pairs)
    checksum = pairs[-1][1]
    dt = max(t_n - t_one, 1e-9) * ITERS / (ITERS - 1)

    out_mp = BATCH * (TILE * SCALE) ** 2 / 1e6
    mps = out_mp * ITERS / dt

    # MFU: per-step model FLOPs / step time / peak. Flops come from the
    # UNOPTIMIZED lowering's client-side cost analysis — no XLA compile.
    # (A compiled cost_analysis here used to cold-compile a fresh
    # unchained net.apply graph BEFORE the headline print — ~3 min on
    # this host, and the persistent cache never hits across processes on
    # the axon backend — which got bench killed mid-MFU: the BENCH_r03
    # lesson again.)
    _mark("mfu cost analysis (lowering only, no compile)")
    mfu_pct = None
    model_flops = None
    try:
        cost = (
            jax.jit(lambda p, xi: net.apply(p, xi))
            .lower(params, x).cost_analysis()
        )
        if isinstance(cost, (list, tuple)):
            cost = cost[0] if cost else {}
        flops = float((cost or {}).get("flops", 0.0))
        if flops > 0:
            model_flops = flops
    except Exception:  # noqa: BLE001 — cost analysis is best-effort
        pass
    if model_flops is None:
        # the axon backend's lowering analysis returns nothing; fall back
        # to the flops constant cached by a previous full run's budgeted
        # `mfu_flops` section (flops depend only on model + tile/batch)
        try:
            with open(os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "BENCH_DETAILS.json")) as f:
                prev = json.load(f)["detail"]
            if (prev.get("tile_in"), prev.get("batch")) == (TILE, BATCH):
                model_flops = float(prev["model_flops_per_step"])
        except Exception:  # noqa: BLE001
            pass
    if model_flops:
        step_t = dt / ITERS
        mfu_pct = round(100.0 * model_flops / step_t / 197e12, 3)  # v5e

    headline = {
        "metric": "x4_sr_tiled_inference_throughput",
        "value": round(mps, 3),
        "unit": "output_megapixels_per_sec_per_chip",
        "vs_baseline": round(mps / BASELINE_MPS, 3),
        "detail": {
            "tile_in": TILE, "batch": BATCH, "iters": ITERS,
            "seconds": round(dt, 3), "t_one": round(t_one, 3),
            "checksum": checksum,
            "mfu_pct_v5e_bf16": mfu_pct,
            "model_flops_per_step": model_flops,
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
        },
    }
    # surface the last measured train-step numbers in the driver-parsed
    # headline (measured post-headline by `bench_train_step_reduced` /
    # tools/ptrain.py; cached in BENCH_DETAILS.json like the MFU flops
    # constant, carried with their measurement timestamps)
    try:
        with open(os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "BENCH_DETAILS.json")) as f:
            prev = json.load(f)["detail"]
        for k in ("train_reduced_step_ms", "train_reduced_mps",
                  "train_reduced_bwd_fwd_ratio",
                  "train_reduced_measured_at",
                  "train_step_ms", "train_mps", "train_measured_at"):
            if k in prev:
                headline["detail"][k] = prev[k]
    except Exception:  # noqa: BLE001
        pass

    if os.environ.get("VMAMBAIR_BENCH_QUICK"):
        headline["detail"]["quick"] = True
        print(json.dumps(headline), flush=True)
        return

    # ---- the headline number is SAFE from here on (BENCH_r03 lesson):
    # print + flush it before any diagnostic compile can eat the budget
    print(json.dumps(headline), flush=True)
    _mark(f"headline emitted: {headline['value']} MP/s")

    detail = dict(headline["detail"])
    skipped = []

    def checkpoint_details():
        # persist after EVERY section so a kill at any point loses only
        # the in-flight section, never completed ones
        snap = dict(headline)
        snap["detail"] = dict(detail, skipped=list(skipped))
        try:
            side = os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "BENCH_DETAILS.json")
            with open(side, "w") as f:
                json.dump(snap, f, indent=1)
                f.write("\n")
        except Exception:  # noqa: BLE001
            pass

    # on-chip compiled-kernel parity: Pallas vs chunked-XLA scan (the CPU
    # suite only exercises interpret mode; this catches Mosaic-compile
    # divergence, VERDICT r1 Missing #4). Since round 5 the production
    # kernel is the matmul-dual, whose separated exponents are exact on
    # MODEL-REALISTIC inputs (delta post-softplus in the reference's
    # dt_init range [1e-3, 0.1], A = -(1..N)) but deliberately clamped on
    # the old synthetic hot deltas (~0.6/step — a regime the model never
    # produces; see `_scan_block_dual`). So: production parity is
    # measured on realistic inputs, and the exact HS kernel keeps the
    # original hot-input fp32 check as the Mosaic-miscompile guard.
    from vmambair_tpu.ops.pallas_scan import selective_scan

    def _parity_inputs(key, pb, pl_, pd, pn, pg, pdtype, realistic):
        ks = jax.random.split(key, 6)
        u = jax.random.normal(ks[0], (pb, pl_, pd), pdtype)
        if realistic:
            tgt = jnp.exp(jax.random.uniform(
                ks[1], (pb, pl_, pd), jnp.float32,
                minval=jnp.log(1e-3), maxval=jnp.log(0.1)))
            delta = jnp.log(jnp.expm1(tgt)).astype(pdtype)
            A = -jnp.tile(jnp.arange(1.0, pn + 1.0)[None], (pd, 1))
        else:
            delta = 0.5 * jax.random.uniform(ks[1], (pb, pl_, pd), pdtype)
            A = -0.5 - jnp.exp(jax.random.normal(ks[2], (pd, pn)) * 0.5)
        Bm = jax.random.normal(ks[3], (pb, pl_, pg, pn), pdtype)
        Cm = jax.random.normal(ks[4], (pb, pl_, pg, pn), pdtype)
        Dv = jax.random.normal(ks[5], (pd,), jnp.float32)
        return u, delta, A, Bm, Cm, Dv

    if not _over_budget("parity_unfused", skipped):
        try:
            def unfused_parity(pdtype, realistic=True, force_hs=False):
                args = _parity_inputs(
                    jax.random.PRNGKey(9), 2, 4096, 192, 16, 2, pdtype,
                    realistic)
                prev = os.environ.get("VMAMBAIR_SCAN_DUAL")
                if force_hs:
                    os.environ["VMAMBAIR_SCAN_DUAL"] = "0"
                try:
                    y_p = jax.jit(
                        lambda *a: selective_scan(*a, delta_softplus=True,
                                                  impl="pallas")
                    )(*args)
                finally:
                    if force_hs:
                        if prev is None:
                            del os.environ["VMAMBAIR_SCAN_DUAL"]
                        else:
                            os.environ["VMAMBAIR_SCAN_DUAL"] = prev
                y_x = jax.jit(
                    lambda *a: selective_scan(*a, delta_softplus=True,
                                              impl="xla")
                )(*args)
                num = float(jnp.max(jnp.abs(
                    y_p.astype(jnp.float32) - y_x.astype(jnp.float32))))
                den = float(jnp.max(jnp.abs(
                    y_x.astype(jnp.float32)))) + 1e-9
                return round(num / den, 8)

            _mark("parity unfused")
            detail["kernel_parity_rel_err_compiled"] = unfused_parity(
                jnp.bfloat16)
            detail["kernel_parity_rel_err_compiled_fp32"] = unfused_parity(
                jnp.float32)
            detail["kernel_parity_rel_err_compiled_hs_hot_fp32"] = (
                unfused_parity(jnp.float32, realistic=False, force_hs=True))
        except Exception as e:  # noqa: BLE001
            detail["parity_unfused_error"] = repr(e)[:200]
        checkpoint_details()

    if not _over_budget("parity_fused", skipped):
        try:
            from vmambair_tpu.ops.pallas_scan import oss_scan_fused

            _mark("parity fused")
            ks = jax.random.split(jax.random.PRNGKey(11), 6)
            fb, fl, fg, fd, fn, fr = 2, 4096, 2, 96, 16, 6
            u2 = jax.random.normal(ks[0], (fb, fl, fg, fd), jnp.bfloat16)
            xw = jax.random.normal(ks[1], (fg, fr + 2 * fn, fd),
                                   jnp.float32) * 0.2
            # realistic dt head: small data-dependent part + a bias whose
            # softplus lands in the reference dt_init range [1e-3, 0.1]
            dw = jax.random.normal(ks[2], (fg, fd, fr), jnp.float32) * 0.02
            db = jnp.log(jnp.expm1(jnp.exp(jax.random.uniform(
                ks[3], (fg, fd), jnp.float32,
                minval=jnp.log(1e-3), maxval=jnp.log(0.1)))))
            Af = -jnp.tile(
                jnp.arange(1.0, fn + 1.0)[None, None], (fg, fd, 1))
            Dsf = jax.random.normal(ks[5], (fg, fd), jnp.float32)
            fargs = (u2, xw, dw, db, Af, Dsf)
            y_f = jax.jit(lambda *a: oss_scan_fused(*a))(*fargs)

            from vmambair_tpu.ops.selective_scan import selective_scan_xla

            def fused_composite(u2, xw, dw, db, A, Ds):
                b, l, g, d = u2.shape
                N = A.shape[2]
                R = dw.shape[2]
                x_dbl = jnp.einsum("blgd,gcd->blgc", u2, xw)
                dts, Bs, Cs = jnp.split(x_dbl, [R, R + N], axis=-1)
                dts = jnp.einsum("blgr,gdr->blgd", dts, dw)
                y = selective_scan_xla(
                    u2.reshape(b, l, g * d), dts.reshape(b, l, g * d),
                    A.reshape(g * d, N), Bs, Cs, Ds.reshape(-1),
                    db.reshape(-1), delta_softplus=True,
                )
                return y.reshape(b, l, g, d).astype(u2.dtype)

            y_c = jax.jit(fused_composite)(*fargs)
            num = float(jnp.max(jnp.abs(
                y_f.astype(jnp.float32) - y_c.astype(jnp.float32))))
            den = float(jnp.max(jnp.abs(y_c.astype(jnp.float32)))) + 1e-9
            detail["kernel_parity_rel_err_compiled_fused"] = round(
                num / den, 8)
        except Exception as e:  # noqa: BLE001
            detail["parity_fused_error"] = repr(e)[:200]
        checkpoint_details()

    # compiled BACKWARD-kernel parity: every CPU test runs the Pallas
    # backward in interpret mode only, so a Mosaic-only miscompile in
    # _scan_bwd_kernel would corrupt training gradients with no signal —
    # grad through the kernel vs grad through the XLA composite, fp32,
    # at a shape bwd_scan_supported tiles (all 7 cotangents reduced)
    if not _over_budget("parity_backward", skipped):
        try:
            from vmambair_tpu.ops.pallas_scan import bwd_scan_supported

            _mark("parity backward")
            gb, gl, gd, gn, gg = 2, 2048, 64, 16, 2
            assert bwd_scan_supported(gl, gd, gg, gn)
            u_, delta_, A_, B_, C_, D_ = _parity_inputs(
                jax.random.PRNGKey(13), gb, gl, gd, gn, gg, jnp.float32,
                realistic=True)
            gargs = (u_, delta_, A_, B_, C_, D_,
                     jnp.zeros((gd,), jnp.float32))

            def grads_of(impl):
                def loss(*a):
                    y = selective_scan(*a, delta_softplus=True, impl=impl)
                    w = jnp.cos(0.37 * jnp.arange(y.size).reshape(y.shape))
                    return jnp.sum(y.astype(jnp.float32) * w)

                return jax.jit(
                    jax.grad(loss, argnums=tuple(range(7))))(*gargs)

            g_p = grads_of("pallas")
            g_x = grads_of("xla")
            num = max(
                float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                      - b.astype(jnp.float32))))
                for a, b in zip(g_p, g_x)
            )
            den = max(
                float(jnp.max(jnp.abs(b.astype(jnp.float32))))
                for b in g_x
            ) + 1e-9
            detail["kernel_parity_rel_err_compiled_grad"] = round(
                num / den, 8)
        except Exception as e:  # noqa: BLE001
            detail["parity_backward_error"] = repr(e)[:200]
        checkpoint_details()

    # train-step timing runs BEFORE the ablation/roofline diagnostics:
    # the driver artifact must carry a this-round train number (VERDICT
    # r4 #6); ablation numbers are stable across rounds once measured
    if not _over_budget("train_step_reduced", skipped):
        _mark("train step (reduced model)")
        detail.update(bench_train_step_reduced())
        checkpoint_details()

    ablation = None
    if not _over_budget("scan_ablation", skipped):
        ablation = bench_scan_ablation(net, params, x, dt)
        detail.update(ablation)
        checkpoint_details()

    if not _over_budget("roofline", skipped):
        _mark("roofline")
        detail.update(bench_roofline(net, params, x, mps, ablation))
        checkpoint_details()

    # refresh the cached flops constant the headline MFU reads (the axon
    # backend only reports flops from a COMPILED program, too slow to run
    # pre-headline; flops depend only on model + tile/batch so one full
    # run feeds every later run's headline)
    if not _over_budget("mfu_flops", skipped):
        _mark("mfu flops (compiled cost analysis)")
        try:
            cost = (
                jax.jit(lambda p, xi: net.apply(p, xi))
                .lower(params, x).compile().cost_analysis()
            )
            if isinstance(cost, (list, tuple)):
                cost = cost[0] if cost else {}
            flops = float((cost or {}).get("flops", 0.0))
            if flops > 0:
                detail["model_flops_per_step"] = flops
                detail["mfu_pct_v5e_bf16"] = round(
                    100.0 * flops / (dt / ITERS) / 197e12, 3)
        except Exception as e:  # noqa: BLE001
            detail["mfu_flops_error"] = repr(e)[:200]
        checkpoint_details()

    # the full-model value_and_grad compile has never finished inside a
    # bench run (45+ min through the tunnel; r3's driver died here) —
    # OPT-IN only; the recorded train numbers come from tools/ktrain.py
    if not os.environ.get("VMAMBAIR_BENCH_TRAIN"):
        skipped.append("train_step(opt-in: VMAMBAIR_BENCH_TRAIN=1)")
    elif not _over_budget("train_step", skipped):
        _mark("train step")
        detail.update(bench_train_step(net, params))
        checkpoint_details()

    detail["skipped"] = skipped
    detail["baseline_note"] = (
        "A100 baseline (10 MP/s) is an ESTIMATE from the model's "
        "~8 MFLOP/px + eager scan-chain launch overhead, NOT a "
        "measurement (the reference publishes no throughput "
        "numbers); vs_baseline is progress vs that fixed constant "
        "— headline numbers are MP/s and MFU"
    )
    enriched = dict(headline)
    enriched["detail"] = detail
    try:
        side = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_DETAILS.json")
        with open(side, "w") as f:
            json.dump(enriched, f, indent=1)
            f.write("\n")
    except Exception:  # noqa: BLE001
        pass
    # stdout carries EXACTLY ONE JSON line (the headline, already printed
    # and flushed right after timing); diagnostics live in
    # BENCH_DETAILS.json only, so any driver parser — first line, last
    # line, or sole line — sees the same record (ADVICE r3)
    _mark("done (diagnostics in BENCH_DETAILS.json)")


if __name__ == "__main__":
    main()
