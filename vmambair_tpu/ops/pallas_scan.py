"""Pallas TPU kernel for the selective scan.

TPU-native replacement for the reference CUDA kernels
(`/root/reference/Mamba/kernels/selective_scan/cus/selective_scan_fwd_kernel.cuh`).
Design mapping:

* CUDA grid (batch, dim) thread-blocks -> Pallas grid (batch, d_tiles, chunks)
  with the chunk axis innermost: TPU grids iterate sequentially, so the
  recurrent state h lives in a VMEM scratch buffer that persists across chunk
  steps (the CUDA kernel's smem `running_prefix`, `fwd_kernel.cuh:78,145-158`).
* CUDA 2048-element chunking with carried prefix (`selective_scan.cpp:217`)
  -> per-grid-step chunk of `chunk` positions, scanned with a log-domain
  Hillis-Steele over SUBCHUNK-lane spans (decay window-products carried as
  window-sums of delta, shared across states, exponentiated in the combine;
  see `_scan_kernel`) — fully vectorized on the 8x128 VPU.
* Layout: the kernel operates on (batch, D, L) — channel on sublanes (all
  VmambaIR inner dims are multiples of 8, so no sublane padding), sequence on
  lanes (chunk = lane multiples). Every broadcast in the recurrence is then
  native: A[:, n] is (D, 1) over lanes, B[n, :] is (1, chunk) over sublanes.
* fp32 scan state regardless of activation dtype (`fwd_kernel.cuh:39`,
  `selective_scan.cpp:167-168`).
* Backward: a hand-written Pallas reverse-scan kernel mirroring the CUDA
  backward (`cus/selective_scan_bwd_kernel.cuh:66-305`, `reverse_scan.cuh`):
  the forward saves the recurrent state at every chunk boundary (the CUDA
  `x` checkpoint array, `selective_scan.cpp:217-220`), and the backward
  walks chunks in the opposite order, re-running the forward scan within
  each chunk from the saved carry to recover h, reverse-scanning the output
  cotangent dh_t = C_t*dy_t + a_{t+1}*dh_{t+1} with the same log-domain
  Hillis-Steele (delta shifted by one; the cross-chunk edge decay is folded
  into the carried dh), and accumulating all seven gradients in one pass.
  The decay-weighted term uses the identity a_t*h_{t-1} = h_t - b_t, so no
  extra exp stack or h shift is materialized. dA/dD/dbias come out as
  per-batch partials (accumulated across the sequential chunk axis in VMEM,
  reduced over batch outside); shapes the kernel cannot tile fall back to
  recompute-through-XLA (`xla_equiv`).

B/C groups (the reference calls the scan with K=4 directions folded into the
channel axis and one B/C group per direction, `MambaSISR6_arch.py:409-424`)
are supported via the BlockSpec index map: each channel tile reads its
group's (N, chunk) stripe of B/C.

Kernel restrictions (wrapper falls back to `selective_scan_xla` otherwise):
N <= MAX_SCAN_N states (processed in MAX_N_STACK-state blocks), d_tile must
divide the per-group channel count, no last-state output, L divisible by a
reasonable power-of-two chunk.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .selective_scan import selective_scan_xla

MAX_SCAN_N = 256  # like the CUDA reference (`cus/selective_scan.cpp:11`)


def _softplus(x):
    # linearized above 20 like the reference (`fwd_kernel.cuh:117`)
    return jnp.where(x > 20.0, x, jnp.log1p(jnp.exp(jnp.minimum(x, 20.0))))


MAX_N_STACK = 16  # states scanned together per VMEM stack
SUBCHUNK = 128    # Hillis-Steele span (lanes); sequential carry across
LOG2E = 1.4426950408889634  # decays computed as exp2(A*log2e * sd)


def _scan_kernel(u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref,
                 y_ref, h_ref, *, nstate, chunk, softplus, reverse=False,
                 init=True):
    """One (batch, d_tile, chunk) grid step, (D, L) layout.

    Block shapes: u/d/y (1, Dt, chunk); A (N, Dt, 1) [pre-transposed];
    B/C (1, 1, N, chunk) [the group stripe for this d-tile]; Dskip/bias
    (Dt, 1); h scratch (N, Dt, 1) fp32.

    Algorithm ("log-domain" chunked scan, measured 1.7x the (a,b)-pair
    Hillis-Steele on v5e): within SUBCHUNK-lane spans the inclusive scan
    h_t = a_t h_{t-1} + b_t is computed by Hillis-Steele doubling where the
    decay window-products are carried as window-SUMS of delta (shared
    across the N states -> N-fold cheaper than an a-stack) and exponentiated
    on the fly: a_k[t] = exp(A * sum_{(t-k,t]} delta). The exponent is
    always <= 0, so this is exact and overflow-safe for any input
    (unlike cumsum-of-delta formulations, which explode on large delta).
    Subchunks chain sequentially through the (N, Dt, 1) carry; chunks chain
    through the VMEM h scratch across grid steps (the CUDA kernel's
    running_prefix, `fwd_kernel.cuh:78,145-158`).

    States are processed in blocks of MAX_N_STACK, supporting
    d_state <= 256-class sizes like the CUDA reference
    (`cus/selective_scan.cpp:11,191`) at bounded VMEM.
    """
    if init:
        c_idx = pl.program_id(2)

        @pl.when(c_idx == 0)
        def _():
            h_ref[...] = jnp.zeros_like(h_ref)

    d = d_ref[0].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)
    if softplus:
        d = _softplus(d)
    u = u_ref[0].astype(jnp.float32)
    y = _scan_core(
        d, u,
        A_ref[...].astype(jnp.float32),
        B_ref[0, 0].astype(jnp.float32),
        C_ref[0, 0].astype(jnp.float32),
        Dskip_ref[...].astype(jnp.float32),
        h_ref, nstate=nstate, chunk=chunk, reverse=reverse,
    )
    y_ref[0] = y.astype(y_ref.dtype)


def _scan_core(d, u, A_all, B_all, C_all, Dskip, h_ref, *, nstate, chunk,
               reverse):
    """The log-domain chunked scan shared by the plain and fused kernels.

    d/u: (Dt, chunk) fp32 (delta already biased+softplus'd); A_all
    (N, Dt, 1); B_all/C_all (N, chunk); Dskip (Dt, 1); h_ref VMEM scratch
    (N, Dt, 1) fp32 carrying state across the chunk grid axis. Returns
    y (Dt, chunk) fp32.

    Decays are computed as exp2(A*log2e * sd) (measured faster than exp on
    v5e), and the incoming subchunk carry is folded into the boundary
    element of b before the Hillis-Steele, so no full-width P*carry combine
    is needed (both changes are exact).

    Formulation bound (r3, tools/kvariants.py at the hot shape, v5e):
    Hillis-Steele's O(n log n) combines are OPTIMAL here — a VPU op below
    128 lanes costs the same issue slots as a full-width op, so
    work-efficient trees only add levels: Brent-Kung via masked full-width
    updates (v15b) measured 16.8 ms vs 12.4 production, and the
    narrow-level form (v15) dies in Mosaic ('Invalid type' — no strided
    lane addressing). A combined fwd+rev single pass (v16 probe, 20.9 ms
    vs 24.8 for two calls) loses its margin to the suffix-decay correction
    the probe omits plus doubled B/C traffic, and the fused path shares
    only the u2 read to begin with. bench.py's hardened access-rate probe
    (difference-timed, min-over-repeats; an earlier combine-rate probe
    was tunnel noise — see BASELINE.md's round-3 correction) puts this
    formulation's ceiling at ~3.7-3.8 MP/s model throughput; the kernel
    runs at ~97% of it.
    """
    du = d * u
    y = Dskip * u  # (Dt, chunk)

    dual = _dual_cfg()  # read at trace time; kernels cache per-process env
    h0_all = h_ref[...].astype(jnp.float32)     # (N, Dt, 1)
    carries = []
    for n0 in range(0, nstate, MAX_N_STACK):
        n1 = min(n0 + MAX_N_STACK, nstate)
        # pre-scaled for exp2 (measured faster than exp on v5e; exact):
        A_t = A_all[n0:n1] * LOG2E              # (nb, Dt, 1)
        B_blk = B_all[n0:n1]                    # (nb, chunk)
        C_blk = C_all[n0:n1]
        b_full = du[None] * B_blk[:, None, :]   # (nb, Dt, chunk)
        if dual:
            h_all, carry = _scan_block_dual(
                A_t, d, b_full, h0_all[n0:n1], reverse=reverse, blk=dual
            )
        else:
            h_all, carry = _scan_block(
                A_t, d, b_full, h0_all[n0:n1], reverse=reverse
            )
        carries.append(carry)
        y = y + jnp.sum(C_blk[:, None, :] * h_all, axis=0)

    h_ref[...] = (carries[0] if len(carries) == 1
                  else jnp.concatenate(carries, axis=0))
    return y


def _scan_block(A_t, d, b_full, carry, *, reverse):
    """Log-domain chunked inclusive scan for ONE <=MAX_N_STACK state block.

    Computes h_t = exp2(A_t * d_t) * h_{t-1} + b_t (or the right-to-left
    mirror h_t = exp2(A_t * d_t) * h_{t+1} + b_t when reverse) over the lane
    axis. A_t (nb, Dt, 1) already scaled by LOG2E; d (Dt, chunk) fp32;
    b_full (nb, Dt, chunk); carry (nb, Dt, 1) = h just outside the scanned
    edge. Returns (h_all (nb, Dt, chunk), carry_out (nb, Dt, 1) = h at the
    final scanned element).
    """
    nb, dt, chunk = b_full.shape
    sub = min(SUBCHUNK, chunk)
    n_steps = int(math.log2(sub))
    assert (1 << n_steps) == sub, "chunk must be a power of two"

    sub_slices = [slice(i * sub, (i + 1) * sub) for i in range(chunk // sub)]
    if reverse:
        sub_slices = sub_slices[::-1]

    pieces = []
    for sl in sub_slices:
        # the incoming carry h_{-1} is FOLDED into the boundary
        # element: b_edge += a_edge * h_{-1} makes the plain inclusive
        # scan of b produce h directly — this replaces the full-width
        # P*carry combine (exp-mul + exp + FMA per element) with
        # (nb, Dt, 1)-narrow ops at the subchunk edge
        edge = sl.stop - 1 if reverse else sl.start
        d_e = d[:, edge : edge + 1]
        b_e = (b_full[:, :, edge : edge + 1]
               + jnp.exp2(A_t * d_e[None]) * carry)
        if reverse:
            b = jnp.concatenate(
                [b_full[:, :, sl.start : edge], b_e], axis=2)
        else:
            b = jnp.concatenate(
                [b_e, b_full[:, :, edge + 1 : sl.stop]], axis=2)
        sd = d[:, sl]
        for s in range(n_steps):
            k = 1 << s
            e = jnp.exp2(A_t * sd[None])  # a_k in (0, 1]
            zb = jnp.zeros((nb, dt, k), jnp.float32)
            if reverse:
                b_prev = jnp.concatenate([b[:, :, k:], zb], axis=2)
            else:
                b_prev = jnp.concatenate([zb, b[:, :, :-k]], axis=2)
            b = e * b_prev + b
            if s < n_steps - 1:  # final sd only fed the old P combine
                zs = jnp.zeros((dt, k), jnp.float32)
                if reverse:
                    sd = sd + jnp.concatenate([sd[:, k:], zs], axis=1)
                else:
                    sd = sd + jnp.concatenate([zs, sd[:, :-k]], axis=1)
        h_i = b
        out_edge = 0 if reverse else sub - 1
        carry = h_i[:, :, out_edge : out_edge + 1]
        pieces.append(h_i)
    if reverse:
        pieces = pieces[::-1]
    h_all = (pieces[0] if len(pieces) == 1
             else jnp.concatenate(pieces, axis=2))
    return h_all, carry


def _dual_cfg():
    """Matmul-dual dispatch config, read at kernel-build time.

    Returns None (log-domain Hillis-Steele, the round-2..4 production
    formulation) or an int `blk` — the shift-block size of the MXU
    matmul-dual (`_scan_block_dual`). Env `VMAMBAIR_SCAN_DUAL`:
    '0'/'off' = HS; an integer = dual with that blk. Default: 64
    (mid-shift dual, raced 1.32x the HS kernel on v5e with
    init-tail-safe numerics — see `_scan_block_dual`) on REAL TPU;
    HS elsewhere — the CPU/interpret test grids exercise hot synthetic
    deltas where the dual's separated-exponent clamp is out of range by
    design (its realistic-delta parity has dedicated tests).
    """
    import os

    default = "64" if jax.default_backend() == "tpu" else ""
    v = os.environ.get("VMAMBAIR_SCAN_DUAL", default)
    if v in ("", "0", "off"):
        return None
    return int(v)


DUAL_CLAMP_BITS = 120.0  # fp32 exp2 overflows at 128; leave sum headroom


def _scan_block_dual(A_t, d, b_full, carry, *, reverse, blk):
    """MXU matmul-dual (SSD-style) inclusive scan — VERDICT r4 #1.

    Same contract as `_scan_block`. Within each SUBCHUNK window the
    prefix recurrence runs on the MXU instead of the 7-level VPU
    Hillis-Steele: with block-local mid-referenced
    s_t = A*log2e * (cumsum_blk(delta) - sigma_mid),

        Z_p = exp2(-s_p) * b_p                  (VPU, clamped +-120 bits)
        H   = Z @ T                             (MXU; T constant
                                                 block-diag-triangular)
        h_t = exp2(s_t) * (H_t + corr_t)        (VPU, one FMA)

    where corr_t broadcasts the chained cross-block entering-carries
    back over each block via a second (m, sub) selector matmul, block
    ends are extracted by one-hot picker matmuls, and windows chain
    through the usual boundary carry-fold.

    Numerics: the pairwise decays exp2(s_t - s_p) are exact; the
    SEPARATED factors exp2(+-s) overflow fp32 once the per-block
    half-range |A|*sum_blk(delta)/2 exceeds ~120 bits (the same reason
    round-2's full-L cumsum forms were rejected) — the mid-shift halves
    the exposure vs a block-start reference. Measured on the flagship
    model at init (tools/kdualnum.py): at blk=64-mid ~1e-4 of
    (b, d, n, window) rows exceed the safe range (delta's softplus
    tail); there the clamp damps deep-in-window positions toward zero.
    Acceptable for bf16 model paths, and `_dual_cfg` keeps the exact HS
    kernel one env var away.

    Raced on v5e at the hot shape (tools/kvariants.py, r5): HS 12.08 ms;
    pure tril-dual (no blocks) 7.10 ms but numerically unusable (7.7% of
    rows exceed range at q=128); sliced-VPU fix-ups at blk=32 10.56 ms;
    THIS form (mid-shift blk=64, matmul-assisted fix-ups) 9.18 ms =
    1.32x the HS production kernel with init-tail-safe numerics. MXU
    cost 2*sub flops/element vs ~25 VPU accesses/element.
    """
    nb, dt, chunk = b_full.shape
    sub = min(SUBCHUNK, chunk)
    blk = min(blk, sub)
    m = sub // blk

    pi = jax.lax.broadcasted_iota(jnp.int32, (sub, sub), 0)
    ti = jax.lax.broadcasted_iota(jnp.int32, (sub, sub), 1)
    same = (pi // blk) == (ti // blk)
    causal = (pi >= ti) if reverse else (pi <= ti)
    T = jnp.where(same & causal, 1.0, 0.0).astype(jnp.float32)
    li = jax.lax.broadcasted_iota(jnp.int32, (sub, m), 0)
    bi = jax.lax.broadcasted_iota(jnp.int32, (sub, m), 1)
    # block "final h" lane: last lane fwd, first lane reversed
    end_lane = bi * blk if reverse else bi * blk + blk - 1
    Pend = jnp.where(li == end_lane, 1.0, 0.0).astype(jnp.float32)
    mid_lane = bi * blk + blk // 2 - (0 if reverse else 1)
    Pmid = jnp.where(li == mid_lane, 1.0, 0.0).astype(jnp.float32)
    S = jnp.where(li // blk == bi, 1.0, 0.0).astype(jnp.float32).T

    sub_slices = [slice(i * sub, (i + 1) * sub) for i in range(chunk // sub)]
    if reverse:
        sub_slices = sub_slices[::-1]

    pieces = []
    for sl in sub_slices:
        sd = d[:, sl]                                   # (Dt, sub)
        # block-local (suffix-)inclusive cumsum of delta via the same T
        sig = jnp.dot(sd, T, preferred_element_type=jnp.float32)
        edge = (sub - 1) if reverse else 0
        d_e = sd[:, edge : edge + 1]
        b_e = (b_full[:, :, sl][:, :, edge : edge + 1]
               + jnp.exp2(A_t * d_e[None]) * carry)
        if reverse:
            b = jnp.concatenate(
                [b_full[:, :, sl.start : sl.stop - 1], b_e], axis=2)
        else:
            b = jnp.concatenate(
                [b_e, b_full[:, :, sl.start + 1 : sl.stop]], axis=2)
        if m > 1:
            sig_ends = jnp.dot(sig, Pend,
                               preferred_element_type=jnp.float32)
        mids = jnp.dot(sig, Pmid, preferred_element_type=jnp.float32)
        sig = sig - jnp.dot(mids, S, preferred_element_type=jnp.float32)
        Emid = jnp.exp2(A_t * mids[None])               # (nb, Dt, m)
        s = A_t * sig[None]                             # (nb, Dt, sub)
        E = jnp.exp2(jnp.minimum(s, DUAL_CLAMP_BITS))
        Z = jnp.exp2(jnp.minimum(-s, DUAL_CLAMP_BITS)) * b
        H = jnp.dot(
            Z.reshape(nb * dt, sub), T,
            preferred_element_type=jnp.float32,
        ).reshape(nb, dt, sub)
        if m == 1:
            h_i = E * H
        else:
            ends_h = jnp.dot(
                (E * H).reshape(nb * dt, sub), Pend,
                preferred_element_type=jnp.float32,
            ).reshape(nb, dt, m)
            dec = jnp.exp2(A_t * sig_ends[None])        # full-block decays
            if reverse:
                cs = [jnp.zeros((nb, dt, 1), jnp.float32),
                      ends_h[:, :, m - 1 : m]]
                for j in range(m - 3, -1, -1):
                    cs.append(ends_h[:, :, j + 1 : j + 2]
                              + dec[:, :, j + 1 : j + 2] * cs[-1])
                cvec = jnp.concatenate(cs[::-1], axis=2)
            else:
                cs = [jnp.zeros((nb, dt, 1), jnp.float32),
                      ends_h[:, :, 0:1]]
                for j in range(2, m):
                    cs.append(ends_h[:, :, j - 1 : j]
                              + dec[:, :, j - 1 : j] * cs[-1])
                cvec = jnp.concatenate(cs, axis=2)
            cvec = cvec * Emid
            corr = jnp.dot(
                cvec.reshape(nb * dt, m), S,
                preferred_element_type=jnp.float32,
            ).reshape(nb, dt, sub)
            h_i = E * (H + corr)
        out_edge = 0 if reverse else sub - 1
        carry = h_i[:, :, out_edge : out_edge + 1]
        pieces.append(h_i)
    if reverse:
        pieces = pieces[::-1]
    h_all = (pieces[0] if len(pieces) == 1
             else jnp.concatenate(pieces, axis=2))
    return h_all, carry


@functools.lru_cache(maxsize=None)
def _build_pallas_fwd(BT, L, dim, N, G, chunk, d_tile, softplus, interpret,
                      out_dtype_name, reverse=False, save_carries=False):
    out_dtype = jnp.dtype(out_dtype_name)
    n_chunks = L // chunk
    n_dtiles = dim // d_tile
    dg_tiles = (dim // G) // d_tile  # d-tiles per group

    grid = (BT, n_dtiles, n_chunks)
    if save_carries:
        # training forward: additionally emit the state ENTERING each chunk
        # (the CUDA checkpoint array `x`, `selective_scan.cpp:217-220`) for
        # the backward kernel's per-chunk forward recompute
        def kernel(u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref,
                   y_ref, car_ref, h_ref):
            c_idx = pl.program_id(2)

            @pl.when(c_idx == 0)
            def _():
                h_ref[...] = jnp.zeros_like(h_ref)

            car_ref[0, 0, 0] = h_ref[...][:, :, 0]
            _scan_kernel(
                u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref,
                y_ref, h_ref, nstate=N, chunk=chunk, softplus=softplus,
                reverse=reverse, init=False,
            )
    else:
        kernel = functools.partial(
            _scan_kernel, nstate=N, chunk=chunk, softplus=softplus,
            reverse=reverse,
        )
    # reverse: walk chunks back-to-front so the carry is causal
    cix = (lambda c: n_chunks - 1 - c) if reverse else (lambda c: c)
    flops = 9 * BT * L * dim * N

    out_specs = pl.BlockSpec(
        (1, d_tile, chunk), lambda b, dt, c: (b, dt, cix(c))
    )
    out_shape = jax.ShapeDtypeStruct((BT, dim, L), out_dtype)
    if save_carries:
        # (BT, n_dtiles, n_chunks, N, d_tile): the block covers the
        # trailing (N, d_tile) dims exactly — Mosaic requires trailing
        # block dims be lane/sublane-aligned OR full-dim
        out_specs = [
            out_specs,
            pl.BlockSpec(
                (1, 1, 1, N, d_tile),
                lambda b, dt, c: (b, dt, cix(c), 0, 0),
            ),
        ]
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct(
                (BT, n_dtiles, n_chunks, N, d_tile), jnp.float32
            ),
        ]

    def fwd(u, d, A, B4, C4, Dskip, bias):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, d_tile, chunk), lambda b, dt, c: (b, dt, cix(c))
                ),
                pl.BlockSpec(
                    (1, d_tile, chunk), lambda b, dt, c: (b, dt, cix(c))
                ),
                pl.BlockSpec((N, d_tile, 1), lambda b, dt, c: (0, dt, 0)),
                pl.BlockSpec(
                    (1, 1, N, chunk),
                    lambda b, dt, c: (b, dt // dg_tiles, 0, cix(c)),
                ),
                pl.BlockSpec(
                    (1, 1, N, chunk),
                    lambda b, dt, c: (b, dt // dg_tiles, 0, cix(c)),
                ),
                pl.BlockSpec((d_tile, 1), lambda b, dt, c: (dt, 0)),
                pl.BlockSpec((d_tile, 1), lambda b, dt, c: (dt, 0)),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((N, d_tile, 1), jnp.float32)],
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=(2 * BT * L * dim + 2 * BT * L * G * N) * 4,
                transcendentals=BT * L * dim * N,
            ),
            compiler_params=pltpu.CompilerParams(
                # the (N, d_tile, chunk) working stacks exceed the default
                # 16MB scoped-vmem limit; v5e has 128MB of VMEM
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(u, d, A, B4, C4, Dskip, bias)

    return fwd


def _scan_kernel_ld(u_ref, d_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref,
                    y_ref, h_ref, *, nstate, chunk, softplus,
                    reverse=False):
    """Channels-LAST grid step: u/d/y blocks (1, chunk, Dt) — sequence on
    sublanes, channels on lanes. This matches the model's native (B, L, D)
    activations so NO transposes of the big operands are needed around the
    kernel (the (B, D, L) layout costs three ~full-tensor transposes per
    call, which dominated the scan wall-time). B/C arrive as
    (B, G, N, L, 1) blocks (1, 1, N, chunk, 1) — a cheap host-side
    relayout of the small projection tensors that makes the per-state
    multiply a pure broadcast. The Hillis-Steele runs along the SUBLANE axis of
    (N, chunk, Dt) stacks.

    A: (N, 1, dim) -> block (N, 1, Dt); bias/Dskip: (1, dim) -> (1, Dt);
    h scratch: (N, 1, Dt).
    """
    c_idx = pl.program_id(2)

    @pl.when(c_idx == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)

    d = d_ref[0].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)
    if softplus:
        d = _softplus(d)
    u = u_ref[0].astype(jnp.float32)  # (chunk, Dt)
    du = d * u
    y = Dskip_ref[...].astype(jnp.float32) * u

    B_blk = B_ref[0, 0].astype(jnp.float32)  # (N, chunk, 1)
    C_blk = C_ref[0, 0].astype(jnp.float32)

    n_steps = int(math.log2(chunk))
    assert (1 << n_steps) == chunk, "chunk must be a power of two"

    N = nstate
    dt = u.shape[1]
    A_t = A_ref[...].astype(jnp.float32)  # (N, 1, Dt)
    a = jnp.exp(d[None] * A_t)  # (N, chunk, Dt)
    b = du[None] * B_blk  # (N, chunk, Dt)
    for s in range(n_steps):
        k = 1 << s
        ident_a = jnp.ones((N, k, dt), jnp.float32)
        ident_b = jnp.zeros((N, k, dt), jnp.float32)
        if reverse:
            a_prev = jnp.concatenate([a[:, k:, :], ident_a], axis=1)
            b_prev = jnp.concatenate([b[:, k:, :], ident_b], axis=1)
        else:
            a_prev = jnp.concatenate([ident_a, a[:, :-k, :]], axis=1)
            b_prev = jnp.concatenate([ident_b, b[:, :-k, :]], axis=1)
        b = a * b_prev + b
        a = a * a_prev
    # carry scratch is (N, 8, Dt) — a sublane-dim-1 VMEM scratch aborts the
    # Mosaic compiler, so 8 sublanes are stored and only the edge row used
    hv = h_ref[...].astype(jnp.float32)
    h0 = hv[:, 0:1, :] if reverse else hv[:, 7:8, :]  # (N, 1, Dt)
    h_all = a * h0 + b  # (N, chunk, Dt)
    y = y + jnp.sum(C_blk * h_all, axis=0)
    h_ref[...] = h_all[:, :8, :] if reverse else h_all[:, chunk - 8 :, :]

    y_ref[0] = y.astype(y_ref.dtype)


@functools.lru_cache(maxsize=None)
def _build_pallas_fwd_ld(BT, L, dim, N, G, chunk, d_tile, softplus,
                         interpret, out_dtype_name, reverse=False):
    out_dtype = jnp.dtype(out_dtype_name)
    n_chunks = L // chunk
    n_dtiles = dim // d_tile
    dg_tiles = (dim // G) // d_tile  # d-tiles per group

    grid = (BT, n_dtiles, n_chunks)
    kernel = functools.partial(
        _scan_kernel_ld, nstate=N, chunk=chunk, softplus=softplus,
        reverse=reverse,
    )
    flops = 9 * BT * L * dim * N
    cix = (lambda c: n_chunks - 1 - c) if reverse else (lambda c: c)

    def fwd(u, d, A, B4, C4, Dskip, bias):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, chunk, d_tile), lambda b, dt, c: (b, cix(c), dt)
                ),
                pl.BlockSpec(
                    (1, chunk, d_tile), lambda b, dt, c: (b, cix(c), dt)
                ),
                pl.BlockSpec((N, 1, d_tile), lambda b, dt, c: (0, 0, dt)),
                pl.BlockSpec(
                    (1, 1, N, chunk, 1),
                    lambda b, dt, c: (b, dt // dg_tiles, 0, cix(c), 0),
                ),
                pl.BlockSpec(
                    (1, 1, N, chunk, 1),
                    lambda b, dt, c: (b, dt // dg_tiles, 0, cix(c), 0),
                ),
                pl.BlockSpec((1, d_tile), lambda b, dt, c: (0, dt)),
                pl.BlockSpec((1, d_tile), lambda b, dt, c: (0, dt)),
            ],
            out_specs=pl.BlockSpec(
                (1, chunk, d_tile), lambda b, dt, c: (b, cix(c), dt)
            ),
            out_shape=jax.ShapeDtypeStruct((BT, L, dim), out_dtype),
            scratch_shapes=[pltpu.VMEM((N, 8, d_tile), jnp.float32)],
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=(2 * BT * L * dim + 2 * BT * L * G * N) * 4,
                transcendentals=BT * L * dim * N,
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(u, d, A, B4, C4, Dskip, bias)

    return fwd


def _pick_tiles(L, dim, G, N, budget_mb=None, stacks=4, chunk_x=None):
    """Choose (chunk, d_tile). States are processed in MAX_N_STACK blocks,
    so the live VMEM stacks are ~(b_full + h/temps) on (<=16, d_tile, chunk)
    fp32 plus a handful of (d_tile, chunk) tiles; keep that under ~32MB of
    the 128MB v5e VMEM so double-buffered input DMA has room. d_tile must
    divide the per-group channel count so each tile maps to one B/C
    group. `stacks` models the number of live (nb, d_tile, chunk) buffers
    (the backward holds more than the forward)."""
    dg = dim // G
    if dg <= 256:
        d_tile = dg
    else:
        d_tile = max(
            (c for c in (256, 192, 128, 96, 64, 48, 32, 16, 8) if dg % c == 0),
            default=dg,
        )
    nb = min(N, 16)  # MAX_N_STACK
    import os

    # chunk 2048 under the matmul-dual: its working set is lighter than
    # the HS levels' (for which 2048 lost, 14.4 vs 13.4 ms), and the
    # measured headline gains +0.85% (7.25 vs 7.19 MP/s, reproduced).
    # Takes effect only where the VMEM budget below allows (dg=48
    # levels); VMAMBAIR_SCAN_CHUNK_X overrides.
    if chunk_x is None:
        chunk_x = int(os.environ.get(
            "VMAMBAIR_SCAN_CHUNK_X", "2" if _dual_cfg() else "1"))
    chunk = 1024 * chunk_x
    if budget_mb is None:
        budget_mb = int(os.environ.get("VMAMBAIR_SCAN_VMEM_MB", "32"))
    budget = budget_mb * 1024 * 1024
    while chunk > 8 and (stacks * nb + 8) * d_tile * chunk * 4 > budget:
        chunk //= 2
    while chunk > 1 and L % chunk != 0:
        chunk //= 2
    return chunk, d_tile


def _pick_tiles_bwd(L, dim, G, N):
    """Tile choice for the backward kernel: it keeps ~8 state-stacks live
    (b, h, bg, dh, w + scan temps), so the chunk shrinks at a larger budget.

    Default budget 32MB == chunk 512 at the trainer's level-0 shapes —
    the measured optimum (v5e, MambaSISR6 lq64/b8 full train grad,
    tools/ktrain.py): budget 64 -> 558 ms, 32 -> 531, 16 -> 551, 8 -> 602.
    The u-shape is VMEM pressure vs grid overhead: at 64MB the ~63MB live
    working set crowds out double-buffered input DMA; below 32 the extra
    grid steps dominate."""
    import os

    # chunk_x pinned to 1: the backward's chunk/VMEM optimum was swept
    # separately (u-shaped; see docstring) and the forward's dual-mode
    # x2 default does not transfer
    return _pick_tiles(
        L, dim, G, N,
        budget_mb=int(os.environ.get("VMAMBAIR_SCAN_BWD_VMEM_MB", "32")),
        stacks=8, chunk_x=1,
    )


def scan_supported(u_shape, n_groups, N, return_last_state=False, min_l=512):
    if return_last_state:
        return False
    if N > MAX_SCAN_N:
        return False
    BT, L, dim = u_shape
    if dim % n_groups != 0:
        return False
    dg = dim // n_groups
    if dg % 8 != 0:
        return False
    if L < min_l:  # grid overhead dominates tiny scans; XLA handles them
        return False
    chunk, d_tile = _pick_tiles(L, dim, n_groups, N)
    if chunk < 8 or dg % d_tile != 0:
        return False
    return True


def _scan_bwd_kernel(u_ref, draw_ref, A_ref, B_ref, C_ref, Dskip_ref,
                     bias_ref, dy_ref, hcar_ref,
                     du_ref, ddel_ref, dB_ref, dC_ref, dacc_ref,
                     dh_ref, *, nstate, chunk, softplus, reverse):
    """One backward grid step (chunks walked OPPOSITE to the forward).

    TPU rebuild of the CUDA backward (`cus/selective_scan_bwd_kernel.cuh:
    66-305` + `reverse_scan.cuh`): per chunk, (1) re-run the forward scan
    from the saved chunk carry to recover h, (2) reverse-scan the output
    cotangent dh_t = C_t*dy_t + a_{t+1}*dh_{t+1} — same log-domain
    Hillis-Steele with delta shifted one position toward the scan direction
    (the cross-chunk edge decay is folded into the carried dh, so the edge
    element's shifted delta is 0), (3) accumulate all gradients:

        du     = delta * sum_n B_n dh_n + D * dy
        ddelta = u * sum_n B_n dh_n + sum_n A_n * w_n,  w = dh*(h - b)
                 [a_t*h_{t-1} == h_t - b_t: no h shift / extra exp needed]
        dB_n   = sum_d delta*u*dh_n          dC_n = sum_d dy*h_n
        dA_n  += sum_t delta * w_n           dD  += sum_t dy*u
        dbias += sum_t ddelta_raw            (softplus chain via sigmoid)

    dA/dD/dbias come out as ONE per-(batch, tile) accumulator block of
    (N+2, d_tile) rows (dA stack, then the dD row, then the dbias row),
    accumulated across the sequential chunk axis in VMEM; the caller
    splits the rows and reduces over batch. dB/dC come out per d-tile
    ((BT, n_dtiles, N, L)); the caller sums tiles within each group.
    """
    c_idx = pl.program_id(2)

    @pl.when(c_idx == 0)
    def _():
        dh_ref[...] = jnp.zeros_like(dh_ref)
        dacc_ref[...] = jnp.zeros_like(dacc_ref)

    draw = (draw_ref[0].astype(jnp.float32)
            + bias_ref[...].astype(jnp.float32))
    if softplus:
        d = _softplus(draw)
        sig = jax.nn.sigmoid(draw)
    else:
        d = draw
        sig = None
    u = u_ref[0].astype(jnp.float32)
    dy = dy_ref[0].astype(jnp.float32)
    du_el = d * u

    # adjoint-scan decays: ds[t] = d[t+1] (forward orig) / d[t-1] (reverse
    # orig); the scanned edge gets 0 (its decay is pre-folded into dh carry)
    zcol = jnp.zeros((d.shape[0], 1), jnp.float32)
    if reverse:
        ds = jnp.concatenate([zcol, d[:, :-1]], axis=1)
    else:
        ds = jnp.concatenate([d[:, 1:], zcol], axis=1)
    # position whose dh seeds the next (sequence-earlier) chunk's carry
    edge = chunk - 1 if reverse else 0
    d_e = d[:, edge : edge + 1]

    A_all = A_ref[...].astype(jnp.float32)        # (N, Dt, 1)
    B_all = B_ref[0, 0].astype(jnp.float32)       # (N, chunk)
    C_all = C_ref[0, 0].astype(jnp.float32)
    h0_all = hcar_ref[...][0, 0, 0][:, :, None]   # (N, Dt, 1)
    dh0_all = dh_ref[...].astype(jnp.float32)

    sB = jnp.zeros_like(u)        # sum_n B_n * dh_n      (Dt, chunk)
    dAw = jnp.zeros_like(u)       # sum_n A_n * w_n       (Dt, chunk)
    dual = _dual_cfg()
    if dual:
        blkscan = functools.partial(_scan_block_dual, blk=dual)
    else:
        blkscan = _scan_block
    dB_pieces, dC_pieces, dA_pieces, dh_next = [], [], [], []
    for n0 in range(0, nstate, MAX_N_STACK):
        n1 = min(n0 + MAX_N_STACK, nstate)
        A_t = A_all[n0:n1] * LOG2E
        B_blk = B_all[n0:n1]
        C_blk = C_all[n0:n1]
        b_full = du_el[None] * B_blk[:, None, :]  # (nb, Dt, chunk)
        h_all, _ = blkscan(
            A_t, d, b_full, h0_all[n0:n1], reverse=reverse
        )
        bg = dy[None] * C_blk[:, None, :]
        dh_all, _ = blkscan(
            A_t, ds, bg, dh0_all[n0:n1], reverse=not reverse
        )
        dh_next.append(
            jnp.exp2(A_t * d_e[None]) * dh_all[:, :, edge : edge + 1]
        )
        w = dh_all * (h_all - b_full)             # = dh * a_t * h_prev
        sB = sB + jnp.sum(B_blk[:, None, :] * dh_all, axis=0)
        dAw = dAw + jnp.sum(A_all[n0:n1] * w, axis=0)
        dB_pieces.append(jnp.sum(du_el[None] * dh_all, axis=1))
        dC_pieces.append(jnp.sum(dy[None] * h_all, axis=1))
        dA_pieces.append(jnp.sum(d[None] * w, axis=2))  # (nb, Dt)

    dh_ref[...] = (dh_next[0] if len(dh_next) == 1
                   else jnp.concatenate(dh_next, axis=0))
    du = d * sB + Dskip_ref[...].astype(jnp.float32) * dy
    ddelta = u * sB + dAw
    if softplus:
        ddelta = ddelta * sig
    du_ref[0] = du.astype(du_ref.dtype)
    ddel_ref[0] = ddelta.astype(ddel_ref.dtype)
    dB_ref[0, 0] = (dB_pieces[0] if len(dB_pieces) == 1
                    else jnp.concatenate(dB_pieces, axis=0)
                    ).astype(dB_ref.dtype)
    dC_ref[0, 0] = (dC_pieces[0] if len(dC_pieces) == 1
                    else jnp.concatenate(dC_pieces, axis=0)
                    ).astype(dC_ref.dtype)
    acc = jnp.concatenate(
        dA_pieces
        + [jnp.sum(dy * u, axis=1)[None, :],      # the dD row
           jnp.sum(ddelta, axis=1)[None, :]],     # the dbias row
        axis=0,
    )  # (N + 2, Dt)
    dacc_ref[0, 0] += acc


@functools.lru_cache(maxsize=None)
def _build_pallas_bwd(BT, L, dim, N, G, chunk, d_tile, softplus, interpret,
                      in_dtype_name, bc_dtype_name, dy_dtype_name,
                      reverse=False):
    n_chunks = L // chunk
    n_dtiles = dim // d_tile
    dg_tiles = (dim // G) // d_tile

    grid = (BT, n_dtiles, n_chunks)
    kernel = functools.partial(
        _scan_bwd_kernel, nstate=N, chunk=chunk, softplus=softplus,
        reverse=reverse,
    )
    # walk chunks opposite to the forward so the dh carry is causal
    cox = (lambda c: c) if reverse else (lambda c: n_chunks - 1 - c)
    in_dtype = jnp.dtype(in_dtype_name)
    bc_dtype = jnp.dtype(bc_dtype_name)

    def bwd(u, draw, A, B4, C4, Dskip, bias, dy, hcar):
        seq_spec = pl.BlockSpec(
            (1, d_tile, chunk), lambda b, dt, c: (b, dt, cox(c))
        )
        bc_spec = pl.BlockSpec(
            (1, 1, N, chunk), lambda b, dt, c: (b, dt // dg_tiles, 0, cox(c))
        )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                seq_spec,
                seq_spec,
                pl.BlockSpec((N, d_tile, 1), lambda b, dt, c: (0, dt, 0)),
                bc_spec,
                bc_spec,
                pl.BlockSpec((d_tile, 1), lambda b, dt, c: (dt, 0)),
                pl.BlockSpec((d_tile, 1), lambda b, dt, c: (dt, 0)),
                seq_spec,
                pl.BlockSpec(
                    (1, 1, 1, N, d_tile),
                    lambda b, dt, c: (b, dt, cox(c), 0, 0),
                ),
            ],
            out_specs=[
                seq_spec,                                       # du
                seq_spec,                                       # ddelta
                pl.BlockSpec(                                   # dB partial
                    (1, 1, N, chunk), lambda b, dt, c: (b, dt, 0, cox(c))
                ),
                pl.BlockSpec(                                   # dC partial
                    (1, 1, N, chunk), lambda b, dt, c: (b, dt, 0, cox(c))
                ),
                pl.BlockSpec(                                   # dA/dD/dbias
                    (1, 1, N + 2, d_tile), lambda b, dt, c: (b, dt, 0, 0)
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((BT, dim, L), in_dtype),
                jax.ShapeDtypeStruct((BT, dim, L), in_dtype),
                jax.ShapeDtypeStruct((BT, n_dtiles, N, L), bc_dtype),
                jax.ShapeDtypeStruct((BT, n_dtiles, N, L), bc_dtype),
                jax.ShapeDtypeStruct(
                    (BT, n_dtiles, N + 2, d_tile), jnp.float32
                ),
            ],
            scratch_shapes=[pltpu.VMEM((N, d_tile, 1), jnp.float32)],
            cost_estimate=pl.CostEstimate(
                flops=22 * BT * L * dim * N,
                bytes_accessed=(5 * BT * L * dim + 4 * BT * L * G * N) * 4,
                transcendentals=2 * BT * L * dim * N,
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(u, draw, A, B4, C4, Dskip, bias, dy, hcar)

    return bwd


def _scan_bwd_dl(u, draw, A, B, C, Dskip, bias, dy, hcar, *, softplus,
                 interpret, reverse):
    """Run the backward kernel in DL layout; reduce the partial outputs.

    u/draw/dy (BT, dim, L); B/C (BT, G, N, L); A (dim, N) fp32;
    hcar (BT, n_dtiles, n_chunks, N, d_tile) — the tile layout the
    carry-saving forwards emit (`_build_pallas_fwd`/`_build_fused_fwd`
    with save_carries=True at the SAME chunk/d_tile choice as here).
    Returns (du, ddelta_raw, dA, dB, dC, dD, dbias) in DL layouts.
    """
    BT, dim, L = u.shape
    G, N = B.shape[1], A.shape[1]
    chunk, d_tile = _pick_tiles_bwd(L, dim, G, N)
    dg_tiles = (dim // G) // d_tile
    bwd = _build_pallas_bwd(
        BT, L, dim, N, G, chunk, d_tile, softplus, interpret,
        str(u.dtype), str(B.dtype), str(dy.dtype), reverse,
    )
    du, ddel, dBp, dCp, dacc = bwd(
        u, draw, A.astype(jnp.float32).T[:, :, None], B, C,
        Dskip.astype(jnp.float32).reshape(dim, 1),
        bias.astype(jnp.float32).reshape(dim, 1), dy, hcar,
    )
    if dg_tiles > 1:  # sum tile partials within each B/C group
        dB = jnp.sum(
            dBp.reshape(BT, G, dg_tiles, N, L).astype(jnp.float32), axis=2
        ).astype(B.dtype)
        dC = jnp.sum(
            dCp.reshape(BT, G, dg_tiles, N, L).astype(jnp.float32), axis=2
        ).astype(C.dtype)
    else:
        dB, dC = dBp, dCp
    # unpack the (N+2, d_tile) accumulator rows: dA stack, dD row, dbias row
    dA = jnp.sum(dacc[:, :, :N, :], axis=0)       # (n_dtiles, N, d_tile)
    dA = jnp.moveaxis(dA, 1, 0).reshape(N, dim).T  # (dim, N)
    dD = jnp.sum(dacc[:, :, N, :], axis=0).reshape(dim)
    dbias = jnp.sum(dacc[:, :, N + 1, :], axis=0).reshape(dim)
    return du, ddel, dA, dB, dC, dD, dbias


def bwd_scan_supported(L, dim, G, N):
    """Whether the Pallas backward kernel can tile these shapes (else the
    VJP falls back to recompute-through-XLA)."""
    dg = dim // G
    if dg % 8 != 0 or N > MAX_SCAN_N:
        return False
    chunk, d_tile = _pick_tiles_bwd(L, dim, G, N)
    return chunk >= 8 and L % chunk == 0 and dg % d_tile == 0


def selective_scan_dl(u, delta, A, B, C, Dskip, bias, *, softplus=True,
                      interpret=False, reverse=False, out_dtype=None):
    """Forward scan in native (batch, D, L) layout; B/C are (batch, G, N, L).

    All arguments required (use zeros for no-op Dskip/bias). Differentiable
    via the custom VJP of `selective_scan` — prefer that wrapper in model
    code; this is the raw forward. reverse=True scans L right-to-left
    (equivalent to flip -> scan -> flip without materializing the flips —
    the reference's directions 2/3, `MambaSISR6_arch.py:403,427`).
    """
    BT, dim, L = u.shape
    G, N = B.shape[1], A.shape[1]
    chunk, d_tile = _pick_tiles(L, dim, G, N)
    fwd = _build_pallas_fwd(
        BT, L, dim, N, G, chunk, d_tile, softplus, interpret,
        str(jnp.dtype(out_dtype or u.dtype)), reverse,
    )
    Dskip2 = Dskip.astype(jnp.float32).reshape(dim, 1)
    bias2 = bias.astype(jnp.float32).reshape(dim, 1)
    return fwd(u, delta, A.astype(jnp.float32).T[:, :, None], B, C,
               Dskip2, bias2)


def _scan_pallas_fwd_impl(u, delta, A, B, C, Dskip, bias, *, softplus,
                          interpret, reverse=False, out_dtype=None):
    # channels-last API -> DL kernel layout. Measured on v5e: the lane-axis
    # Hillis-Steele in (B, D, L) layout is ~2.3x faster per element than a
    # sublane-axis scan in native (B, L, D) layout (see _scan_kernel_ld),
    # and that gap dominates the three full-tensor transposes this adds —
    # so DL stays the dispatch default.
    u_dl = jnp.swapaxes(u, 1, 2)
    d_dl = jnp.swapaxes(delta, 1, 2)
    B_dl = jnp.moveaxis(B, 1, 3)  # (BT, L, G, N) -> (BT, G, N, L)
    C_dl = jnp.moveaxis(C, 1, 3)
    y_dl = selective_scan_dl(
        u_dl, d_dl, A, B_dl, C_dl, Dskip, bias,
        softplus=softplus, interpret=interpret, reverse=reverse,
        out_dtype=out_dtype,
    )
    return jnp.swapaxes(y_dl, 1, 2)


@functools.lru_cache(maxsize=None)
def _make_vjp_op(softplus: bool, interpret: bool, dl: bool,
                 reverse: bool = False, out_dtype_name: str = None):
    # out_dtype_name: independent output dtype (the reference's "oflex"
    # variant, `cusoflex/selective_scan_fwd_kernel_oflex.cuh:19-24` —
    # e.g. fp32 outputs from bf16 inputs); None = follow input dtype.
    fwd_impl = (
        functools.partial(
            selective_scan_dl, softplus=softplus, interpret=interpret,
            reverse=reverse, out_dtype=out_dtype_name,
        )
        if dl
        else functools.partial(
            _scan_pallas_fwd_impl, softplus=softplus, interpret=interpret,
            reverse=reverse, out_dtype=out_dtype_name,
        )
    )

    def xla_equiv(u, delta, A, B, C, Dskip, bias):
        # reverse == flip L -> scan -> flip back (the backward pass
        # recomputes through this XLA-equivalent graph)
        l_axis = 2 if dl else 1
        if reverse:
            u, delta = jnp.flip(u, l_axis), jnp.flip(delta, l_axis)
            B = jnp.flip(B, 3 if dl else 1)
            C = jnp.flip(C, 3 if dl else 1)
        if dl:
            y = selective_scan_xla(
                jnp.swapaxes(u, 1, 2),
                jnp.swapaxes(delta, 1, 2),
                A,
                jnp.moveaxis(B, 3, 1),  # (BT, G, N, L) -> (BT, L, G, N)
                jnp.moveaxis(C, 3, 1),
                Dskip,
                bias,
                delta_softplus=softplus,
            )
            y = jnp.swapaxes(y, 1, 2)
        else:
            y = selective_scan_xla(
                u, delta, A, B, C, Dskip, bias, delta_softplus=softplus
            )
        if reverse:
            y = jnp.flip(y, l_axis)
        if out_dtype_name is not None:
            y = y.astype(jnp.dtype(out_dtype_name))
        return y

    @jax.custom_vjp
    def op(u, delta, A, B, C, Dskip, bias):
        return fwd_impl(u, delta, A, B, C, Dskip, bias)

    def op_fwd(u, delta, A, B, C, Dskip, bias):
        if dl:
            BT, dim, L = u.shape
            G = B.shape[1]
        else:
            BT, L, dim = u.shape
            G = B.shape[2]
        N = A.shape[1]
        if bwd_scan_supported(L, dim, G, N):
            # training forward: save the per-chunk state checkpoints for
            # the Pallas backward kernel (chunk size = the backward's)
            chunk, d_tile = _pick_tiles_bwd(L, dim, G, N)
            fwd_c = _build_pallas_fwd(
                BT, L, dim, N, G, chunk, d_tile, softplus, interpret,
                str(jnp.dtype(out_dtype_name or u.dtype)), reverse,
                save_carries=True,
            )
            if dl:
                u_dl, d_dl, B_dl, C_dl = u, delta, B, C
            else:
                u_dl = jnp.swapaxes(u, 1, 2)
                d_dl = jnp.swapaxes(delta, 1, 2)
                B_dl = jnp.moveaxis(B, 1, 3)
                C_dl = jnp.moveaxis(C, 1, 3)
            y_dl, hcar = fwd_c(
                u_dl, d_dl, A.astype(jnp.float32).T[:, :, None], B_dl, C_dl,
                Dskip.astype(jnp.float32).reshape(dim, 1),
                bias.astype(jnp.float32).reshape(dim, 1),
            )
            y = y_dl if dl else jnp.swapaxes(y_dl, 1, 2)
            # save the DL-layout tensors (already materialized for the
            # kernel): the backward runs in DL, so re-deriving them there
            # would pay the 4 big input transposes a second time
            return y, (u_dl, d_dl, A, B_dl, C_dl, Dskip, bias, hcar)
        y = op(u, delta, A, B, C, Dskip, bias)
        return y, (u, delta, A, B, C, Dskip, bias, None)

    def op_bwd(res, g):
        *args, hcar = res
        if hcar is None:
            # fallback: VJP of the (numerically matching) chunked XLA scan —
            # recompute-in-backward, for shapes the kernel cannot tile
            _, vjp = jax.vjp(xla_equiv, *args)
            return vjp(g)
        u_dl, d_dl, A, B_dl, C_dl, Dskip, bias = args
        g_dl = g if dl else jnp.swapaxes(g, 1, 2)
        du, ddel, dA, dB, dC, dD, dbias = _scan_bwd_dl(
            u_dl, d_dl, A.astype(jnp.float32), B_dl, C_dl,
            Dskip, bias, g_dl, hcar,
            softplus=softplus, interpret=interpret, reverse=reverse,
        )
        if not dl:
            du = jnp.swapaxes(du, 1, 2)
            ddel = jnp.swapaxes(ddel, 1, 2)
            dB = jnp.moveaxis(dB, 3, 1)
            dC = jnp.moveaxis(dC, 3, 1)
        return (
            du.astype(u_dl.dtype),
            ddel.astype(d_dl.dtype),
            dA.astype(A.dtype),
            dB.astype(B_dl.dtype),
            dC.astype(C_dl.dtype),
            dD.astype(Dskip.dtype).reshape(Dskip.shape),
            dbias.astype(bias.dtype).reshape(bias.shape),
        )

    op.defvjp(op_fwd, op_bwd)
    return op


def selective_scan_dl_vjp(u, delta, A, B, C, Dskip, bias, *, softplus=True,
                          interpret=False, reverse=False):
    """Differentiable DL-layout scan (u/delta (BT,D,L); B/C (BT,N,L))."""
    op = _make_vjp_op(bool(softplus), bool(interpret), True, bool(reverse))
    return op(u, delta, A, B, C, Dskip, bias)


def _fused_kernel(u_ref, wxp_ref, wdt_ref, A_ref, Dskip_ref, bias_ref,
                  y_ref, h_ref, *, nstate, dt_rank, chunk, softplus,
                  reverse=False, init=True):
    """Projection-fused grid step, (B, G, D, L) layout, grid (B, G, chunks).

    Fuses the reference's cross_selective_scan einsum chain
    (`MambaRealSR11_arch.py:371-434`: x_proj -> split -> dt_proj -> scan)
    into the scan kernel: per chunk, x_dbl = Wxp @ u (MXU), delta = Wdt @
    x_dbl[:R] (MXU), B/C = x_dbl row stripes — already in the scan's
    (N, chunk) layout, so the projections add no HBM round-trips and no
    relayouts (the CUDA reference pays 6+ kernel launches + a (B,4,D,L)
    intermediate here).

    Blocks: u (1, 1, D, chunk); wxp (1, R+2N, D); wdt (1, D, R);
    A (1, N, D, 1); Dskip/bias (1, D, 1); y (1, 1, D, chunk);
    h scratch (N, D, 1) fp32.
    """
    if init:
        c_idx = pl.program_id(2)

        @pl.when(c_idx == 0)
        def _():
            h_ref[...] = jnp.zeros_like(h_ref)

    u = u_ref[0, 0].astype(jnp.float32)  # (D, chunk)
    xdbl = jnp.dot(wxp_ref[0].astype(jnp.float32), u,
                   preferred_element_type=jnp.float32)  # (R+2N, chunk)
    d = jnp.dot(wdt_ref[0].astype(jnp.float32), xdbl[:dt_rank],
                preferred_element_type=jnp.float32)  # (D, chunk)
    d = d + bias_ref[0].astype(jnp.float32)
    if softplus:
        d = _softplus(d)
    y = _scan_core(
        d, u,
        A_ref[0].astype(jnp.float32),
        xdbl[dt_rank : dt_rank + nstate],
        xdbl[dt_rank + nstate :],
        Dskip_ref[0].astype(jnp.float32),
        h_ref, nstate=nstate, chunk=chunk, reverse=reverse,
    )
    y_ref[0, 0] = y.astype(y_ref.dtype)


@functools.lru_cache(maxsize=None)
def _build_fused_fwd(BT, G, D, L, N, R, chunk, softplus, interpret,
                     out_dtype_name, reverse=False, save_carries=False):
    out_dtype = jnp.dtype(out_dtype_name)
    n_chunks = L // chunk
    grid = (BT, G, n_chunks)
    if save_carries:
        def kernel(u_ref, wxp_ref, wdt_ref, A_ref, Dskip_ref, bias_ref,
                   y_ref, car_ref, h_ref):
            c_idx = pl.program_id(2)

            @pl.when(c_idx == 0)
            def _():
                h_ref[...] = jnp.zeros_like(h_ref)

            car_ref[0, 0, 0] = h_ref[...][:, :, 0]
            _fused_kernel(
                u_ref, wxp_ref, wdt_ref, A_ref, Dskip_ref, bias_ref,
                y_ref, h_ref, nstate=N, dt_rank=R, chunk=chunk,
                softplus=softplus, reverse=reverse, init=False,
            )
    else:
        kernel = functools.partial(
            _fused_kernel, nstate=N, dt_rank=R, chunk=chunk,
            softplus=softplus, reverse=reverse,
        )
    cix = (lambda c: n_chunks - 1 - c) if reverse else (lambda c: c)
    flops = 9 * BT * L * G * D * N + 2 * BT * L * G * D * (R + 2 * N + R)

    out_specs = pl.BlockSpec(
        (1, 1, D, chunk), lambda b, g, c: (b, g, 0, cix(c))
    )
    out_shape = jax.ShapeDtypeStruct((BT, G, D, L), out_dtype)
    if save_carries:
        # carries in the generic DL-backward's tile format
        # (BT, n_dtiles=G, n_chunks, N, d_tile=D) — fused shapes always
        # have dg = D <= 256, so the backward's d_tile equals D
        out_specs = [
            out_specs,
            pl.BlockSpec(
                (1, 1, 1, N, D), lambda b, g, c: (b, g, cix(c), 0, 0)
            ),
        ]
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct(
                (BT, G, n_chunks, N, D), jnp.float32
            ),
        ]

    def fwd(u_dl, wxp, wdt, A_t, Dskip, bias):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, 1, D, chunk), lambda b, g, c: (b, g, 0, cix(c))
                ),
                pl.BlockSpec((1, R + 2 * N, D), lambda b, g, c: (g, 0, 0)),
                pl.BlockSpec((1, D, R), lambda b, g, c: (g, 0, 0)),
                pl.BlockSpec((1, N, D, 1), lambda b, g, c: (g, 0, 0, 0)),
                pl.BlockSpec((1, D, 1), lambda b, g, c: (g, 0, 0)),
                pl.BlockSpec((1, D, 1), lambda b, g, c: (g, 0, 0)),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((N, D, 1), jnp.float32)],
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=(2 * BT * L * G * D) * 4,
                transcendentals=BT * L * G * D * N,
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(u_dl, wxp, wdt, A_t, Dskip, bias)

    return fwd


def fused_scan_supported(b, l, g, d, N, interpret=False):
    """Whether `oss_scan_fused` can run the Pallas path for these shapes.

    d > 256 (the dim-384 latent level of every preset) is deliberately
    NOT fused: the in-kernel projection contracts over the full d, so the
    grid cannot tile d, and forcing d_tile=384 would shrink the chunk and
    the scan's VPU efficiency. Measured justification (VERDICT r2 #9):
    the latent level still runs the *unfused* Pallas kernel (d tiled at
    128) — only its projection einsums stay in XLA — and it carries
    ~0.4% of MambaSISR6's scan element-steps (1 block at L/64 of the
    full-res sequence x 8x the dim; share is tile-size invariant) and
    ~13% of MambaRealSR11's (9 latent blocks). Measured at the bench
    tile shape (B=8, 16x16, d=384): one latent SpatialScan costs
    5.6 ms of a ~600 ms step (~1%), so fusing it is not a lever.
    """
    if N > MAX_SCAN_N:
        return False
    if d % 8 != 0 or d > 256:
        return False
    if l < (0 if interpret else 512):
        return False
    chunk, d_tile = _pick_tiles(l, g * d, g, N)
    return chunk >= 8 and d_tile == d


@functools.lru_cache(maxsize=None)
def _make_fused_vjp_op(softplus: bool, interpret: bool, reverse: bool,
                       dl: bool = False):
    # dl=True: the op consumes u ALREADY in the kernel's (B, G, D, L)
    # layout and returns y in it — zero internal transposes. SpatialScan
    # uses this to share ONE u2 transpose across its fwd+rev direction
    # calls, sum the two y in DL, and transpose once; autodiff then also
    # shares one gy transpose and one du2 transpose per OSS block.
    def pallas_fwd(u2, xw, dw, db, A, Ds):
        if dl:
            b, g, d, l = u2.shape
        else:
            b, l, g, d = u2.shape
        N = A.shape[2]
        R = dw.shape[2]
        chunk, _ = _pick_tiles(l, g * d, g, N)
        fwd = _build_fused_fwd(
            b, g, d, l, N, R, chunk, softplus, interpret, str(u2.dtype),
            reverse,
        )
        u_dl = u2 if dl else jnp.transpose(u2, (0, 2, 3, 1))  # (B, G, D, L)
        A_t = jnp.transpose(A, (0, 2, 1))[..., None]    # (G, N, D, 1)
        y_dl = fwd(u_dl, xw, dw, A_t, Ds[..., None], db[..., None])
        return y_dl if dl else jnp.transpose(y_dl, (0, 3, 1, 2))

    def xla_equiv(u2, xw, dw, db, A, Ds):
        # the exact einsum-chain + XLA-scan composite the kernel fuses
        if dl:
            u2 = jnp.transpose(u2, (0, 3, 1, 2))        # -> (B, L, G, D)
        b, l, g, d = u2.shape
        N = A.shape[2]
        R = dw.shape[2]
        x_dbl = jnp.einsum("blgd,gcd->blgc", u2, xw)
        dts, Bs, Cs = jnp.split(x_dbl, [R, R + N], axis=-1)
        dts = jnp.einsum("blgr,gdr->blgd", dts, dw)
        u = u2.reshape(b, l, g * d)
        delta = dts.reshape(b, l, g * d)
        if reverse:
            u, delta = jnp.flip(u, 1), jnp.flip(delta, 1)
            Bs, Cs = jnp.flip(Bs, 1), jnp.flip(Cs, 1)
        y = selective_scan_xla(
            u, delta, A.reshape(g * d, N), Bs, Cs,
            Ds.reshape(-1), db.reshape(-1), delta_softplus=softplus,
        )
        if reverse:
            y = jnp.flip(y, 1)
        y = y.reshape(b, l, g, d).astype(u2.dtype)
        return jnp.transpose(y, (0, 2, 3, 1)) if dl else y

    @jax.custom_vjp
    def op(u2, xw, dw, db, A, Ds):
        return pallas_fwd(u2, xw, dw, db, A, Ds)

    def op_fwd(u2, xw, dw, db, A, Ds):
        if dl:
            b, g, d, l = u2.shape
        else:
            b, l, g, d = u2.shape
        N = A.shape[2]
        R = dw.shape[2]
        if bwd_scan_supported(l, g * d, g, N):
            # training forward: fused kernel + chunk-carry checkpoints at
            # the backward kernel's chunk size. The residual keeps u in DL
            # layout: the backward runs entirely in the kernel's (B,G,·,L)
            # layout, so saving u_dl (instead of u2) removes a transpose.
            chunk, _ = _pick_tiles_bwd(l, g * d, g, N)
            fwd_c = _build_fused_fwd(
                b, g, d, l, N, R, chunk, softplus, interpret,
                str(u2.dtype), reverse, save_carries=True,
            )
            u_dl = u2 if dl else jnp.transpose(u2, (0, 2, 3, 1))
            A_t = jnp.transpose(A, (0, 2, 1))[..., None]
            y_dl, hcar = fwd_c(
                u_dl, xw, dw, A_t, Ds[..., None], db[..., None]
            )
            y = y_dl if dl else jnp.transpose(y_dl, (0, 3, 1, 2))
            return y, (u_dl, xw, dw, db, A, Ds, hcar)
        return op(u2, xw, dw, db, A, Ds), (u2, xw, dw, db, A, Ds, None)

    def op_bwd(res, gy):
        u_res, xw, dw, db, A, Ds, hcar = res
        if hcar is None:
            # fallback: recompute-in-backward through the numerically
            # matching XLA composite, for shapes the kernel cannot tile
            _, vjp = jax.vjp(xla_equiv, *res[:6])
            return vjp(gy)
        # Pallas scan backward + XLA projection chain, ALL in the kernel's
        # DL layout: the projection recompute and every cotangent einsum
        # contract over d/c/r or (b,l) with L staying on lanes, leaving
        # exactly two lane-crossing transposes (gy in, du2 out) instead of
        # the earlier L-major formulation's ~9. Measured NEUTRAL on the
        # train step (558.7 -> 558.6 ms, tools/ktrain.py): XLA HBM
        # transposes at these shapes are bandwidth-cheap (~30 us each);
        # kept for the simpler graph and smaller residual traffic. The
        # in-context backward cost is the kernel's intrinsic ~2.4x-of-
        # forward work (fwd re-run + reverse dh scan + 7 gradients; 22 vs
        # 9 flops/element in the CostEstimates), not XLA glue.
        u_dl = u_res                                    # (B, G, D, L)
        b, g, d, l = u_dl.shape
        N = A.shape[2]
        R = dw.shape[2]
        xdbl = jnp.einsum("gcd,bgdl->bgcl", xw, u_dl)   # recompute (MXU)
        dts_r = xdbl[:, :, :R]                          # (B, G, R, L)
        draw = jnp.einsum("gdr,bgrl->bgdl", dw, dts_r)
        Bm = xdbl[:, :, R : R + N]                      # (B, G, N, L)
        Cm = xdbl[:, :, R + N :]
        gy_dl = (gy if dl
                 else jnp.transpose(gy, (0, 2, 3, 1))).reshape(b, g * d, l)
        du_dl, ddel_dl, dA_f, dB_dl, dC_dl, dD_f, dbias_f = _scan_bwd_dl(
            u_dl.reshape(b, g * d, l), draw.reshape(b, g * d, l),
            A.reshape(g * d, N), Bm, Cm, Ds.reshape(-1),
            db.reshape(-1), gy_dl, hcar,
            softplus=softplus, interpret=interpret, reverse=reverse,
        )
        ddel_g = ddel_dl.reshape(b, g, d, l).astype(jnp.float32)
        dts32 = dts_r.astype(jnp.float32)
        ddw = jnp.einsum("bgdl,bgrl->gdr", ddel_g, dts32)
        ddts_r = jnp.einsum("gdr,bgdl->bgrl", dw.astype(jnp.float32),
                            ddel_g)
        dx_dbl = jnp.concatenate(
            [ddts_r,
             dB_dl.astype(jnp.float32),
             dC_dl.astype(jnp.float32)], axis=2,
        )                                               # (B, G, R+2N, L)
        du2_dl = du_dl.reshape(b, g, d, l).astype(jnp.float32) + jnp.einsum(
            "gcd,bgcl->bgdl", xw.astype(jnp.float32), dx_dbl
        )
        dxw = jnp.einsum("bgcl,bgdl->gcd", dx_dbl,
                         u_dl.astype(jnp.float32))
        du2 = du2_dl if dl else jnp.transpose(du2_dl, (0, 3, 1, 2))
        return (
            du2.astype(u_dl.dtype),
            dxw.astype(xw.dtype),
            ddw.astype(dw.dtype),
            dbias_f.reshape(g, d).astype(db.dtype),
            dA_f.reshape(g, d, N).astype(A.dtype),
            dD_f.reshape(g, d).astype(Ds.dtype),
        )

    op.defvjp(op_fwd, op_bwd)
    return op


def oss_scan_fused(u2, x_proj_w, dt_proj_w, dt_bias, A, Ds, *,
                   softplus=True, reverse=False, interpret=False,
                   dl=False):
    """Projection-fused K-direction-pair selective scan.

    u2 (B, L, G, D) per-layout sequences; x_proj_w (G, R+2N, D);
    dt_proj_w (G, D, R); dt_bias (G, D); A (G, D, N) [already -exp(A_log)];
    Ds (G, D). Returns y (B, L, G, D). Differentiable: when
    `bwd_scan_supported` the VJP runs the Pallas reverse-scan backward
    kernel from saved chunk carries (projection cotangents stay MXU
    einsums); otherwise it recomputes through the einsum+XLA-scan
    composite.

    dl=True: u2 and y are in the kernel's (B, G, D, L) layout instead —
    no transposes inside the op. Callers that issue BOTH direction scans
    on one u2 (SpatialScan) use this to share one transpose pair across
    the calls and their backward.
    """
    op = _make_fused_vjp_op(bool(softplus), bool(interpret), bool(reverse),
                            bool(dl))
    return op(u2, x_proj_w, dt_proj_w, dt_bias, A, Ds)


def selective_scan(
    u: jax.Array,
    delta: jax.Array,
    A: jax.Array,
    B: jax.Array,
    C: jax.Array,
    D: Optional[jax.Array] = None,
    delta_bias: Optional[jax.Array] = None,
    delta_softplus: bool = False,
    return_last_state: bool = False,
    impl: str = "auto",
    interpret: bool = False,
    reverse: bool = False,
    out_dtype=None,
):
    """Selective scan with automatic implementation dispatch.

    impl: 'auto' (pallas on TPU, xla elsewhere) | 'pallas' | 'xla' | 'seq'
    | 'sp' (sequence-parallel: L sharded over the ambient mesh installed
    via `parallel.mesh.use_sp_mesh`; falls back to 'xla' when no mesh is
    set or last-state output is requested). Layouts as in
    `selective_scan_xla` (channels-last: u (B,L,D); B/C (B,L,G,N)).
    out_dtype: independent output dtype (the reference's oflex variant,
    `cusoflex/selective_scan_fwd_kernel_oflex.cuh:19-24`); None follows
    the input dtype.
    """
    if impl == "sp":
        from ..parallel.mesh import default_sp_mesh

        sp = default_sp_mesh()
        if sp is None or return_last_state or (
            u.shape[1] % sp[0].shape[sp[1]] != 0
        ):
            impl = "xla"
        else:
            from ..parallel.sp_scan import selective_scan_sp

            mesh, axis = sp
            if reverse:
                y = jnp.flip(selective_scan_sp(
                    jnp.flip(u, 1), jnp.flip(delta, 1), A, jnp.flip(B, 1),
                    jnp.flip(C, 1), D, delta_bias, delta_softplus,
                    mesh=mesh, axis=axis,
                ), 1)
            else:
                y = selective_scan_sp(
                    u, delta, A, B, C, D, delta_bias, delta_softplus,
                    mesh=mesh, axis=axis,
                )
            if out_dtype is not None:
                y = y.astype(jnp.dtype(out_dtype))
            return y
    if out_dtype is not None and impl in ("seq", "xla"):
        y = selective_scan(
            u, delta, A, B, C, D, delta_bias, delta_softplus,
            return_last_state, impl, interpret, reverse,
        )
        if return_last_state:
            return y[0].astype(jnp.dtype(out_dtype)), y[1]
        return y.astype(jnp.dtype(out_dtype))
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if reverse and impl in ("seq", "xla"):
        y = selective_scan(
            jnp.flip(u, 1), jnp.flip(delta, 1), A, jnp.flip(B, 1),
            jnp.flip(C, 1), D, delta_bias, delta_softplus,
            return_last_state, impl, interpret,
        )
        return jnp.flip(y, 1)
    if impl == "seq":
        from .selective_scan import selective_scan_seq

        return selective_scan_seq(
            u, delta, A, B, C, D, delta_bias, delta_softplus,
            return_last_state,
        )
    N = A.shape[1]
    if impl == "pallas" and scan_supported(
        u.shape, B.shape[2], N, return_last_state,
        min_l=0 if interpret else 512,
    ):
        dim = u.shape[2]
        Dskip = jnp.zeros((dim,), jnp.float32) if D is None else D
        bias = (
            jnp.zeros((dim,), jnp.float32) if delta_bias is None else delta_bias
        )
        op = _make_vjp_op(
            bool(delta_softplus), bool(interpret), False, bool(reverse),
            None if out_dtype is None else str(jnp.dtype(out_dtype)),
        )
        return op(u, delta, A, B, C, Dskip, bias)
    def _cast(y):
        if out_dtype is None:
            return y
        if return_last_state:
            return y[0].astype(jnp.dtype(out_dtype)), y[1]
        return y.astype(jnp.dtype(out_dtype))

    if reverse:
        y = selective_scan_xla(
            jnp.flip(u, 1), jnp.flip(delta, 1), A, jnp.flip(B, 1),
            jnp.flip(C, 1), D, delta_bias, delta_softplus,
            return_last_state,
        )
        return _cast(jnp.flip(y, 1))
    return _cast(selective_scan_xla(
        u, delta, A, B, C, D, delta_bias, delta_softplus, return_last_state
    ))
