"""Numerics study for the matmul-dual (SSD-style) scan formulation.

The dual computes intra-window prefixes as `H = Z @ triu_ones` with
`Z[p] = exp(s_B - s_p) * b_p`, `s_t = A * cumsum(delta)` — separating the
pairwise decay `exp(s_t - s_p)` into two factors whose individual
exponent RANGE is `r = |A| * sum_window(delta)` (the pairwise exponents
themselves are all <= 0 and safe; the separated factors are not). fp32
overflows past ~88 nats, so the dual is exact-to-eps iff r stays well
under ~80 within the matmul window (VERDICT r4 next-round #1; the round-2
"cumsum-of-delta overflows" rejection was at full-L where r is
unbounded by construction).

This tool measures the empirical distribution of r per (b, d, n, window)
over every spatial-scan call of a real model forward (random init, random
input — the same conditions as the bench), for window sizes 32/64/128.
Run on CPU:

    JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python tools/kdualnum.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from vmambair_tpu.models import build_network
    from vmambair_tpu.models import oss as oss_mod

    stats = []  # (L, dim, N, delta_post (B, L, D) np, A (D, N) np)

    orig = oss_mod.selective_scan

    def spy(u, delta, A, B, C, D=None, delta_bias=None,
            delta_softplus=False, **kw):
        d = np.asarray(delta, np.float32)
        if delta_bias is not None:
            d = d + np.asarray(delta_bias, np.float32)
        if delta_softplus:
            d = np.logaddexp(0.0, d)
        if u.shape[1] >= 64:  # spatial scans only (channel scans are L=dim)
            stats.append((d, np.abs(np.asarray(A, np.float32))))
        return orig(u, delta, A, B, C, D, delta_bias, delta_softplus, **kw)

    oss_mod.selective_scan = spy

    net = build_network(dict(type="MambaSISR6", scan_impl="xla"))
    rng = jax.random.PRNGKey(0)
    hw = int(os.environ.get("KDUALNUM_HW", "48"))
    x = jax.random.uniform(rng, (1, hw, hw, 3), jnp.float32)
    variables = net.init(rng, x)
    # eager apply so the spy sees concrete values
    with jax.disable_jit():
        net.apply(variables, x)
    oss_mod.selective_scan = orig

    print(f"captured {len(stats)} spatial scan calls (input {hw}x{hw})")
    for q in (32, 64, 128):
        rs = []
        for d, absA in stats:
            Bb, L, Dd = d.shape
            n_w = L // q
            if n_w == 0:
                continue
            wsum = d[:, : n_w * q].reshape(Bb, n_w, q, Dd).sum(2)  # (B,W,D)
            r = wsum[..., None] * absA[None, None]  # (B, W, D, N)
            rs.append(r.reshape(-1))
        r = np.concatenate(rs)
        qq = np.percentile(r, [50, 90, 99, 99.9, 99.99, 100])
        print(
            f"q={q:4d}: r median {qq[0]:.2f} p90 {qq[1]:.2f} p99 {qq[2]:.2f}"
            f" p99.9 {qq[3]:.2f} p99.99 {qq[4]:.2f} max {qq[5]:.2f}"
            f"  frac>60 {np.mean(r > 60):.2e} frac>80 {np.mean(r > 80):.2e}"
        )
    # delta itself
    alld = np.concatenate([d.reshape(-1) for d, _ in stats])
    print(
        "delta post-softplus: median %.4f p99 %.4f max %.4f"
        % tuple(np.percentile(alld, [50, 99, 100]))
    )


if __name__ == "__main__":
    main()
