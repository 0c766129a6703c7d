"""Sequence-parallel selective scan over a device mesh.

The reference has no sequence/context parallelism (SURVEY §2.6: long
sequences are handled by intra-kernel chunking and image tiling). This is
the TPU-native scale-out beyond reference parity: the sequence axis L is
sharded across a mesh axis, each device scans its local shard, and shard
carries are combined with a log-step `ppermute` Hillis chain over ICI —
the cross-chip analogue of the kernel's chunk-carry scheme
(`cus/selective_scan.cpp:217`).

Algorithm (exact):
1. local scan from h0=0 -> y0 and last local state S_i (pass 1);
2. each shard's transition is the affine map h_out = P_i h_in + S_i with
   P_i = exp(A * sum(delta_local)) (<= 1, overflow-safe);
   an inclusive Hillis prefix over the device axis composes the maps in
   log2(n) ppermute rounds, then a shift-by-one yields the exclusive
   incoming state H_i;
3. local rescan with h0 = H_i (pass 2).

Cost: 2x local scan work + 2*log2(n) ICI hops of (batch, dim, N) state —
the state is tiny relative to activations, so this is bandwidth-trivial.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.selective_scan import selective_scan_xla


def _device_prefix_states(S, P_dec, axis: str):
    """Exclusive prefix of affine maps (P, S) over mesh axis `axis`.

    Inclusive Hillis: acc_i <- acc_i o acc_{i-k} with
    (P, S)_later o (P, S)_earlier = (P_l * P_e, P_l * S_e + S_l).
    Returns H_i = incoming state for shard i (zeros on shard 0).
    """
    idx = jax.lax.axis_index(axis)
    n = jax.lax.axis_size(axis)
    accP, accS = P_dec, S
    k = 1
    while k < n:
        perm = [(i, i + k) for i in range(n - k)]
        rP = jax.lax.ppermute(accP, axis, perm)
        rS = jax.lax.ppermute(accS, axis, perm)
        has = idx >= k
        accS = jnp.where(has, accP * rS + accS, accS)
        accP = jnp.where(has, accP * rP, accP)
        k *= 2
    # exclusive shift: shard i receives acc_{i-1}
    H = jax.lax.ppermute(accS, axis, [(i, i + 1) for i in range(n - 1)])
    return jnp.where(idx >= 1, H, jnp.zeros_like(H))


def selective_scan_sp(
    u: jax.Array,
    delta: jax.Array,
    A: jax.Array,
    B: jax.Array,
    C: jax.Array,
    D: Optional[jax.Array] = None,
    delta_bias: Optional[jax.Array] = None,
    delta_softplus: bool = False,
    *,
    mesh,
    axis: str = "sp",
):
    """Selective scan with L sharded over `mesh` axis `axis`.

    Layouts as `selective_scan_xla` (u/delta (B, L, dim); B/C
    (B, L, G, N)); weights replicated. Returns y with the same sharding as
    u. Exact (matches the single-device scan bit-for-bit up to fp
    reassociation)."""
    from jax.experimental.shard_map import shard_map

    def local_fn(u_l, d_l, A_, B_l, C_l, D_, bias_):
        # pass 1: local scan -> last local state (h0 = 0)
        _, S = selective_scan_xla(
            u_l, d_l, A_, B_l, C_l, None, bias_, delta_softplus,
            return_last_state=True,
        )
        # shard transition decay P = exp(A * sum(delta)), in (0, 1]
        df = d_l.astype(jnp.float32)
        if bias_ is not None:
            df = df + bias_.astype(jnp.float32)
        if delta_softplus:
            df = jax.nn.softplus(df)
        P_dec = jnp.exp(
            A_.astype(jnp.float32)[None] * jnp.sum(df, axis=1)[..., None]
        )  # (batch, dim, N)
        H = _device_prefix_states(S, P_dec, axis)
        # pass 2: local scan seeded with the incoming cross-shard state
        return selective_scan_xla(
            u_l, d_l, A_, B_l, C_l, D_, bias_, delta_softplus, h0=H
        )

    specs = dict(
        u=P(None, axis, None),
        bc=P(None, axis, None, None),
        w=P(),
    )
    in_specs = [specs["u"], specs["u"], specs["w"], specs["bc"],
                specs["bc"], specs["w"], specs["w"]]
    fn = shard_map(
        local_fn, mesh=mesh, in_specs=tuple(in_specs),
        out_specs=specs["u"], check_rep=False,
    )
    zeros_d = jnp.zeros((u.shape[2],), jnp.float32)
    return fn(
        u, delta, A, B, C,
        zeros_d if D is None else D,
        zeros_d if delta_bias is None else delta_bias,
    )
