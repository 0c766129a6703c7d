"""FLOPs / parameter accounting.

The reference reports `Model().flops()` via fvcore with a custom handler
pricing the scan at 9*B*L*D*N (`/root/reference/SRGAN/VmambaIR/archs/
MambaSISR6_arch.py:99-138,646-664`). TPU-native equivalent: ask XLA itself —
`jit(f).lower().compile().cost_analysis()` returns the compiled program's
flop count (post-fusion, the number that actually prices MXU time), plus the
same analytic scan formula for apples-to-apples comparison.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.selective_scan import selective_scan_flops  # noqa: F401 (re-export)


def count_params(params) -> int:
    return sum(
        int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params)
    )


def model_flops(model, input_shape: Tuple[int, ...] = (1, 64, 64, 3),
                backend: str | None = None) -> dict:
    """Compile the forward pass and read XLA's cost analysis.

    Matches the reference protocol of reporting on a 64x64 input
    (`MambaSISR6_arch.py:667-668`). Returns {'flops', 'params', 'gflops'}.
    """
    x = jnp.zeros(input_shape, jnp.float32)
    params = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x))
    n_params = count_params(params)
    params_z = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), params
    )
    compiled = (
        jax.jit(model.apply).lower(params_z, x).compile()
    )
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0]
    flops = int(cost.get("flops", 0))
    return {
        "flops": flops,
        "gflops": flops / 1e9,
        "params": n_params,
        "params_m": n_params / 1e6,
    }
