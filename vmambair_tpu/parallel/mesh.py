"""Device mesh + sharding helpers — the TPU-native replacement for DDP.

The reference's only parallelism is 8-process NCCL data parallelism
(`/root/reference/Deraining/basicsr/models/base_model.py:79-82`,
`SRGAN/train_S1.sh:1-8`). Here that becomes a `jax.sharding.Mesh` with a
`data` axis: the batch is sharded over the axis, parameters are replicated,
and XLA inserts the gradient all-reduce over ICI automatically when the
jitted train step consumes sharded batches with replicated params — no
process groups, no explicit collectives.

A second (size-1 by default) `model` axis is laid out for future tensor
sharding of the scan's folded K*D channel axis; parity with the reference
needs only `data`.

Multi-host: call `init_distributed()` (wraps `jax.distributed.initialize`)
before mesh construction; `jax.devices()` then spans the slice and the same
code scales out (single-controller SPMD). This replaces the reference's
`init_dist` pytorch/slurm rendezvous (`dist_util.py:10-58`).
"""

from __future__ import annotations

import contextlib
import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# ambient mesh for sequence-parallel scans (`scan_impl: "sp"`): models are
# plain Flax modules with no mesh argument, so the mesh travels as module
# state set by the caller (config/CLI layer) around init/apply
_DEFAULT_SP: Optional[Tuple[Mesh, str]] = None


def set_default_sp_mesh(mesh: Optional[Mesh], axis: str = "data"):
    """Install (or clear, with None) the mesh+axis `scan_impl: "sp"` uses."""
    global _DEFAULT_SP
    _DEFAULT_SP = None if mesh is None else (mesh, axis)


def default_sp_mesh() -> Optional[Tuple[Mesh, str]]:
    return _DEFAULT_SP


@contextlib.contextmanager
def use_sp_mesh(mesh: Mesh, axis: str = "data"):
    """Scope a sequence-parallel mesh: any `scan_impl: "sp"` model applied
    inside shards its scan L axis over `mesh[axis]`."""
    global _DEFAULT_SP
    prev = _DEFAULT_SP
    set_default_sp_mesh(mesh, axis)
    try:
        yield
    finally:
        _DEFAULT_SP = prev


def init_distributed():
    """Multi-host bootstrap (no-op on a single host).

    Replaces the reference's `init_dist` (`dist_util.py:10-58`): JAX reads
    the TPU pod metadata (or `JAX_COORDINATOR_ADDRESS` etc. under
    SLURM/GKE) itself.
    """
    if int(os.environ.get("JAX_NUM_PROCESSES", "1")) > 1 or (
        "COORDINATOR_ADDRESS" in os.environ
    ):
        jax.distributed.initialize()


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by mp={model_parallel}")
    arr = np.asarray(devs).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Host numpy batch dict -> device arrays sharded over the data axis.

    One host->device transfer per array (the CUDAPrefetcher analog,
    `prefetch_dataloader.py:84-126` — JAX's async dispatch provides the
    overlap)."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, replicated(mesh)), tree
    )


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    """`master_only` analog (`dist_util.py:60-84`)."""
    return jax.process_index() == 0


def local_batch_slice(global_batch: int, mesh: Mesh) -> slice:
    """Index range of the global batch this host must feed (multi-host)."""
    n_proc = jax.process_count()
    per = global_batch // n_proc
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
