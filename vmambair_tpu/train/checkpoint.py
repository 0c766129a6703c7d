"""Checkpoint / resume — the reference's two-artifact scheme, JAX-native.

The reference saves `net_g_<iter>.pth` holding `params` + `params_ema` dicts
and `<iter>.state` holding epoch/iter/optimizer/scheduler state
(`/root/reference/Deraining/basicsr/models/base_model.py:213-351`). Here the
same two logical artifacts are msgpack files (flax.serialization):

    <models>/net_g_<iter>.ckpt     {"params": ..., "params_ema": ...}
    <training_states>/<iter>.state {"iter", "epoch", pytrees...}

Loading tolerates `params` <-> `params_ema` fallback and skips
shape-mismatched leaves with a warning, like the reference's non-strict
loader (`base_model.py:281-309`). Writes are rank-0 only (`@master_only`,
`base_model.py:213,311`) and atomic (tmp + rename) so a preemption can't
leave a torn checkpoint.
"""

from __future__ import annotations

import logging
import os
import tempfile
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

logger = logging.getLogger("vmambair_tpu")


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _atomic_write(path: str, data: bytes):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def save_network(path: str, params, params_ema=None):
    if jax.process_index() != 0:
        return
    payload: Dict[str, Any] = {"params": _to_host(params)}
    if params_ema is not None:
        payload["params_ema"] = _to_host(params_ema)
    _atomic_write(path, serialization.msgpack_serialize(payload))


def _merge_matching(target, loaded, prefix=""):
    """Copy leaves from `loaded` into the structure of `target`, skipping
    missing keys and shape mismatches with a warning (non-strict load,
    `base_model.py:281-309`)."""
    if isinstance(target, dict):
        out = {}
        for k, v in target.items():
            if isinstance(loaded, dict) and k in loaded:
                out[k] = _merge_matching(v, loaded[k], f"{prefix}/{k}")
            else:
                logger.warning("checkpoint missing key %s/%s", prefix, k)
                out[k] = v
        for k in (loaded or {}):
            if k not in target:
                logger.warning("checkpoint extra key %s/%s ignored", prefix, k)
        return out
    arr = np.asarray(loaded)
    if hasattr(target, "shape") and tuple(arr.shape) != tuple(target.shape):
        logger.warning(
            "shape mismatch at %s: ckpt %s vs model %s — keeping model init",
            prefix, arr.shape, getattr(target, "shape", None),
        )
        return target
    return arr.astype(target.dtype) if hasattr(target, "dtype") else arr


def load_network(path: str, target_params, param_key: str = "params",
                 strict: bool = True):
    """Returns params restored into the structure of `target_params`."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    if param_key not in payload:
        # params <-> params_ema fallback (`base_model.py:270-279`)
        alt = "params_ema" if param_key == "params" else "params"
        if alt in payload:
            logger.info("loading %s (requested %s absent)", alt, param_key)
            param_key = alt
        else:
            raise KeyError(f"{path} has keys {list(payload)}")
    loaded = payload[param_key]
    if strict:
        return serialization.from_state_dict(target_params, loaded)
    return _merge_matching(target_params, loaded)


def save_training_state(path: str, iter_: int, epoch: int, **pytrees):
    """Pytrees (optimizer states contain optax custom nodes that msgpack
    can't serialize structurally) are stored as FLAT LEAF LISTS; resume
    unflattens into the caller's template treedef — the same contract as
    torch's load_state_dict-into-constructed-optimizer
    (`base_model.py:335-351`)."""
    if jax.process_index() != 0:
        return
    payload = {"iter": iter_, "epoch": epoch}
    for k, v in pytrees.items():
        leaves = jax.tree_util.tree_leaves(v)
        payload[k] = [np.asarray(l) for l in leaves]
    _atomic_write(path, serialization.msgpack_serialize(payload))


def load_training_state(path: str, targets: Optional[Dict[str, Any]] = None):
    """targets: {name: pytree-template} for structured fields; returns dict
    with 'iter', 'epoch' and each restored pytree."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    out = {"iter": int(payload["iter"]), "epoch": int(payload["epoch"])}
    for k, template in (targets or {}).items():
        if k not in payload:
            logger.warning("training state %s missing field %s", path, k)
            continue
        leaves = payload[k]
        treedef = jax.tree_util.tree_structure(template)
        if treedef.num_leaves != len(leaves):
            logger.warning(
                "training state %s field %s has %d leaves, template wants "
                "%d — keeping fresh init", path, k, len(leaves),
                treedef.num_leaves,
            )
            continue
        tmpl_leaves = jax.tree_util.tree_leaves(template)
        cast = [
            np.asarray(l).astype(t.dtype)
            if hasattr(t, "dtype") else np.asarray(l)
            for l, t in zip(leaves, tmpl_leaves)
        ]
        out[k] = jax.tree_util.tree_unflatten(treedef, cast)
    return out
