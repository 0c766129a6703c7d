"""InceptionV3-FID feature extractor (pool3, 2048-d) — JAX implementation.

The published-FID convention extracts pool3 features from the
`pt_inception-2015-12-05` InceptionV3 checkpoint (the network the
reference's FID path loads — `/root/reference/Deraining/basicsr/metrics/
fid.py:10-19` via a `models.archs.inception.InceptionV3` wrapper that is
absent from the snapshot; the architecture is the standard pytorch-fid
one: torchvision InceptionV3 with the FID-specific A/C/E blocks whose
average pools exclude padding, and a max-pooled branch_pool in the final
E block).

Weights cannot be downloaded in this environment; convert the torch
checkpoint with `scripts/convert_metric_weights.py --inception
pt_inception-2015-12-05.pth -o inception_fid.npz` (BatchNorm is folded
into the convolutions at conversion, eps 1e-3) and pass the npz path.

Forward wiring (pytorch-fid `inception.py`, output block index 3):
  Conv2d_1a_3x3 s2 -> 2a_3x3 -> 2b_3x3 p1 -> maxpool3 s2
  -> Conv2d_3b_1x1 -> Conv2d_4a_3x3 -> maxpool3 s2
  -> Mixed_5b/5c/5d (InceptionA, pool 32/64/64)
  -> Mixed_6a (InceptionB)
  -> Mixed_6b/6c/6d/6e (InceptionC, c7 128/160/160/192)
  -> Mixed_7a (InceptionD) -> Mixed_7b/7c (InceptionE)
  -> global average pool -> (N, 2048)
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

_DN = ("NHWC", "HWIO", "NHWC")


def load_inception_params(weights_path: str) -> Dict[str, dict]:
    """npz with `<module>/kernel` (HWIO, BN-folded) + `<module>/bias` ->
    {module: {kernel, bias}}."""
    data = np.load(weights_path)
    params: Dict[str, dict] = {}
    for key in data.files:
        mod, _, leaf = key.rpartition("/")
        if leaf in ("kernel", "bias"):
            params.setdefault(mod, {})[leaf] = jnp.asarray(data[key])
    missing = [m for m, p in params.items() if len(p) != 2]
    if missing or "Conv2d_1a_3x3" not in params:
        raise KeyError(
            f"not an inception npz (incomplete modules: {missing[:3]})"
        )
    return params


def _conv(params, name, x, stride=1, padding=(0, 0)):
    p = params[name]
    pad = [(padding[0], padding[0]), (padding[1], padding[1])]
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], (stride, stride), pad, dimension_numbers=_DN
    ) + p["bias"]
    return jax.nn.relu(y)


def _maxpool3(x, stride, pad=0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, stride, stride, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )


def _avgpool3_excl(x):
    """3x3 stride-1 pad-1 average pool with count_include_pad=False (the
    FID blocks' pool)."""
    window = (1, 3, 3, 1)
    strides = (1, 1, 1, 1)
    pad = [(0, 0), (1, 1), (1, 1), (0, 0)]
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, strides, pad)
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, window, strides, pad)
    return s / cnt


def _inception_a(params, pre, x):
    b1 = _conv(params, f"{pre}.branch1x1", x)
    b5 = _conv(params, f"{pre}.branch5x5_1", x)
    b5 = _conv(params, f"{pre}.branch5x5_2", b5, padding=(2, 2))
    b3 = _conv(params, f"{pre}.branch3x3dbl_1", x)
    b3 = _conv(params, f"{pre}.branch3x3dbl_2", b3, padding=(1, 1))
    b3 = _conv(params, f"{pre}.branch3x3dbl_3", b3, padding=(1, 1))
    bp = _conv(params, f"{pre}.branch_pool", _avgpool3_excl(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(params, pre, x):
    b3 = _conv(params, f"{pre}.branch3x3", x, stride=2)
    bd = _conv(params, f"{pre}.branch3x3dbl_1", x)
    bd = _conv(params, f"{pre}.branch3x3dbl_2", bd, padding=(1, 1))
    bd = _conv(params, f"{pre}.branch3x3dbl_3", bd, stride=2)
    return jnp.concatenate([b3, bd, _maxpool3(x, 2)], axis=-1)


def _inception_c(params, pre, x):
    b1 = _conv(params, f"{pre}.branch1x1", x)
    b7 = _conv(params, f"{pre}.branch7x7_1", x)
    b7 = _conv(params, f"{pre}.branch7x7_2", b7, padding=(0, 3))
    b7 = _conv(params, f"{pre}.branch7x7_3", b7, padding=(3, 0))
    bd = _conv(params, f"{pre}.branch7x7dbl_1", x)
    bd = _conv(params, f"{pre}.branch7x7dbl_2", bd, padding=(3, 0))
    bd = _conv(params, f"{pre}.branch7x7dbl_3", bd, padding=(0, 3))
    bd = _conv(params, f"{pre}.branch7x7dbl_4", bd, padding=(3, 0))
    bd = _conv(params, f"{pre}.branch7x7dbl_5", bd, padding=(0, 3))
    bp = _conv(params, f"{pre}.branch_pool", _avgpool3_excl(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(params, pre, x):
    b3 = _conv(params, f"{pre}.branch3x3_1", x)
    b3 = _conv(params, f"{pre}.branch3x3_2", b3, stride=2)
    b7 = _conv(params, f"{pre}.branch7x7x3_1", x)
    b7 = _conv(params, f"{pre}.branch7x7x3_2", b7, padding=(0, 3))
    b7 = _conv(params, f"{pre}.branch7x7x3_3", b7, padding=(3, 0))
    b7 = _conv(params, f"{pre}.branch7x7x3_4", b7, stride=2)
    return jnp.concatenate([b3, b7, _maxpool3(x, 2)], axis=-1)


def _inception_e(params, pre, x, pool: str):
    b1 = _conv(params, f"{pre}.branch1x1", x)
    b3 = _conv(params, f"{pre}.branch3x3_1", x)
    b3 = jnp.concatenate([
        _conv(params, f"{pre}.branch3x3_2a", b3, padding=(0, 1)),
        _conv(params, f"{pre}.branch3x3_2b", b3, padding=(1, 0)),
    ], axis=-1)
    bd = _conv(params, f"{pre}.branch3x3dbl_1", x)
    bd = _conv(params, f"{pre}.branch3x3dbl_2", bd, padding=(1, 1))
    bd = jnp.concatenate([
        _conv(params, f"{pre}.branch3x3dbl_3a", bd, padding=(0, 1)),
        _conv(params, f"{pre}.branch3x3dbl_3b", bd, padding=(1, 0)),
    ], axis=-1)
    # FIDInceptionE_1 uses the exclude-pad avg pool; E_2 (Mixed_7c in the
    # FID checkpoint) uses a 3x3 stride-1 MAX pool
    pooled = _avgpool3_excl(x) if pool == "avg" else _maxpool3(x, 1, pad=1)
    bp = _conv(params, f"{pre}.branch_pool", pooled)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def inception_pool3(x, params, resize_input=True, normalize_input=False):
    """x: (N, H, W, 3) RGB float32 in [0, 1]. Returns (N, 2048) pool3
    features. resize_input / normalize_input follow the reference's
    `load_patched_inception_v3(resize_input=True, normalize_input=False)`
    (`fid.py:10-19`); set normalize_input=True when feeding [0,1] images
    to a checkpoint trained on [-1,1] (pytorch-fid default)."""
    if resize_input:
        x = jax.image.resize(
            x, (x.shape[0], 299, 299, x.shape[3]), method="bilinear"
        )
    if normalize_input:
        x = 2.0 * x - 1.0
    x = _conv(params, "Conv2d_1a_3x3", x, stride=2)
    x = _conv(params, "Conv2d_2a_3x3", x)
    x = _conv(params, "Conv2d_2b_3x3", x, padding=(1, 1))
    x = _maxpool3(x, 2)
    x = _conv(params, "Conv2d_3b_1x1", x)
    x = _conv(params, "Conv2d_4a_3x3", x)
    x = _maxpool3(x, 2)
    x = _inception_a(params, "Mixed_5b", x)
    x = _inception_a(params, "Mixed_5c", x)
    x = _inception_a(params, "Mixed_5d", x)
    x = _inception_b(params, "Mixed_6a", x)
    x = _inception_c(params, "Mixed_6b", x)
    x = _inception_c(params, "Mixed_6c", x)
    x = _inception_c(params, "Mixed_6d", x)
    x = _inception_c(params, "Mixed_6e", x)
    x = _inception_d(params, "Mixed_7a", x)
    x = _inception_e(params, "Mixed_7b", x, pool="avg")
    x = _inception_e(params, "Mixed_7c", x, pool="max")
    return jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> (N, 2048)
