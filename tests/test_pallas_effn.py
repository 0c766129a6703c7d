"""Fused GDFN (EFFN) residual-branch kernel (`ops/pallas_effn.py`).

Value parity (interpret mode) against the exact unfused composite at
awkward shapes (non-square, W padding, multi-tile rows), gradient parity
(the custom_vjp recomputes through the XLA composite, so grads must match
to numerical precision), and the support gate.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vmambair_tpu.ops.pallas_effn import (
    _gdfn_xla,
    _oss_front_xla,
    _oss_tail_xla,
    effn_fused_supported,
    gdfn_residual_fused,
    oss_front_fused,
    oss_front_supported,
    oss_tail_fused,
    oss_tail_supported,
)


def _params(key, c, hid):
    ks = jax.random.split(key, 5)
    return dict(
        ln_w=1.0 + 0.1 * jax.random.normal(ks[0], (c,), jnp.float32),
        ln_b=0.1 * jax.random.normal(ks[1], (c,), jnp.float32),
        w_in=0.2 * jax.random.normal(ks[2], (c, 2 * hid), jnp.float32),
        w_dw=0.3 * jax.random.normal(ks[3], (3, 3, 2 * hid), jnp.float32),
        w_out=0.2 * jax.random.normal(ks[4], (hid, c), jnp.float32),
    )


@pytest.mark.parametrize(
    "shape,hid",
    [
        ((2, 32, 24, 16), 42),   # multi-tile rows, W%8 pad, odd hid
        ((1, 8, 8, 8), 21),      # single tile
        ((1, 10, 16, 8), 21),    # H with Hb=2 fallback tiling
    ],
)
def test_gdfn_fused_matches_composite(shape, hid):
    c = shape[-1]
    p = _params(jax.random.PRNGKey(c + hid), c, hid)
    x = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.float32) * 0.5
    ref = _gdfn_xla(x, **p, eps=1e-5)
    got = gdfn_residual_fused(x, **p, eps=1e-5, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_gdfn_fused_gradients_match_composite():
    shape, hid = (1, 16, 16, 8), 21
    c = shape[-1]
    p = _params(jax.random.PRNGKey(0), c, hid)
    x = jax.random.normal(jax.random.PRNGKey(2), shape, jnp.float32) * 0.5

    def loss_fused(x, p):
        y = gdfn_residual_fused(x, **p, eps=1e-5, interpret=True)
        return jnp.sum(y * jnp.cos(y * 0.1))

    def loss_ref(x, p):
        y = _gdfn_xla(x, **p, eps=1e-5)
        return jnp.sum(y * jnp.cos(y * 0.1))

    gx, gp = jax.grad(loss_fused, argnums=(0, 1))(x, p)
    rx, rp = jax.grad(loss_ref, argnums=(0, 1))(x, p)
    # forward values differ only by fp reassociation; cotangents seen by
    # the shared backward differ accordingly — tolerance covers that
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=2e-4, atol=2e-5)
    for k in p:
        np.testing.assert_allclose(
            np.asarray(gp[k]), np.asarray(rp[k]), rtol=2e-4, atol=2e-5,
            err_msg=k)


def _front_params(key, c, e):
    ks = jax.random.split(key, 7)
    return dict(
        ln_w=1.0 + 0.1 * jax.random.normal(ks[0], (c,), jnp.float32),
        ln_b=0.1 * jax.random.normal(ks[1], (c,), jnp.float32),
        w_x=0.2 * jax.random.normal(ks[2], (c, e), jnp.float32),
        b_x=0.1 * jax.random.normal(ks[3], (e,), jnp.float32),
        w_z=0.2 * jax.random.normal(ks[4], (c, e), jnp.float32),
        b_z=0.1 * jax.random.normal(ks[5], (e,), jnp.float32),
        w_dw=0.3 * jax.random.normal(ks[6], (3, 3, e), jnp.float32),
        b_dw=0.05 * jnp.ones((e,), jnp.float32),
    )


@pytest.mark.parametrize(
    "shape,e",
    [
        ((2, 32, 24, 16), 16),   # multi-tile rows, W%8 pad
        ((1, 8, 8, 8), 8),       # single tile
    ],
)
def test_oss_front_fused_matches_composite(shape, e):
    c = shape[-1]
    p = _front_params(jax.random.PRNGKey(c), c, e)
    x = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.float32) * 0.5
    rxs, rz = _oss_front_xla(x, **p, eps=1e-5)
    gxs, gz = oss_front_fused(x, **p, eps=1e-5, interpret=True)
    np.testing.assert_allclose(
        np.asarray(gxs), np.asarray(rxs), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(gz), np.asarray(rz), rtol=2e-5, atol=2e-5)


def test_oss_front_gradients_match_composite():
    shape, e = (1, 16, 16, 8), 8
    c = shape[-1]
    p = _front_params(jax.random.PRNGKey(5), c, e)
    x = jax.random.normal(jax.random.PRNGKey(2), shape, jnp.float32) * 0.5

    def loss(fn, interp):
        def f(x, p):
            xs, z = (fn(x, **p, eps=1e-5, interpret=True) if interp
                     else fn(x, **p, eps=1e-5))
            return jnp.sum(xs * z) + jnp.sum(jnp.sin(xs))
        return f

    gx, gp = jax.grad(loss(oss_front_fused, True), argnums=(0, 1))(x, p)
    rx, rp = jax.grad(loss(_oss_front_xla, False), argnums=(0, 1))(x, p)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=2e-4, atol=2e-5)
    for k in p:
        np.testing.assert_allclose(
            np.asarray(gp[k]), np.asarray(rp[k]), rtol=2e-4, atol=2e-5,
            err_msg=k)


def _tail_args(shape, dtype=jnp.float32):
    c = shape[-1]
    ks = jax.random.split(jax.random.PRNGKey(c), 5)
    return dict(
        y_row=(jax.random.normal(ks[0], shape, jnp.float32) * 0.7
               ).astype(dtype),
        y_colT=(jax.random.normal(ks[1], shape, jnp.float32) * 0.7
                ).astype(dtype),
        z=jax.nn.silu(jax.random.normal(ks[2], shape, jnp.float32)
                      ).astype(dtype),
        ln_w=1.0 + 0.1 * jax.random.normal(ks[3], (c,), jnp.float32),
        ln_b=0.1 * jax.random.normal(ks[4], (c,), jnp.float32),
    )


@pytest.mark.parametrize(
    "shape,dtype",
    [
        ((2, 32, 24, 16), jnp.float32),   # multi-tile rows
        ((1, 8, 8, 8), jnp.float32),      # single tile
        ((1, 10, 16, 8), jnp.float32),    # Hb=2 fallback tiling
        ((2, 16, 16, 12), jnp.bfloat16),  # model dtype: bf16 gate multiply
    ],
)
def test_oss_tail_fused_matches_composite(shape, dtype):
    a = _tail_args(shape, dtype)
    ref = _oss_tail_xla(**a, eps=1e-5)
    got = oss_tail_fused(**a, eps=1e-5, interpret=True)
    assert got.dtype == a["z"].dtype
    # bf16: the f32 LN stats reduce in a different order, which can flip
    # the final bf16 rounding — allow exactly 1 output ulp (2^-7 rel)
    tol = 2e-5 if dtype == jnp.float32 else 2 ** -7
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=tol, atol=tol)


def test_oss_tail_gradients_match_composite():
    a = _tail_args((1, 16, 16, 8))

    def loss(fn, interp):
        def f(args):
            y = (fn(**args, eps=1e-5, interpret=True) if interp
                 else fn(**args, eps=1e-5))
            return jnp.sum(y * jnp.sin(y * 0.3))
        return f

    g = jax.grad(loss(oss_tail_fused, True))(a)
    r = jax.grad(loss(_oss_tail_xla, False))(a)
    for k in a:
        np.testing.assert_allclose(
            np.asarray(g[k]), np.asarray(r[k]), rtol=2e-4, atol=2e-5,
            err_msg=k)


def test_oss_tail_supported_gate(monkeypatch):
    # default OFF (raced: +11.3 ms in-context regression)
    assert not oss_tail_supported((8, 128, 128, 48), interpret=True)
    monkeypatch.setenv("VMAMBAIR_OSS_TAIL", "1")
    assert oss_tail_supported((8, 128, 128, 48), interpret=True)
    assert not oss_tail_supported((8, 128, 130, 48), interpret=True)


def test_effn_fused_supported_gate(monkeypatch):
    assert effn_fused_supported((8, 128, 128, 48), 127, interpret=True)
    assert not effn_fused_supported((8, 128, 130, 48), 127, interpret=True)
    assert not effn_fused_supported((8, 2, 128, 48), 127, interpret=True)
    monkeypatch.setenv("VMAMBAIR_EFFN_FUSED", "0")
    assert not effn_fused_supported((8, 128, 128, 48), 127, interpret=True)
