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
    effn_fused_supported,
    gdfn_residual_fused,
    oss_front_fused,
    oss_front_supported,
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


def test_effn_fused_supported_gate(monkeypatch):
    assert effn_fused_supported((8, 128, 128, 48), 127, interpret=True)
    assert not effn_fused_supported((8, 128, 130, 48), 127, interpret=True)
    assert not effn_fused_supported((8, 2, 128, 48), 127, interpret=True)
    monkeypatch.setenv("VMAMBAIR_EFFN_FUSED", "0")
    assert not effn_fused_supported((8, 128, 128, 48), 127, interpret=True)
