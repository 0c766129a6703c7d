"""Reference-scale selective-scan parity grid.

Port of the CUDA kernel suite's parameter grid
(`/root/reference/Mamba/kernels/selective_scan/test_selective_scan.py:319,
373-390`: seqlen 64..4096 x dtypes x dstate x groups x D/bias/softplus,
fwd + last-state + 7 gradients, dtype-scaled tolerance ladder
`:398-400,490-502`). The reference anchor here is a pure-numpy sequential
recurrence (no jit) mirroring `selective_scan_ref` semantics; candidates are
`selective_scan_xla` (the trainer fallback + VJP recompute path) and the
Pallas kernel in interpret mode (compiled-kernel parity runs on-TPU inside
bench.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vmambair_tpu.ops.selective_scan import selective_scan_xla
from vmambair_tpu.ops.pallas_scan import selective_scan

TOL = {
    "float32": dict(rtol=6e-4, atol=2e-3),
    "bfloat16": dict(rtol=3e-2, atol=5e-2),
}


def np_reference(u, delta, A, B, C, D=None, delta_bias=None,
                 delta_softplus=False, return_last_state=False):
    """Numpy port of the reference `selective_scan_ref`
    (`test_selective_scan.py:168-234`): fp32 recurrence
    h = exp(delta*A) h + delta*B*u; y = C.h (+ D u)."""
    u = np.asarray(u, np.float32)
    delta = np.asarray(delta, np.float32)
    A = np.asarray(A, np.float32)
    B = np.asarray(B, np.float32)  # (b, L, G, N)
    C = np.asarray(C, np.float32)
    b, L, dim = u.shape
    G, N = B.shape[2], A.shape[1]
    dg = dim // G
    if delta_bias is not None:
        delta = delta + np.asarray(delta_bias, np.float32)
    if delta_softplus:
        delta = np.where(delta > 20.0, delta, np.log1p(np.exp(
            np.minimum(delta, 20.0))))
    h = np.zeros((b, dim, N), np.float32)
    ys = np.empty((b, L, dim), np.float32)
    Bg = B.reshape(b, L, G, 1, N)
    Cg = C.reshape(b, L, G, 1, N)
    for t in range(L):
        dA = np.exp(delta[:, t, :, None] * A[None])          # (b, dim, N)
        dBu = (delta[:, t] * u[:, t])[:, :, None] * np.repeat(
            Bg[:, t], dg, axis=2).reshape(b, dim, N)
        h = dA * h + dBu
        ys[:, t] = np.sum(
            np.repeat(Cg[:, t], dg, axis=2).reshape(b, dim, N) * h, axis=-1)
    if D is not None:
        ys = ys + u * np.asarray(D, np.float32)[None, None]
    if return_last_state:
        return ys, h
    return ys


def stable_seed(*key):
    import zlib

    return zlib.crc32(repr(key).encode()) % 2**31


def make_inputs(seed, b, L, dim, N, G, dtype, with_D, with_bias,
                softplus=True):
    rng = np.random.default_rng(seed)
    u = rng.standard_normal((b, L, dim), np.float32)
    delta = 0.5 * rng.random((b, L, dim), np.float32)
    A = (-0.5 - np.exp(0.5 * rng.standard_normal((dim, N), np.float32)))
    B = rng.standard_normal((b, L, G, N), np.float32)
    C = rng.standard_normal((b, L, G, N), np.float32)
    D = rng.standard_normal((dim,), np.float32) if with_D else None
    # without softplus a negative effective delta flips exp(delta*A) into
    # growth; over L=4096 steps that amplifies impl rounding differences
    # beyond any fixed tolerance, so keep delta+bias >= 0 there
    bias = 0.1 * rng.standard_normal((dim,), np.float32) if with_bias else None
    if bias is not None and not softplus:
        bias = np.abs(bias)
    jd = jnp.dtype(dtype)
    return (jnp.asarray(u, jd), jnp.asarray(delta, jd), jnp.asarray(A),
            jnp.asarray(B, jd), jnp.asarray(C, jd),
            None if D is None else jnp.asarray(D),
            None if bias is None else jnp.asarray(bias))


def assert_close(y, y_ref, dtype, what, scale=1.0):
    tol = TOL[dtype]
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref, np.float32),
        rtol=tol["rtol"] * scale, atol=tol["atol"] * scale, err_msg=what)


@pytest.mark.parametrize("L", [64, 128, 256, 1024, 4096])
@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
@pytest.mark.parametrize("N", [4, 8, 16, 32, 64])
@pytest.mark.parametrize("G", [1, 2])
@pytest.mark.parametrize("flags", [
    (True, True, True), (False, False, False),
    (True, False, True), (False, True, False),
])
def test_xla_grid_vs_numpy_ref(L, dtype, N, G, flags):
    with_D, with_bias, softplus = flags
    b, dim = 2, 16 * G
    u, delta, A, B, C, D, bias = make_inputs(
        stable_seed(L, dtype, N, G, flags), b, L, dim, N, G, dtype,
        with_D, with_bias, softplus)
    y = selective_scan_xla(u, delta, A, B, C, D, bias,
                           delta_softplus=softplus)
    y_ref = np_reference(u, delta, A, B, C, D, bias, softplus)
    # bf16 inputs quantize before both impls; error budget is the bf16 ladder
    assert_close(y, y_ref, dtype, f"xla L={L} N={N} G={G} {flags}")


@pytest.mark.parametrize("L", [64, 1024])
@pytest.mark.parametrize("N", [4, 8, 16, 32, 64])
@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
@pytest.mark.parametrize("G", [1, 2])
def test_pallas_interpret_grid(L, N, dtype, G):
    b, dim = 1, 16 * G
    u, delta, A, B, C, D, bias = make_inputs(
        stable_seed(L, N, dtype, G), b, L, dim, N, G, dtype, True, True)
    y = selective_scan(u, delta, A, B, C, D, bias, delta_softplus=True,
                       impl="pallas", interpret=True)
    y_ref = np_reference(u, delta, A, B, C, D, bias, True)
    assert_close(y, y_ref, dtype, f"pallas L={L} N={N} G={G}")


@pytest.mark.parametrize("L", [64, 256])
@pytest.mark.parametrize("N", [4, 32])
def test_last_state_vs_numpy_ref(L, N):
    u, delta, A, B, C, D, bias = make_inputs(
        L * 100 + N, 2, L, 16, N, 1, "float32", True, True)
    y, h = selective_scan_xla(u, delta, A, B, C, D, bias,
                              delta_softplus=True, return_last_state=True)
    y_ref, h_ref = np_reference(u, delta, A, B, C, D, bias, True,
                                return_last_state=True)
    assert_close(y, y_ref, "float32", "y")
    assert_close(h, h_ref, "float32", "last_state", scale=2.0)


@pytest.mark.parametrize("L,N", [(64, 4), (256, 32)])
def test_gradient_grid_vs_xla_seq_equiv(L, N):
    """All 7 gradients of the XLA path vs numeric anchor: compare against
    the same path at fp64-free tolerance using jax.grad through the
    sequential lax.scan reference (`selective_scan_seq`)."""
    from vmambair_tpu.ops.selective_scan import selective_scan_seq

    u, delta, A, B, C, D, bias = make_inputs(
        L * 7 + N, 1, L, 16, N, 2, "float32", True, True)

    def loss(fn):
        def f(*args):
            y = fn(*args)
            return jnp.sum(y * jnp.cos(0.1 * jnp.arange(y.size, dtype=
                jnp.float32).reshape(y.shape)))
        return jax.grad(f, argnums=tuple(range(7)))(
            u, delta, A, B, C, D, bias)

    g_x = loss(lambda *a: selective_scan_xla(*a, delta_softplus=True))
    g_s = loss(lambda *a: selective_scan_seq(*a, True))
    for gx, gs, name in zip(
            g_x, g_s, ["du", "ddelta", "dA", "dB", "dC", "dD", "dbias"]):
        assert_close(gx, gs, "float32", f"grad {name}", scale=5.0)
