"""Selective-scan parity suite.

Modeled on the reference kernel test
(`/root/reference/Mamba/kernels/selective_scan/test_selective_scan.py`):
candidate implementations are compared against the sequential reference over
a parameter grid (seqlen x dtype x D-skip x delta-bias x softplus x groups),
asserting forward outputs, last state, and all gradients within a
dtype-scaled tolerance ladder (fp32 rtol 6e-4 / atol 2e-3; bf16 3e-2/5e-2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vmambair_tpu.ops.selective_scan import (
    selective_scan_seq,
    selective_scan_xla,
)
from vmambair_tpu.ops.pallas_scan import selective_scan


TOL = {
    jnp.float32.dtype: dict(rtol=6e-4, atol=2e-3),
    jnp.bfloat16.dtype: dict(rtol=3e-2, atol=5e-2),
}


def make_inputs(key, batch, L, dim, N, G, dtype, with_D, with_bias):
    ks = jax.random.split(key, 6)
    u = jax.random.normal(ks[0], (batch, L, dim), dtype)
    # positive uniform delta, like the reference test (`test_selective_scan.py:
    # 0.5*torch.rand`): keeps exp(delta*A) <= 1 so the scan is stable
    delta = 0.5 * jax.random.uniform(ks[1], (batch, L, dim), dtype)
    A = -0.5 - jnp.exp(
        jax.random.normal(ks[2], (dim, N), jnp.float32) * 0.5
    )
    B = jax.random.normal(ks[3], (batch, L, G, N), dtype)
    C = jax.random.normal(ks[4], (batch, L, G, N), dtype)
    D = jax.random.normal(ks[5], (dim,), jnp.float32) if with_D else None
    bias = (
        0.1 * jax.random.normal(ks[5], (dim,), jnp.float32)
        if with_bias
        else None
    )
    return u, delta, A, B, C, D, bias


def check_close(a, b, dtype, what, scale=1.0):
    tol = TOL[jnp.dtype(dtype)]
    np.testing.assert_allclose(
        np.asarray(a, np.float32),
        np.asarray(b, np.float32),
        rtol=tol["rtol"] * scale,
        atol=tol["atol"] * scale,
        err_msg=what,
    )


IMPLS = {
    "xla": selective_scan_xla,
    "pallas_interpret": lambda *a, **kw: selective_scan(
        *a, **kw, impl="pallas", interpret=True
    ),
}


@pytest.mark.parametrize("L", [32, 64, 130, 256])
@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
@pytest.mark.parametrize("with_D", [True, False])
@pytest.mark.parametrize("with_bias,softplus", [(True, True), (False, False)])
@pytest.mark.parametrize("G", [1, 2])
def test_xla_forward_parity(L, dtype, with_D, with_bias, softplus, G):
    dtype = jnp.dtype(dtype)
    key = jax.random.PRNGKey(hash((L, str(dtype), with_D, with_bias, G)) % 2**31)
    batch, dim, N = 2, 8, 4
    u, delta, A, B, C, D, bias = make_inputs(
        key, batch, L, dim, N, G, dtype, with_D, with_bias
    )
    y_ref, h_ref = selective_scan_seq(
        u, delta, A, B, C, D, bias, softplus, return_last_state=True
    )
    y, h = selective_scan_xla(
        u, delta, A, B, C, D, bias, softplus, return_last_state=True,
        chunk_size=32,
    )
    check_close(y, y_ref, dtype, "forward out")
    check_close(h, h_ref, dtype, "last state")


@pytest.mark.parametrize("impl", ["xla"])
@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_gradient_parity(impl, dtype):
    dtype = jnp.dtype(dtype)
    key = jax.random.PRNGKey(0)
    batch, L, dim, N, G = 2, 64, 8, 4, 2
    u, delta, A, B, C, D, bias = make_inputs(
        key, batch, L, dim, N, G, dtype, True, True
    )
    fn = IMPLS[impl]

    def loss_ref(*args):
        y = selective_scan_seq(*args, delta_softplus=True)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def loss_new(*args):
        y = fn(*args, delta_softplus=True)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    args = (u, delta, A, B, C, D, bias)
    grads_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    grads_new = jax.grad(loss_new, argnums=tuple(range(7)))(*args)
    names = ["du", "ddelta", "dA", "dB", "dC", "dD", "dbias"]
    # gradient tolerances are looser, as in the reference test (x2-x10)
    for g_new, g_ref, name in zip(grads_new, grads_ref, names):
        check_close(g_new, g_ref, dtype, name, scale=5.0)


@pytest.mark.parametrize(
    "L,G", [(32, 1), (64, 2), (256, 2), (2048, 1), (1536, 2), (2304, 1)]
)  # 256 = multi-SUBCHUNK (carry-fold path), 2048 = multi-chunk (VMEM carry);
# 1536/2304 = non-power-of-two L (pad-to-window eval shapes: the chunk
# picker must fall back to 512/256 — `_pick_tiles` halving loop)
@pytest.mark.parametrize("dtype", ["float32"])
def test_pallas_interpret_forward_parity(L, G, dtype):
    """Pallas kernel (interpret mode, CPU) vs sequential reference,
    including grouped B/C (K directions folded into channels)."""
    dtype = jnp.dtype(dtype)
    key = jax.random.PRNGKey(42)
    batch, dim, N = 2, 16, 4
    u, delta, A, B, C, D, bias = make_inputs(
        key, batch, L, dim, N, G, dtype, True, True
    )
    y_ref = selective_scan_seq(u, delta, A, B, C, D, bias, True)
    y = selective_scan(
        u, delta, A, B, C, D, bias, True, impl="pallas", interpret=True
    )
    check_close(y, y_ref, dtype, "pallas forward")


def test_pallas_gradients_match_seq():
    key = jax.random.PRNGKey(7)
    batch, L, dim, N, G = 1, 32, 8, 4, 1
    u, delta, A, B, C, D, bias = make_inputs(
        key, batch, L, dim, N, G, jnp.float32, True, True
    )

    def loss(fn, *args):
        y = fn(*args, delta_softplus=True)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    args = (u, delta, A, B, C, D, bias)
    g_ref = jax.grad(lambda *a: loss(selective_scan_seq, *a), argnums=(0, 1, 2))(*args)
    g_pal = jax.grad(
        lambda *a: loss(
            lambda *aa, **kw: selective_scan(*aa, **kw, impl="pallas", interpret=True),
            *a,
        ),
        argnums=(0, 1, 2),
    )(*args)
    for a, b, n in zip(g_pal, g_ref, ["du", "ddelta", "dA"]):
        check_close(a, b, jnp.float32, n, scale=5.0)


def test_empty_D_and_no_bias():
    key = jax.random.PRNGKey(3)
    u, delta, A, B, C, _, _ = make_inputs(
        key, 1, 32, 4, 2, 1, jnp.float32, False, False
    )
    y_ref = selective_scan_seq(u, delta, A, B, C)
    y = selective_scan_xla(u, delta, A, B, C, chunk_size=16)
    check_close(y, y_ref, jnp.float32, "no-D no-bias")


@pytest.mark.parametrize("impl", ["xla", "pallas"])
@pytest.mark.parametrize("L", [64, 256])
def test_reverse_scan_parity(impl, L):
    """reverse=True == flip -> scan -> flip (the reference's directions 2/3
    without materializing the flips)."""
    key = jax.random.PRNGKey(3)
    batch, dim, N, G = 2, 16, 4, 2
    u, delta, A, B, C, D, bias = make_inputs(
        key, batch, L, dim, N, G, jnp.float32, True, True
    )
    kw = dict(D=D, delta_bias=bias, delta_softplus=True, impl=impl,
              interpret=(impl == "pallas"))
    y_rev = selective_scan(u, delta, A, B, C, reverse=True, **kw)
    y_ref = jnp.flip(
        selective_scan(
            jnp.flip(u, 1), jnp.flip(delta, 1), A, jnp.flip(B, 1),
            jnp.flip(C, 1), D=D, delta_bias=bias, delta_softplus=True,
            impl="seq",
        ),
        1,
    )
    check_close(y_rev, y_ref, jnp.float32, f"reverse {impl}")


def test_reverse_scan_gradients():
    key = jax.random.PRNGKey(5)
    batch, L, dim, N, G = 1, 32, 8, 4, 1
    u, delta, A, B, C, D, bias = make_inputs(
        key, batch, L, dim, N, G, jnp.float32, True, True
    )

    def loss(impl, rev):
        def f(u, delta, A, B, C, D, bias):
            if rev:
                y = selective_scan(
                    u, delta, A, B, C, D, bias, delta_softplus=True,
                    impl=impl, interpret=(impl == "pallas"), reverse=True,
                )
            else:
                y = jnp.flip(
                    selective_scan(
                        jnp.flip(u, 1), jnp.flip(delta, 1), A,
                        jnp.flip(B, 1), jnp.flip(C, 1), D, bias,
                        delta_softplus=True, impl=impl,
                    ),
                    1,
                )
            return jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape)))
        return jax.grad(f, argnums=(0, 1, 2, 3, 4, 5, 6))(
            u, delta, A, B, C, D, bias
        )

    g_new = loss("pallas", True)
    g_ref = loss("seq", False)
    for a, b, name in zip(g_new, g_ref,
                          ["u", "delta", "A", "B", "C", "D", "bias"]):
        check_close(a, b, jnp.float32, f"grad {name}", scale=5.0)


# ---------------------------------------------------------------- fused op

def _fused_inputs(key, b, L, G, d, N, R, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    u2 = jax.random.normal(ks[0], (b, L, G, d), dtype)
    xw = jax.random.normal(ks[1], (G, R + 2 * N, d), jnp.float32) * 0.3
    dw = jax.random.normal(ks[2], (G, d, R), jnp.float32) * 0.3
    db = 0.1 * jax.random.normal(ks[3], (G, d), jnp.float32)
    A = -0.5 - jnp.exp(
        jax.random.normal(ks[4], (G, d, N), jnp.float32) * 0.5
    )
    Ds = jax.random.normal(ks[5], (G, d), jnp.float32)
    return u2, xw, dw, db, A, Ds


def _fused_composite(u2, xw, dw, db, A, Ds, reverse):
    """The einsum chain + sequential scan the fused kernel replaces."""
    b, L, G, d = u2.shape
    N = A.shape[2]
    R = dw.shape[2]
    x_dbl = jnp.einsum("blgd,gcd->blgc", u2, xw)
    dts, Bs, Cs = jnp.split(x_dbl, [R, R + N], axis=-1)
    dts = jnp.einsum("blgr,gdr->blgd", dts, dw)
    u = u2.reshape(b, L, G * d)
    delta = dts.reshape(b, L, G * d)
    if reverse:
        u, delta = jnp.flip(u, 1), jnp.flip(delta, 1)
        Bs, Cs = jnp.flip(Bs, 1), jnp.flip(Cs, 1)
    y = selective_scan_seq(
        u, delta, A.reshape(G * d, N), Bs, Cs, Ds.reshape(-1),
        db.reshape(-1), True,
    )
    if reverse:
        y = jnp.flip(y, 1)
    return y.reshape(b, L, G, d)


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("L,d,N,R", [(64, 16, 4, 2), (128, 8, 16, 3)])
def test_fused_scan_forward_parity(reverse, L, d, N, R):
    from vmambair_tpu.ops.pallas_scan import oss_scan_fused

    args = _fused_inputs(jax.random.PRNGKey(11), 2, L, 2, d, N, R)
    y = oss_scan_fused(*args, reverse=reverse, interpret=True)
    y_ref = _fused_composite(*args, reverse=reverse)
    check_close(y, y_ref, jnp.float32, f"fused fwd reverse={reverse}")


@pytest.mark.parametrize("L", [64, 256])  # 256 = Pallas-bwd-kernel path
def test_fused_scan_dl_layout(L):
    """dl=True (SpatialScan's shared-transpose path): the op consumes and
    returns the kernel's (B, G, D, L) layout; values and all 6 gradients
    must match the L-major op wrapped in the same transposes."""
    from vmambair_tpu.ops.pallas_scan import oss_scan_fused

    args = _fused_inputs(jax.random.PRNGKey(29), 2, L, 2, 8, 4, 2)

    def via_dl(u2, *rest):
        u_dl = jnp.transpose(u2, (0, 2, 3, 1))
        y_dl = oss_scan_fused(u_dl, *rest, reverse=True, interpret=True,
                              dl=True)
        return jnp.transpose(y_dl, (0, 3, 1, 2))

    y = via_dl(*args)
    y_ref = _fused_composite(*args, reverse=True)
    check_close(y, y_ref, jnp.float32, f"fused dl fwd L={L}")

    def loss(fn):
        def f(*a):
            y = fn(*a)
            return jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape)))
        return jax.grad(f, argnums=tuple(range(6)))(*args)

    g_new = loss(via_dl)
    g_ref = loss(lambda *a: _fused_composite(*a, reverse=True))
    for a, b, name in zip(g_new, g_ref,
                          ["u2", "xw", "dw", "db", "A", "Ds"]):
        check_close(a, b, jnp.float32, f"fused dl grad {name}", scale=5.0)


def test_fused_scan_gradients():
    from vmambair_tpu.ops.pallas_scan import oss_scan_fused

    args = _fused_inputs(jax.random.PRNGKey(13), 1, 64, 2, 8, 4, 2)

    def loss(fn):
        def f(*a):
            y = fn(*a)
            return jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape)))
        return jax.grad(f, argnums=tuple(range(6)))(*args)

    g_new = loss(lambda *a: oss_scan_fused(*a, reverse=True, interpret=True))
    g_ref = loss(lambda *a: _fused_composite(*a, reverse=True))
    for a, b, name in zip(g_new, g_ref,
                          ["u2", "xw", "dw", "db", "A", "Ds"]):
        check_close(a, b, jnp.float32, f"fused grad {name}", scale=5.0)


def test_fused_scan_nblock_parity():
    """N=32 exercises the MAX_N_STACK state-blocking path."""
    from vmambair_tpu.ops.pallas_scan import oss_scan_fused

    args = _fused_inputs(jax.random.PRNGKey(17), 1, 64, 2, 8, 32, 2)
    y = oss_scan_fused(*args, interpret=True)
    y_ref = _fused_composite(*args, reverse=False)
    check_close(y, y_ref, jnp.float32, "fused N=32")


def test_oflex_out_dtype():
    """Independent output dtype (the reference's oflex variant,
    `cusoflex/selective_scan_fwd_kernel_oflex.cuh:19-24`): bf16 inputs,
    fp32 outputs, on both the XLA and Pallas paths."""
    key = jax.random.PRNGKey(21)
    u, delta, A, B, C, D, bias = make_inputs(
        key, 1, 64, 8, 4, 1, jnp.bfloat16, True, True
    )
    kw = dict(D=D, delta_bias=bias, delta_softplus=True,
              out_dtype=jnp.float32)
    y_x = selective_scan(u, delta, A, B, C, impl="xla", **kw)
    y_p = selective_scan(u, delta, A, B, C, impl="pallas", interpret=True,
                         **kw)
    assert y_x.dtype == jnp.float32 and y_p.dtype == jnp.float32
    check_close(y_p, y_x, jnp.bfloat16, "oflex pallas vs xla")
    # default (no out_dtype) still follows the input dtype
    y_d = selective_scan(u, delta, A, B, C, impl="xla", D=D,
                         delta_bias=bias, delta_softplus=True)
    assert y_d.dtype == jnp.bfloat16


# ------------------------------------------------- Pallas backward kernel

def _grads(fn, args, n):
    def f(*a):
        y = fn(*a).astype(jnp.float32)
        w = jnp.cos(0.37 * jnp.arange(y.size).reshape(y.shape))
        return jnp.sum(y * w)

    return jax.grad(f, argnums=tuple(range(n)))(*args)


@pytest.mark.parametrize("L", [32, 256, 2048])
@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
@pytest.mark.parametrize("reverse", [False, True])
def test_pallas_backward_kernel(L, dtype, reverse, monkeypatch):
    """The hand-written Pallas reverse-scan backward (interpret mode) vs the
    sequential reference, all 7 gradients, fp32 + bf16, both directions.
    L=32 single-subchunk, 256 multi-subchunk, 2048 multi-chunk (dh carried
    across grid steps). Asserts the kernel path actually ran (no silent
    XLA-recompute fallback)."""
    import vmambair_tpu.ops.pallas_scan as ps

    calls = []
    real = ps._scan_bwd_dl
    monkeypatch.setattr(
        ps, "_scan_bwd_dl",
        lambda *a, **kw: calls.append(1) or real(*a, **kw),
    )
    dtype = jnp.dtype(dtype)
    key = jax.random.PRNGKey(L + reverse)
    batch, dim, N, G = 2, 16, 4, 2
    args = make_inputs(key, batch, L, dim, N, G, dtype, True, True)

    def ref(u, delta, A, B, C, D, bias):
        if reverse:
            return jnp.flip(
                selective_scan_seq(
                    jnp.flip(u, 1), jnp.flip(delta, 1), A, jnp.flip(B, 1),
                    jnp.flip(C, 1), D, bias, delta_softplus=True,
                ),
                1,
            )
        return selective_scan_seq(u, delta, A, B, C, D, bias,
                                  delta_softplus=True)

    g_ref = _grads(ref, args, 7)
    g_new = _grads(
        lambda *a: selective_scan(
            *a, delta_softplus=True, impl="pallas", interpret=True,
            reverse=reverse,
        ),
        args, 7,
    )
    assert calls, "Pallas backward kernel was not used"
    for a, b, name in zip(g_new, g_ref,
                          ["du", "ddelta", "dA", "dB", "dC", "dD", "dbias"]):
        check_close(a, b, dtype, f"bwd-kernel {name}", scale=5.0)


def test_pallas_backward_kernel_multitile():
    """dg > 256 forces d_tile < dim//G: the per-tile dB/dC partials must be
    reduced within each group (`_scan_bwd_dl`)."""
    from vmambair_tpu.ops.pallas_scan import bwd_scan_supported

    key = jax.random.PRNGKey(5)
    batch, L, dim, N, G = 1, 128, 512, 2, 1
    assert bwd_scan_supported(L, dim, G, N)
    args = make_inputs(key, batch, L, dim, N, G, jnp.float32, True, True)
    g_ref = _grads(
        lambda *a: selective_scan_seq(*a, delta_softplus=True), args, 7
    )
    g_new = _grads(
        lambda *a: selective_scan(
            *a, delta_softplus=True, impl="pallas", interpret=True
        ),
        args, 7,
    )
    for a, b, name in zip(g_new, g_ref,
                          ["du", "ddelta", "dA", "dB", "dC", "dD", "dbias"]):
        check_close(a, b, jnp.float32, f"multitile {name}", scale=5.0)


@pytest.mark.parametrize("reverse", [False, True])
def test_fused_backward_kernel(reverse):
    """Fused-op VJP through the Pallas backward kernel (multi-subchunk L)
    vs the einsum+sequential composite."""
    from vmambair_tpu.ops.pallas_scan import oss_scan_fused

    args = _fused_inputs(jax.random.PRNGKey(23), 2, 256, 2, 8, 4, 3)

    def loss(fn):
        def f(*a):
            y = fn(*a).astype(jnp.float32)
            w = jnp.cos(0.37 * jnp.arange(y.size).reshape(y.shape))
            return jnp.sum(y * w)
        return jax.grad(f, argnums=tuple(range(6)))(*args)

    g_new = loss(lambda *a: oss_scan_fused(*a, reverse=reverse,
                                           interpret=True))
    g_ref = loss(lambda *a: _fused_composite(*a, reverse=reverse))
    for a, b, name in zip(g_new, g_ref,
                          ["u2", "xw", "dw", "db", "A", "Ds"]):
        check_close(a, b, jnp.float32, f"fused-bwd {name}", scale=5.0)


def test_sequence_parallel_scan():
    """L sharded over an 8-device mesh; carries combined via a log-step
    ppermute chain (vmambair_tpu/parallel/sp_scan.py). Must match the
    single-device sequential scan."""
    import numpy as np_
    from jax.sharding import Mesh

    from vmambair_tpu.parallel.sp_scan import selective_scan_sp

    devs = jax.devices()
    mesh = Mesh(np.array(devs), ("sp",))
    key = jax.random.PRNGKey(31)
    batch, L, dim, N, G = 2, 16 * len(devs), 16, 4, 2
    u, delta, A, B, C, D, bias = make_inputs(
        key, batch, L, dim, N, G, jnp.float32, True, True
    )
    y_sp = selective_scan_sp(
        u, delta, A, B, C, D, bias, True, mesh=mesh, axis="sp"
    )
    y_ref = selective_scan_seq(u, delta, A, B, C, D, bias, True)
    check_close(y_sp, y_ref, jnp.float32, "sequence-parallel scan")

    # gradients flow through the ppermute chain
    def loss(fn):
        def f(u, delta):
            y = fn(u, delta)
            return jnp.sum(y.astype(jnp.float32) ** 2)
        return jax.grad(f, argnums=(0, 1))(u, delta)

    g_sp = loss(lambda u_, d_: selective_scan_sp(
        u_, d_, A, B, C, D, bias, True, mesh=mesh, axis="sp"))
    g_ref = loss(lambda u_, d_: selective_scan_seq(
        u_, d_, A, B, C, D, bias, True))
    for a, b, n in zip(g_sp, g_ref, ["du", "ddelta"]):
        check_close(a, b, jnp.float32, f"sp grad {n}", scale=5.0)


# -- Matmul-dual formulation (round 5, VERDICT r4 #1): the TPU-default
# mid-shift MXU dual (`pallas_scan._scan_block_dual`), forced on via env
# and exercised in interpret mode on REALISTIC Mamba-init inputs: delta
# post-softplus log-uniform in [1e-3, 0.1] (the reference dt_init range)
# and A = -(1..N) (S4D-real init). On these distributions the dual's
# separated exponents are comfortably inside the fp32 clamp and it is
# exact to fp32 accumulation; the generic grids above use hot synthetic
# deltas (~0.7/step) that exceed the clamp BY DESIGN, which is why the
# dual defaults on only for real-TPU backends (`_dual_cfg`).


def _realistic_inputs(key, batch, L, dim, N, G, dtype):
    ks = jax.random.split(key, 6)
    u = jax.random.normal(ks[0], (batch, L, dim), dtype)
    tgt = jnp.exp(jax.random.uniform(
        ks[1], (batch, L, dim), jnp.float32,
        minval=jnp.log(1e-3), maxval=jnp.log(0.1)))
    delta = jnp.log(jnp.expm1(tgt)).astype(dtype)  # inverse-softplus
    A = -jnp.tile(
        jnp.arange(1.0, N + 1.0)[None], (dim, 1)).astype(jnp.float32)
    B = jax.random.normal(ks[3], (batch, L, G, N), dtype)
    C = jax.random.normal(ks[4], (batch, L, G, N), dtype)
    D = jax.random.normal(ks[5], (dim,), jnp.float32)
    bias = jnp.zeros((dim,), jnp.float32)
    return u, delta, A, B, C, D, bias


@pytest.mark.parametrize(
    "L,reverse", [(256, False), (256, True), (2048, False)]
)  # 256 = two windows (fix-up chain + window carry); 2048 = multi-chunk
@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_dual_scan_forward_parity(monkeypatch, L, reverse, dtype):
    monkeypatch.setenv("VMAMBAIR_SCAN_DUAL", "64")
    dtype = jnp.dtype(dtype)
    key = jax.random.PRNGKey(5)
    batch, dim, N, G = 2, 16, 4, 2
    u, delta, A, B, C, D, bias = _realistic_inputs(
        key, batch, L, dim, N, G, dtype)
    y_ref = selective_scan_seq(
        jnp.flip(u, 1) if reverse else u,
        jnp.flip(delta, 1) if reverse else delta,
        A,
        jnp.flip(B, 1) if reverse else B,
        jnp.flip(C, 1) if reverse else C,
        D, bias, True)
    if reverse:
        y_ref = jnp.flip(y_ref, 1)
    y = selective_scan(u, delta, A, B, C, D, bias, True,
                       impl="pallas", interpret=True, reverse=reverse)
    check_close(y, y_ref, dtype, f"dual fwd L={L} rev={reverse}")


def test_dual_scan_gradients(monkeypatch):
    """Backward kernel with dual inner scans (fwd recompute + reverse dh
    scan both run `_scan_block_dual`)."""
    monkeypatch.setenv("VMAMBAIR_SCAN_DUAL", "64")
    key = jax.random.PRNGKey(9)
    batch, L, dim, N, G = 1, 256, 16, 4, 1
    u, delta, A, B, C, D, bias = _realistic_inputs(
        key, batch, L, dim, N, G, jnp.float32)

    def loss(fn, *args):
        y = fn(*args, delta_softplus=True)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    args = (u, delta, A, B, C, D, bias)
    g_ref = jax.grad(
        lambda *a: loss(selective_scan_seq, *a),
        argnums=tuple(range(7)))(*args)
    g_dual = jax.grad(
        lambda *a: loss(
            lambda *aa, **kw: selective_scan(
                *aa, **kw, impl="pallas", interpret=True), *a),
        argnums=tuple(range(7)))(*args)
    names = ["du", "ddelta", "dA", "dB", "dC", "dD", "dbias"]
    for a, b, n in zip(g_dual, g_ref, names):
        check_close(a, b, jnp.float32, "dual grad " + n, scale=5.0)
