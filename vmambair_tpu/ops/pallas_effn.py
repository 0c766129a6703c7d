"""Fused GDFN (EFFN) residual branch as one Pallas TPU kernel.

Computes `x + project_out(gelu(x1) * x2)` where
`[x1|x2] = dwconv3x3(project_in(LayerNorm(x)))` — the whole
`x = x + EFFN(norm2(x))` branch of a MamberBlock
(`/root/reference/SRGAN/VmambaIR/archs/MambaSISR6_arch.py:201-218,514`) —
in one VMEM-resident kernel per (batch, row-tile).

Motivation (round-4 component attribution, tools/kabl.py + tools/keffn.py):
XLA lowers the branch as norm -> conv -> grouped conv -> gate -> conv,
round-tripping the 2*int(2.66*dim)-channel hidden tensor through HBM five
times — 35 ms of the 591 ms MambaSISR6 inference step. The fused kernel
reads x once and writes the residual output once:

* LayerNorm in-kernel (fp32 stats over C, the lane axis), zero-masked at
  the padded border: project_in has no bias, so proj(0) == 0 and the
  depthwise conv's zero padding commutes with the projection — the halo
  needs no special casing anywhere.
* one MXU matmul lifts the row tile (+1 halo row each side) to the hidden
  channels; fp32 accumulation.
* depthwise 3x3 as 9 shifted multiply-adds on the VMEM tile (VPU).
* the gate split is lane-aligned by construction: weight columns are
  pre-padded so x1/x2 sit at 128-lane boundaries (hid = int(2.66*dim) is
  odd for every VmambaIR width: 127/255/510/1021).
* exact-erf gelu gate (torch F.gelu default, the reference's variant) + project_out
  matmul + residual add, single HBM write.

Backward: `jax.custom_vjp` recomputing through the exact XLA composite the
unfused model path runs (`_gdfn_xla`), so training gradients are bit-for-
bit the unfused path's; the kernel only accelerates the primal.

Measured (tools/keffn.py, v5e, bf16, min-over-repeats difference timing):
(8,128,128,48) 0.637 -> 0.325 ms; (8,128,128,96) 0.839 -> 0.324 ms —
2.0-2.6x on the shapes MambaSISR6 spends 30 full-resolution blocks on.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(v, m):
    return (v + m - 1) // m * m


# Chebyshev coefficients of erf(x)/x as a function of t = x^2/8 - 1 on
# x in [0, 4] (degree 15; fp32 Clenshaw max abs erf error 3.4e-7, and
# the |x| >= 4 clamp adds erf(4)-1 = -1.6e-8)
_ERF_CHEB = (
    0.48591295435811166, -0.3454078539825862, 0.16182909608649104,
    -0.0764827550695071, 0.03466993155523098, -0.01481186308283371,
    0.005922932494740369, -0.0022118395454634207, 0.00077140961367615,
    -0.0002515953985042691, 7.688019621922771e-05, -2.206418577167457e-05,
    5.953892856437347e-06, -1.5182566983058276e-06, 3.570062092940961e-07,
    -8.183356075540329e-08,
)


def _erf_clenshaw(x):
    """erf via a degree-15 Chebyshev fit of erf(x)/x, Clenshaw-evaluated
    (fp32 max abs err 3.4e-7; pure FMAs, no exp, no divide).

    RACED AND REJECTED as the production form (round 5): isolated keffn
    difference-timing read 0.536 -> 0.452 ms/block vs A&S, but the full
    bench step REGRESSED reproducibly (7.18 -> 7.06/7.07 MP/s, ~4.5 ms/
    step): the 15-step Clenshaw recurrence is one long dependency chain
    on the gate's critical path between the two MXU matmuls, where the
    A&S form's exp+reciprocal pipelines better. Kept as raced evidence.
    """
    a = jnp.minimum(jnp.abs(x), 4.0)
    t = a * a * 0.125 - 1.0
    t2 = 2.0 * t
    b1 = jnp.zeros_like(t)
    b2 = jnp.zeros_like(t)
    for c in _ERF_CHEB[:0:-1]:
        b1, b2 = c + t2 * b1 - b2, b1
    f = _ERF_CHEB[0] + t * b1 - b2
    # at the |x| >= 4 clamp, f*a = erf(4) = 1 - 1.6e-8: no select needed
    return jnp.sign(x) * f * a


def _erf(x):
    """erf via Abramowitz & Stegun 7.1.26 (max abs err 1.5e-7).

    Mosaic lowers neither `erf` nor `erfc`, so the exact-erf GELU the
    reference uses (torch F.gelu default) is computed from this
    polynomial inside the kernel; the ~1e-7 deviation from XLA's erf is
    far below the bf16 activation resolution (the VJP recomputes through
    the XLA composite with true erf). A division-free Clenshaw-Chebyshev
    alternative was raced and rejected in-context (`_erf_clenshaw`)."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    p = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - p * jnp.exp(-a * a))


def _erf_gelu(x):
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _pick_hb(h):
    """Row-tile height: largest of {16, 8, 4, 2, 1} dividing H (16 raced
    best in tools/keffn.py; VMAMBAIR_EFFN_HB overrides for re-racing)."""
    pref = int(os.environ.get("VMAMBAIR_EFFN_HB", "16"))
    for hb in (pref, 16, 8, 4, 2, 1):
        if hb <= h and h % hb == 0:
            return hb
    return 1


def _gdfn_kernel(x_ref, lnw_ref, lnb_ref, win_ref, wdw_ref, wout_ref,
                 o_ref, *, H, W, Wp, Hb, hp, eps):
    """Grid step (b, t): output rows [t*Hb, (t+1)*Hb) of batch b.

    x_ref (1, H+2, Wp, C): the whole zero-padded image — the block is
    grid-invariant in t, so Pallas fetches it once per batch (revisited
    blocks are not re-copied). o_ref (1, Hb, W, C).
    """
    t = pl.program_id(1)
    r0 = t * Hb
    xs = x_ref[0, pl.ds(r0, Hb + 2)]                    # (Hb+2, Wp, C)
    xf = xs.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    zn = (xf - mu) * jax.lax.rsqrt(var + eps) * lnw_ref[0] + lnb_ref[0]
    # zero the padded border (global rows 0/H+1, cols outside [1, W]) so
    # the projection of padding is exactly zero
    rows = jax.lax.broadcasted_iota(jnp.int32, (Hb + 2, Wp, 1), 0) + r0
    cols = jax.lax.broadcasted_iota(jnp.int32, (Hb + 2, Wp, 1), 1)
    valid = (rows != 0) & (rows != H + 1) & (cols >= 1) & (cols <= W)
    zn = jnp.where(valid, zn, 0.0).astype(x_ref.dtype)

    y1 = jnp.dot(zn.reshape((Hb + 2) * Wp, -1), win_ref[...],
                 preferred_element_type=jnp.float32)
    y1 = y1.reshape(Hb + 2, Wp, 2 * hp)

    acc = None
    for dy in range(3):
        for dx in range(3):
            w = wdw_ref[3 * dy + dx].astype(jnp.float32)
            term = y1[dy:dy + Hb, dx:dx + W] * w
            acc = term if acc is None else acc + term

    g = _erf_gelu(acc[..., :hp]) * acc[..., hp:]
    g = g.astype(x_ref.dtype)
    out = jnp.dot(g.reshape(Hb * W, hp), wout_ref[...],
                  preferred_element_type=jnp.float32)
    res = x_ref[0, pl.ds(r0 + 1, Hb)][:, 1:W + 1].astype(jnp.float32)
    o_ref[0] = (res + out.reshape(Hb, W, -1)).astype(o_ref.dtype)


def _gdfn_pallas(x, ln_w, ln_b, w_in, w_dw, w_out, *, eps, interpret):
    B, H, W, C = x.shape
    hid = w_out.shape[0]
    hp = _round_up(hid, 128)
    cdt = x.dtype

    # lane-align the gate split: columns [0:hid] -> [0:hid] (x1),
    # [hid:2hid] -> [hp:hp+hid] (x2); padded lanes give gelu(0)*0 = 0
    win = w_in.astype(cdt)
    wdw = w_dw.reshape(9, 2 * hid).astype(cdt)
    wout = w_out.astype(cdt)
    win_p = jnp.zeros((C, 2 * hp), cdt)
    win_p = win_p.at[:, :hid].set(win[:, :hid])
    win_p = win_p.at[:, hp:hp + hid].set(win[:, hid:])
    wdw_p = jnp.zeros((9, 2 * hp), cdt)
    wdw_p = wdw_p.at[:, :hid].set(wdw[:, :hid])
    wdw_p = wdw_p.at[:, hp:hp + hid].set(wdw[:, hid:])
    wout_p = jnp.zeros((hp, C), cdt).at[:hid].set(wout)

    Wp = _round_up(W + 2, 8)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, Wp - W - 1), (0, 0)))
    Hb = _pick_hb(H)

    kern = functools.partial(
        _gdfn_kernel, H=H, W=W, Wp=Wp, Hb=Hb, hp=hp, eps=eps)
    flops = (B * H * W * (C * 2 * hp + hp * C) * 2
             + B * H * W * 2 * hp * 9 * 2)
    return pl.pallas_call(
        kern,
        grid=(B, H // Hb),
        in_specs=[
            pl.BlockSpec((1, H + 2, Wp, C), lambda b, t: (b, 0, 0, 0)),
            pl.BlockSpec((1, C), lambda b, t: (0, 0)),
            pl.BlockSpec((1, C), lambda b, t: (0, 0)),
            pl.BlockSpec((C, 2 * hp), lambda b, t: (0, 0)),
            pl.BlockSpec((9, 2 * hp), lambda b, t: (0, 0)),
            pl.BlockSpec((hp, C), lambda b, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Hb, W, C), lambda b, t: (b, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * B * H * W * C * x.dtype.itemsize,
            transcendentals=B * H * W * hp,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xp, ln_w.reshape(1, C).astype(jnp.float32),
      ln_b.reshape(1, C).astype(jnp.float32), win_p, wdw_p, wout_p)


def _gdfn_xla(x, ln_w, ln_b, w_in, w_dw, w_out, *, eps):
    """The unfused model path (LayerNorm2d + three Conv2d + gelu gate),
    used by the custom_vjp backward recompute — gradients through the
    fused op are exactly the unfused path's."""
    cdt = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
    zn = ((xf - mu) * jax.lax.rsqrt(var + eps) * ln_w + ln_b).astype(cdt)
    y = jax.lax.conv_general_dilated(
        zn, w_in[None, None].astype(cdt), (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        y, w_dw[:, :, None].astype(cdt), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=y.shape[-1])
    hid = w_out.shape[0]
    g = jax.nn.gelu(y[..., :hid], approximate=False) * y[..., hid:]
    out = jax.lax.conv_general_dilated(
        g, w_out[None, None].astype(cdt), (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return x + out


@functools.lru_cache(maxsize=None)
def _make_gdfn_op(eps: float, interpret: bool):
    @jax.custom_vjp
    def op(x, ln_w, ln_b, w_in, w_dw, w_out):
        return _gdfn_pallas(x, ln_w, ln_b, w_in, w_dw, w_out,
                            eps=eps, interpret=interpret)

    def fwd(x, ln_w, ln_b, w_in, w_dw, w_out):
        return op(x, ln_w, ln_b, w_in, w_dw, w_out), (
            x, ln_w, ln_b, w_in, w_dw, w_out)

    def bwd(resid, gy):
        _, vjp = jax.vjp(
            functools.partial(_gdfn_xla, eps=eps), *resid)
        return vjp(gy)

    op.defvjp(fwd, bwd)
    return op


def gdfn_residual_fused(x, ln_w, ln_b, w_in, w_dw, w_out, *, eps=1e-5,
                        interpret=False):
    """`x + GDFN(LayerNorm(x))` as one Pallas kernel (differentiable).

    x (B,H,W,C); ln_w/ln_b (C,) fp32; w_in (C, 2h); w_dw (3,3,2h);
    w_out (h, C). Check `effn_fused_supported` first.
    """
    op = _make_gdfn_op(float(eps), bool(interpret))
    return op(x, ln_w, ln_b, w_in, w_dw, w_out)


def _oss_front_kernel(x_ref, lnw_ref, lnb_ref, wx_ref, bx_ref, wz_ref,
                      bz_ref, wdw_ref, bdw_ref, xs_ref, z_ref,
                      *, H, W, Wp, Hb, eps):
    """OSS front half: norm1 + in_conv(1x1, biased) + chunk + SiLU(z) +
    SiLU(dwconv3x3(x-half)) for output rows [t*Hb, (t+1)*Hb).

    The chunk is realized as two matmuls (x-half / z-half of the in_conv
    kernel), sidestepping any lane-offset gate split. in_conv's bias means
    proj(0) != 0, so the projected tile is re-masked to zero at the padded
    border — that is exactly the zero padding the reference dwconv sees.
    """
    t = pl.program_id(1)
    r0 = t * Hb
    xs_in = x_ref[0, pl.ds(r0, Hb + 2)]                 # (Hb+2, Wp, C)
    xf = xs_in.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    zn = (xf - mu) * jax.lax.rsqrt(var + eps) * lnw_ref[0] + lnb_ref[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (Hb + 2, Wp, 1), 0) + r0
    cols = jax.lax.broadcasted_iota(jnp.int32, (Hb + 2, Wp, 1), 1)
    valid = (rows != 0) & (rows != H + 1) & (cols >= 1) & (cols <= W)
    zn = jnp.where(valid, zn, 0.0).astype(x_ref.dtype)

    e = wx_ref.shape[-1]
    px = jnp.dot(zn.reshape((Hb + 2) * Wp, -1), wx_ref[...],
                 preferred_element_type=jnp.float32) + bx_ref[0]
    px = jnp.where(valid, px.reshape(Hb + 2, Wp, e), 0.0)

    acc = None
    for dy in range(3):
        for dx in range(3):
            w = wdw_ref[3 * dy + dx].astype(jnp.float32)
            term = px[dy:dy + Hb, dx:dx + W] * w
            acc = term if acc is None else acc + term
    xs_ref[0] = jax.nn.silu(acc + bdw_ref[0]).astype(xs_ref.dtype)

    zn_mid = zn[1:Hb + 1, 1:W + 1]
    pz = jnp.dot(zn_mid.reshape(Hb * W, -1), wz_ref[...],
                 preferred_element_type=jnp.float32) + bz_ref[0]
    z_ref[0] = jax.nn.silu(pz).reshape(Hb, W, -1).astype(z_ref.dtype)


def _oss_front_pallas(x, ln_w, ln_b, w_x, b_x, w_z, b_z, w_dw, b_dw,
                      *, eps, interpret):
    B, H, W, C = x.shape
    e = w_x.shape[-1]
    cdt = x.dtype
    Wp = _round_up(W + 2, 8)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, Wp - W - 1), (0, 0)))
    Hb = _pick_hb(H)

    kern = functools.partial(
        _oss_front_kernel, H=H, W=W, Wp=Wp, Hb=Hb, eps=eps)
    flops = B * H * W * (2 * C * e * 2 + e * 9 * 2)
    f32 = jnp.float32
    return pl.pallas_call(
        kern,
        grid=(B, H // Hb),
        in_specs=[
            pl.BlockSpec((1, H + 2, Wp, C), lambda b, t: (b, 0, 0, 0)),
            pl.BlockSpec((1, C), lambda b, t: (0, 0)),
            pl.BlockSpec((1, C), lambda b, t: (0, 0)),
            pl.BlockSpec((C, e), lambda b, t: (0, 0)),
            pl.BlockSpec((1, e), lambda b, t: (0, 0)),
            pl.BlockSpec((C, e), lambda b, t: (0, 0)),
            pl.BlockSpec((1, e), lambda b, t: (0, 0)),
            pl.BlockSpec((9, e), lambda b, t: (0, 0)),
            pl.BlockSpec((1, e), lambda b, t: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, Hb, W, e), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((1, Hb, W, e), lambda b, t: (b, t, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, e), x.dtype),
            jax.ShapeDtypeStruct((B, H, W, e), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=3 * B * H * W * C * x.dtype.itemsize,
            transcendentals=2 * B * H * W * e,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xp, ln_w.reshape(1, C).astype(f32), ln_b.reshape(1, C).astype(f32),
      w_x.astype(cdt), b_x.reshape(1, e).astype(f32),
      w_z.astype(cdt), b_z.reshape(1, e).astype(f32),
      w_dw.reshape(9, e).astype(cdt), b_dw.reshape(1, e).astype(f32))


def _oss_front_xla(x, ln_w, ln_b, w_x, b_x, w_z, b_z, w_dw, b_dw, *, eps):
    """Unfused model path (LayerNorm2d + in_conv + chunk + silu + dwconv),
    used by the custom_vjp backward recompute."""
    cdt = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
    zn = ((xf - mu) * jax.lax.rsqrt(var + eps) * ln_w + ln_b).astype(cdt)
    px = jax.lax.conv_general_dilated(
        zn, w_x[None, None].astype(cdt), (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b_x.astype(cdt)
    pz = jax.lax.conv_general_dilated(
        zn, w_z[None, None].astype(cdt), (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b_z.astype(cdt)
    dwx = jax.lax.conv_general_dilated(
        px, w_dw[:, :, None].astype(cdt), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=px.shape[-1]) + b_dw.astype(cdt)
    return jax.nn.silu(dwx), jax.nn.silu(pz)


@functools.lru_cache(maxsize=None)
def _make_oss_front_op(eps: float, interpret: bool):
    @jax.custom_vjp
    def op(x, ln_w, ln_b, w_x, b_x, w_z, b_z, w_dw, b_dw):
        return _oss_front_pallas(x, ln_w, ln_b, w_x, b_x, w_z, b_z,
                                 w_dw, b_dw, eps=eps, interpret=interpret)

    def fwd(*args):
        return op(*args), args

    def bwd(resid, gy):
        _, vjp = jax.vjp(
            functools.partial(_oss_front_xla, eps=eps), *resid)
        return vjp(gy)

    op.defvjp(fwd, bwd)
    return op


def oss_front_fused(x, ln_w, ln_b, w_x, b_x, w_z, b_z, w_dw, b_dw, *,
                    eps=1e-5, interpret=False):
    """OSS front half as one Pallas kernel: returns
    (silu(dwconv3x3(in_conv_x(LN(x)))), silu(in_conv_z(LN(x)))).

    x (B,H,W,C); w_x/w_z (C, E) in_conv kernel halves; b_x/b_z (E,);
    w_dw (3,3,E) depthwise; b_dw (E,). Differentiable via recompute
    through the exact unfused composite. Check `oss_front_supported`.
    """
    op = _make_oss_front_op(float(eps), bool(interpret))
    return op(x, ln_w, ln_b, w_x, b_x, w_z, b_z, w_dw, b_dw)


def oss_front_supported(shape, interpret=False):
    """Whether the fused OSS front kernel handles (B,H,W,C).

    DEFAULT OFF (`VMAMBAIR_OSS_FRONT=1` re-enables): the v5e A/B race
    (tools/kabl.py full, x4 SR tile128/b8) measured the front fusion as
    a +7.6 ms REGRESSION — 583.2 ms/step fused vs 575.6 unfused — even
    though the same machinery wins 2-2.6x for the GDFN/EFFN. The
    difference: XLA already fuses the OSS dwconv+SiLU into adjacent ops
    nearly for free (the no_dwconv ablation moved the step < noise), so
    the Pallas kernel's explicit VPU 9-shift + halo recompute buys no
    HBM-traffic reduction here, unlike the EFFN's five hidden-tensor
    round-trips. Kept (tested, interpret-covered) as measured evidence.
    """
    if os.environ.get("VMAMBAIR_EFFN_FUSED", "1") == "0":
        return False
    if os.environ.get("VMAMBAIR_OSS_FRONT", "0") != "1":
        return False
    if len(shape) != 4:
        return False
    b, h, w, c = shape
    if h < 3 or w < 3 or w % 8 != 0:
        return False
    if not interpret and jax.default_backend() != "tpu":
        return False
    hb = _pick_hb(h)
    tile_bytes = (hb + 2) * _round_up(w + 2, 8) * _round_up(c, 128) * 4
    return tile_bytes <= 48 * 1024 * 1024


def _oss_tail_kernel(yr_ref, yc_ref, z_ref, lnw_ref, lnb_ref, o_ref,
                     *, eps):
    """OSS tail: (y_row + y_colT) -> LayerNorm over C -> * z, one pass.

    All refs are (1, Hb, W, C) row tiles; stats in fp32 over the lane
    axis; the gate multiply runs in the model dtype, matching the unfused
    `out_norm(y).astype(x.dtype) * z` order exactly.
    """
    # sum in the scan output dtype THEN cast, exactly like the unfused
    # `(y_row + y_colT).astype(f32)` (bf16 inputs round before the norm)
    yf = (yr_ref[0] + yc_ref[0]).astype(jnp.float32)
    mu = jnp.mean(yf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(yf - mu), axis=-1, keepdims=True)
    zn = (yf - mu) * jax.lax.rsqrt(var + eps) * lnw_ref[0] + lnb_ref[0]
    o_ref[0] = zn.astype(o_ref.dtype) * z_ref[0]


def _oss_tail_pallas(y_row, y_colT, z, ln_w, ln_b, *, eps, interpret):
    B, H, W, C = z.shape
    Hb = _pick_hb(H)
    kern = functools.partial(_oss_tail_kernel, eps=eps)
    spec = pl.BlockSpec((1, Hb, W, C), lambda b, t: (b, t, 0, 0))
    vspec = pl.BlockSpec((1, C), lambda b, t: (0, 0))
    nbytes = (2 * y_row.dtype.itemsize + 2 * z.dtype.itemsize)
    return pl.pallas_call(
        kern,
        grid=(B, H // Hb),
        in_specs=[spec, spec, spec, vspec, vspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), z.dtype),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * H * W * C,
            bytes_accessed=B * H * W * C * nbytes,
            transcendentals=B * H * W,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(y_row, y_colT, z, ln_w.reshape(1, C).astype(jnp.float32),
      ln_b.reshape(1, C).astype(jnp.float32))


def _oss_tail_xla(y_row, y_colT, z, ln_w, ln_b, *, eps):
    """Unfused model path (merge + LayerNorm2d + gate), used by the
    custom_vjp backward recompute — gradients are the unfused path's."""
    yf = (y_row + y_colT).astype(jnp.float32)
    mu = jnp.mean(yf, -1, keepdims=True)
    var = jnp.mean(jnp.square(yf - mu), -1, keepdims=True)
    zn = (yf - mu) * jax.lax.rsqrt(var + eps) * ln_w + ln_b
    return zn.astype(z.dtype) * z


@functools.lru_cache(maxsize=None)
def _make_oss_tail_op(eps: float, interpret: bool):
    @jax.custom_vjp
    def op(y_row, y_colT, z, ln_w, ln_b):
        return _oss_tail_pallas(y_row, y_colT, z, ln_w, ln_b,
                                eps=eps, interpret=interpret)

    def fwd(*args):
        return op(*args), args

    def bwd(resid, gy):
        _, vjp = jax.vjp(
            functools.partial(_oss_tail_xla, eps=eps), *resid)
        return vjp(gy)

    op.defvjp(fwd, bwd)
    return op


def oss_tail_fused(y_row, y_colT, z, ln_w, ln_b, *, eps=1e-5,
                   interpret=False):
    """OSS scan epilogue as one Pallas kernel (differentiable):
    `out_norm(y_row + y_colT).astype(z.dtype) * z`.

    Replaces the XLA chain merge -> LayerNorm (multi-pass: stats + apply)
    -> gate multiply after the spatial scans (`SS2D_1.forward_corev1`
    merge + `self.out_norm` + `y1 * z`, `MambaSISR6_arch.py:430-436,489`)
    with a single read of each input and a single write. y_row/y_colT
    (B,H,W,C) are the row-major scan sum and the H/W-transposed col-major
    sum (the transpose stays in XLA — in-kernel transposes measured ~4 ms,
    docs/PERF.md); z is the SiLU gate. Check `oss_tail_supported` first.
    """
    op = _make_oss_tail_op(float(eps), bool(interpret))
    return op(y_row, y_colT, z, ln_w, ln_b)


def oss_tail_supported(shape, interpret=False):
    """Whether the fused OSS tail kernel handles (B,H,W,C) gates.

    DEFAULT OFF (`VMAMBAIR_OSS_TAIL=1` re-enables): the v5e in-context
    race (tools/kabl.py no_tailfuse, x4 SR tile128/b8) measured the tail
    fusion as a +11.3 ms REGRESSION — 587.4 ms/step fused vs 576.1
    unfused. Unfused, XLA reads the col-major scan sum through the H/W
    transpose as a fusion input (never materialized) and fuses the merge
    + LN-apply + gate into ~2 passes; the Pallas kernel forces y_colT to
    materialize in HBM and pads the 48-lane levels to 128. Kept (tested,
    interpret-covered) as measured evidence, like the front kernel."""
    if os.environ.get("VMAMBAIR_EFFN_FUSED", "1") == "0":
        return False
    if os.environ.get("VMAMBAIR_OSS_TAIL", "0") != "1":
        return False
    if len(shape) != 4:
        return False
    b, h, w, c = shape
    if w % 8 != 0 or h < 1:
        return False
    if not interpret and jax.default_backend() != "tpu":
        return False
    hb = _pick_hb(h)
    tile_bytes = 4 * hb * w * _round_up(c, 128) * 4
    return tile_bytes <= 48 * 1024 * 1024


def effn_fused_supported(shape, hid, interpret=False):
    """Whether the fused kernel handles (B,H,W,C) with hidden width `hid`
    on this backend.

    Bias-carrying FFNs are the caller's responsibility to exclude (the
    padding-commutation argument needs a bias-free project_in).
    """
    if os.environ.get("VMAMBAIR_EFFN_FUSED", "1") == "0":
        return False
    if len(shape) != 4:
        return False
    b, h, w, c = shape
    if h < 3 or w < 3 or w % 8 != 0:
        return False
    if not interpret and jax.default_backend() != "tpu":
        return False
    # VMEM for the hidden row-tile: (Hb+2, round_up(W+2,8), 2*hp) fp32
    hb = _pick_hb(h)
    hp = _round_up(hid, 128)
    tile_bytes = (hb + 2) * _round_up(w + 2, 8) * 2 * hp * 4
    return tile_bytes <= 48 * 1024 * 1024
