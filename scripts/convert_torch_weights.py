#!/usr/bin/env python
"""Convert reference VmambaIR PyTorch checkpoints to this framework's format.

Maps the reference's `net_g_*.pth` state dicts (`params` / `params_ema`
keys, NCHW conv weights, SS2D parameter names — see
`/root/reference/SRGAN/VmambaIR/archs/MambaSISR6_arch.py`) onto the OSSNet
Flax tree so golden-parity evaluation against pretrained reference weights
is possible (`base_model.py:213-309` save format).

    python scripts/convert_torch_weights.py --pth net_g_300000.pth \
        --arch MambaSISR6 --output net_g_300000.ckpt

Conventions converted:
  conv NCHW (out,in,kh,kw) -> HWIO (kh,kw,in,out); depthwise conv
  (out,1,kh,kw) -> (kh,kw,1,out); linear (out,in) -> (in,out) where the
  Flax module uses Dense; LayerNorm weight/bias pass through.
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def to_hwio(w):
    return np.transpose(w, (2, 3, 1, 0))


def to_dw_hwio(w):
    # torch depthwise: (C, 1, kh, kw) -> flax feature-group conv (kh, kw, 1, C)
    return np.transpose(w, (2, 3, 1, 0))


def conv_entry(src, tname, depthwise=False):
    """torch conv -> our Conv2d wrapper tree ({'conv': {kernel[, bias]}})."""
    w = src[f"{tname}.weight"]
    entry = {"kernel": to_dw_hwio(w) if depthwise else to_hwio(w)}
    if f"{tname}.bias" in src:
        entry["bias"] = src[f"{tname}.bias"]
    return {"conv": entry}


def norm_entry(src, tname):
    """reference LayerNorm(body.weight/bias) -> LayerNorm2d(weight/bias)."""
    out = {"weight": src[f"{tname}.body.weight"]}
    if f"{tname}.body.bias" in src:
        out["bias"] = src[f"{tname}.body.bias"]
    return out


def convert_block(src: dict, prefix: str, dst: dict):
    """One MamberBlock: norm1/attn(SS2D)/norm2/ffn."""
    out = {}
    for tnorm, fnorm in (("norm1", "norm1"), ("norm2", "norm2")):
        if f"{prefix}.{tnorm}.body.weight" in src:
            out[fnorm] = norm_entry(src, f"{prefix}.{tnorm}")
    # OSS / SS2D_1
    a = f"{prefix}.attn"
    attn = {
        "in_conv": conv_entry(src, f"{a}.in_conv"),
        "conv2d": conv_entry(src, f"{a}.conv2d", depthwise=True),
        "out_conv": conv_entry(src, f"{a}.out_conv"),
        "spatial": {
            "x_proj_weight": src[f"{a}.x_proj_weight"],
            "dt_projs_weight": src[f"{a}.dt_projs_weight"],
            "dt_projs_bias": src[f"{a}.dt_projs_bias"],
            "A_logs": src[f"{a}.A_logs"],
            "Ds": src[f"{a}.Ds"],
            # SS2D_1's out_norm is the arch LayerNorm wrapper -> .body.*
            "out_norm": norm_entry(src, f"{a}.out_norm"),
        },
    }
    # RealSR11 low-rank pair (`MambaRealSR11_arch.py:613-614`):
    # in_rank 1x1 conv -> Conv2d wrapper; out_rank nn.Linear (out, in)
    # -> flax Dense kernel (in, out)
    if f"{a}.in_rank.weight" in src:
        attn["in_rank"] = conv_entry(src, f"{a}.in_rank")
        attn["out_rank"] = {
            "kernel": np.transpose(src[f"{a}.out_rank.weight"], (1, 0))
        }
    channel = {
        "xc_proj_weight": src.get(f"{a}.xc_proj_weight"),
        "dtc_projs_weight": src.get(f"{a}.dtc_projs_weight"),
        "dtc_projs_bias": src.get(f"{a}.dtc_projs_bias"),
        "Ac_logs": src.get(f"{a}.Ac_logs"),
        "Dsc": src.get(f"{a}.Dcs", src.get(f"{a}.Dsc")),
    }
    if src.get(f"{a}.conv_cin.weight") is not None:
        channel["conv_cin_weight"] = src[f"{a}.conv_cin.weight"].reshape(
            -1, 1)
        channel["conv_cin_bias"] = src[f"{a}.conv_cin.bias"]
        channel["conv_cout_weight"] = src[f"{a}.conv_cout.weight"].reshape(
            1, -1)
        channel["conv_cout_bias"] = src[f"{a}.conv_cout.bias"]
    if f"{a}.channel_norm.body.weight" in src:
        channel["channel_norm"] = norm_entry(src, f"{a}.channel_norm")
    attn["channel"] = {k: v for k, v in channel.items() if v is not None}
    out["attn"] = attn
    # EFFN (project_in -> dwconv -> project_out)
    f = f"{prefix}.ffn"
    out["ffn"] = {
        "project_in": conv_entry(src, f"{f}.project_in"),
        "dwconv": conv_entry(src, f"{f}.dwconv", depthwise=True),
        "project_out": conv_entry(src, f"{f}.project_out"),
    }
    return out


LEVELS = [
    ("patch_embed.proj", "patch_embed"),
    ("down1_2.body.0", "down1_2"),
    ("down2_3.body.0", "down2_3"),
    ("down3_4.body.0", "down3_4"),
    ("up4_3.body.0", "up4_3"),
    ("up3_2.body.0", "up3_2"),
    ("up2_1.body.0", "up2_1"),
    ("reduce_chan_level3", "reduce_chan_level3"),
    ("reduce_chan_level2", "reduce_chan_level2"),
    ("output", "output"),
    ("skip_conv", "skip_conv"),
]

BLOCK_GROUPS = [
    ("encoder_level1", "encoder_level1"),
    ("encoder_level2", "encoder_level2"),
    ("encoder_level3", "encoder_level3"),
    ("latent", "latent"),
    ("decoder_level3", "decoder_level3"),
    ("decoder_level2", "decoder_level2"),
    ("decoder_level1", "decoder_level1"),
    ("refinement", "refinement"),
]


def convert_discriminator(state: dict):
    """Reference `UNetDiscriminatorSN` (`discriminator_arch.py:8-67`, torch
    `spectral_norm` buffers) -> (params, batch_stats) for
    `vmambair_tpu.models.discriminator.UNetDiscriminatorSN`.

    `convN.weight_orig` maps to the raw HWIO kernel; `convN.weight_u`
    ((O,) in torch) to flax SpectralNorm's u ((1, O)) — both frameworks'
    power iterations run in the out-channel space (torch iterates on
    W_mat (O, I*k*k), flax on its transpose reshaped (H*W*I, O)), so the
    u vectors are directly transplantable and the per-forward train-mode
    iteration v=normalize(W^T u); u=normalize(W v); sigma=u^T W v is
    identical. torch's persisted weight_v is recomputed from u on every
    train forward in both frameworks, so it is not carried. sigma is
    overwritten on the first update; seeded at 1.
    """
    src = {k: np.asarray(v) for k, v in state.items()}
    params = {
        "conv0": conv_entry(src, "conv0"),
        "conv9": conv_entry(src, "conv9"),
    }
    stats = {}
    for i in range(1, 9):
        params[f"conv{i}"] = {"kernel": to_hwio(src[f"conv{i}.weight_orig"])}
        stats[f"SpectralNorm_{i-1}"] = {
            f"conv{i}/kernel/u": src[f"conv{i}.weight_u"][None, :].astype(
                np.float32),
            f"conv{i}/kernel/sigma": np.float32(1.0),
        }
    return params, {"batch_stats": stats}


def convert(state: dict) -> dict:
    src = {k: np.asarray(v) for k, v in state.items()}
    dst = {}
    for tname, fname in LEVELS:
        if f"{tname}.weight" not in src:
            continue
        entry = conv_entry(src, tname)
        # patch_embed nests its Conv2d under "proj"; Down/Upsample modules
        # nest theirs under "conv" (module -> Conv2d wrapper -> nn.Conv)
        if fname == "patch_embed":
            entry = {"proj": entry}
        elif fname.startswith(("down", "up")):
            entry = {"conv": entry}
        dst[fname] = entry
    # upsampler tail: torch `tail = Sequential(Upsampler, conv)` ->
    # keys `tail.0.<i>.weight` (Upsampler convs at even i, PixelShuffle
    # between) and `tail.1.weight` (final conv). Older/raw layouts
    # (`up.<i>`, `conv_last`) are accepted too.
    up_convs = sorted(
        (int(m.group(1)))
        for k in src
        for m in [re.match(r"(?:tail\.0|up)\.(\d+)\.weight", k)]
        if m
    )
    for j, i in enumerate(up_convs):
        tname = f"tail.0.{i}" if f"tail.0.{i}.weight" in src else f"up.{i}"
        dst.setdefault("tail_upsampler", {})[f"conv{j}"] = conv_entry(
            src, tname
        )
    if "tail.1.weight" in src:
        dst["tail_conv"] = conv_entry(src, "tail.1")
    elif "conv_last.weight" in src:
        dst["tail_conv"] = conv_entry(src, "conv_last")
    for tgroup, fgroup in BLOCK_GROUPS:
        idx = 0
        while f"{tgroup}.{idx}.norm1.body.weight" in src or (
            f"{tgroup}.{idx}.attn.in_conv.weight" in src
        ):
            dst[f"{fgroup}_{idx}"] = convert_block(
                src, f"{tgroup}.{idx}", dst
            )
            idx += 1
    return dst


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pth", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--param_key", default=None,
                   help="params / params_ema (default: convert all present)")
    args = p.parse_args()

    import torch

    from vmambair_tpu.train.checkpoint import _atomic_write
    from flax import serialization

    ckpt = torch.load(args.pth, map_location="cpu", weights_only=True)
    keys = [args.param_key] if args.param_key else [
        k for k in ("params", "params_ema") if k in ckpt
    ]
    if not keys:  # bare state dict
        ckpt = {"params": ckpt}
        keys = ["params"]
    payload = {}
    for key in keys:
        state = {
            k: v.numpy() if hasattr(v, "numpy") else v
            for k, v in ckpt[key].items()
        }
        payload[key] = convert(state)
        print(f"{key}: {len(state)} torch tensors -> flax tree")
    _atomic_write(args.output, serialization.msgpack_serialize(payload))
    print("wrote", args.output)


if __name__ == "__main__":
    main()
