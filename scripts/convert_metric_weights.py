#!/usr/bin/env python
"""Convert torch metric/loss weights to the .npz format the JAX metric stack
loads (`losses/perceptual.py`, `metrics/lpips.py`, `metrics/dists.py`).

Sources (standard published checkpoints; downloads are impossible in the
build environment, so this runs wherever the user has the files):

  torchvision VGG19/VGG16 `.pth` state dicts (features.N.weight, OIHW)
      -> conv{i}_{j}/kernel (HWIO) + conv{i}_{j}/bias
  lpips package `vgg.pth` (lin heads `lin{k}.model.1.weight`, (1,C,1,1))
      -> lin{k}/weight (C,)
  DISTS `weights.pt` (alpha/beta (1,C,1,1) buffers)
      -> alpha, beta (1, C)
  InceptionV3-FID `pt_inception-2015-12-05.pth` (BasicConv2d conv+bn)
      -> <module>/kernel (HWIO, BN folded) + <module>/bias   [FID pool3]

Usage:
  python scripts/convert_metric_weights.py --vgg19 vgg19.pth -o vgg19.npz
  python scripts/convert_metric_weights.py --vgg16 vgg16.pth \
      --lpips lpips_vgg.pth -o lpips_vgg16.npz
  python scripts/convert_metric_weights.py --vgg16 vgg16.pth \
      --dists weights.pt -o dists_vgg16.npz
  python scripts/convert_metric_weights.py \
      --inception pt_inception-2015-12-05.pth -o inception_fid.npz
"""

import argparse

import numpy as np

# torchvision `features` module indices of each conv, in plan order
VGG19_IDX = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34]
VGG16_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
VGG19_NAMES = [
    "conv1_1", "conv1_2", "conv2_1", "conv2_2",
    "conv3_1", "conv3_2", "conv3_3", "conv3_4",
    "conv4_1", "conv4_2", "conv4_3", "conv4_4",
    "conv5_1", "conv5_2", "conv5_3", "conv5_4",
]
VGG16_NAMES = [
    "conv1_1", "conv1_2", "conv2_1", "conv2_2",
    "conv3_1", "conv3_2", "conv3_3",
    "conv4_1", "conv4_2", "conv4_3",
    "conv5_1", "conv5_2", "conv5_3",
]


def _np(t):
    return t.numpy() if hasattr(t, "numpy") else np.asarray(t)


def convert_vgg(state: dict, names, idx, prefix="features") -> dict:
    """torchvision VGG state dict -> {conv name: kernel HWIO / bias}."""
    out = {}
    for name, i in zip(names, idx):
        w = _np(state[f"{prefix}.{i}.weight"])  # (O, I, kh, kw)
        b = _np(state[f"{prefix}.{i}.bias"])
        out[f"{name}/kernel"] = np.transpose(w, (2, 3, 1, 0))
        out[f"{name}/bias"] = b
    return out


def convert_lpips_lins(state: dict) -> dict:
    """lpips lin heads -> lin{k}/weight (C,). Accepts both `lin{k}.model.1.
    weight` (lpips package) and `lins.{k}.model.1.weight` layouts."""
    out = {}
    for k in range(5):
        for key in (f"lin{k}.model.1.weight", f"lins.{k}.model.1.weight"):
            if key in state:
                out[f"lin{k}/weight"] = _np(state[key]).reshape(-1)
                break
    if not out:
        raise KeyError(
            "no lin heads found (expected lin{k}.model.1.weight keys)"
        )
    return out


def convert_dists_ab(state: dict) -> dict:
    """DISTS weights.pt alpha/beta -> (1, C) arrays."""
    return {
        "alpha": _np(state["alpha"]).reshape(1, -1),
        "beta": _np(state["beta"]).reshape(1, -1),
    }


def convert_inception(state: dict, bn_eps: float = 1e-3) -> dict:
    """InceptionV3-FID checkpoint (`pt_inception-2015-12-05.pth`, the
    published-FID network the reference loads — `Deraining/basicsr/metrics/
    fid.py:10-19`) -> `<module>/kernel` (HWIO) + `<module>/bias` with each
    BasicConv2d's BatchNorm folded into the conv:
        k' = k * gamma / sqrt(var + eps);  b' = beta - mean * gamma / ...
    (the convs are bias-free, BN eps is torchvision's 1e-3). The `fc`
    classifier head is dropped — FID uses pool3 features only."""
    out = {}
    for key in state:
        if not key.endswith(".conv.weight"):
            continue
        mod = key[: -len(".conv.weight")]
        w = _np(state[key])  # (O, I, kh, kw)
        gamma = _np(state[f"{mod}.bn.weight"])
        beta = _np(state[f"{mod}.bn.bias"])
        mean = _np(state[f"{mod}.bn.running_mean"])
        var = _np(state[f"{mod}.bn.running_var"])
        scale = gamma / np.sqrt(var + bn_eps)
        out[f"{mod}/kernel"] = np.transpose(
            w * scale[:, None, None, None], (2, 3, 1, 0)
        ).astype(np.float32)
        out[f"{mod}/bias"] = (beta - mean * scale).astype(np.float32)
    if not out:
        raise KeyError(
            "no BasicConv2d modules found (expected *.conv.weight keys)"
        )
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--vgg19", help="torchvision vgg19 .pth")
    p.add_argument("--vgg16", help="torchvision vgg16 .pth")
    p.add_argument("--lpips", help="lpips package vgg.pth (lin heads)")
    p.add_argument("--dists", help="DISTS weights.pt (alpha/beta)")
    p.add_argument(
        "--inception",
        help="InceptionV3-FID pt_inception-2015-12-05.pth (pool3 FID)",
    )
    p.add_argument("-o", "--output", required=True)
    args = p.parse_args()

    import torch

    out = {}
    if args.vgg19:
        st = torch.load(args.vgg19, map_location="cpu", weights_only=True)
        out.update(convert_vgg(st, VGG19_NAMES, VGG19_IDX))
    if args.vgg16:
        st = torch.load(args.vgg16, map_location="cpu", weights_only=True)
        out.update(convert_vgg(st, VGG16_NAMES, VGG16_IDX))
    if args.lpips:
        st = torch.load(args.lpips, map_location="cpu", weights_only=True)
        out.update(convert_lpips_lins(st))
    if args.dists:
        st = torch.load(args.dists, map_location="cpu", weights_only=True)
        out.update(convert_dists_ab(st))
    if args.inception:
        st = torch.load(args.inception, map_location="cpu",
                        weights_only=True)
        if not isinstance(st, dict) or "state_dict" in st:
            st = st["state_dict"]
        out.update(convert_inception(st))
    if not out:
        raise SystemExit("nothing to convert: pass at least one source")
    np.savez(args.output, **out)
    print(f"wrote {args.output} with {len(out)} arrays")


if __name__ == "__main__":
    main()
