#!/usr/bin/env python
"""Serving export — the TPU-native counterpart of the reference's ONNX
export (`/root/reference/RealSR/scripts/pytorch2onnx.py`, opset 11).

JAX's portable serving format is StableHLO via `jax.export`: the serialized
artifact replays on any XLA backend (TPU/GPU/CPU) without Python model code.

    python scripts/export_model.py --arch MambaSISR6 \
        [--ckpt net_g.ckpt] [--hw 128 128] --output model.stablehlo
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="MambaSISR6")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--param_key", default="params_ema")
    p.add_argument("--hw", type=int, nargs=2, default=[128, 128])
    p.add_argument("--batch", type=int, default=1)
    p.add_argument(
        "--network_opt", type=str, default=None,
        help='JSON kwargs for the arch (same as inference.py), e.g. '
             '\'{"dim": 48, "num_blocks": [15, 1, 1, 1]}\'',
    )
    p.add_argument("--output", required=True)
    args = p.parse_args()

    import json

    from jax import export as jexport

    from vmambair_tpu.models import build_network
    from vmambair_tpu.train.checkpoint import load_network

    network = dict(type=args.arch)
    if args.network_opt:
        network.update(json.loads(args.network_opt))
    net = build_network(network)
    x = jnp.zeros((args.batch, args.hw[0], args.hw[1], 3), jnp.float32)
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    if args.ckpt:
        params = load_network(args.ckpt, params, args.param_key)

    def fwd(x):
        return net.apply(params, x)

    exported = jexport.export(jax.jit(fwd))(
        jax.ShapeDtypeStruct(x.shape, x.dtype)
    )
    blob = exported.serialize()
    with open(args.output, "wb") as f:
        f.write(blob)
    print(
        f"exported {args.arch} ({args.batch}x{args.hw[0]}x{args.hw[1]}x3) "
        f"-> {args.output} ({len(blob)/1e6:.1f} MB StableHLO)"
    )


if __name__ == "__main__":
    main()
