#!/usr/bin/env python
"""Single-image / folder inference CLI.

Rebuilds `RealSR/inference.py:35-68` (argparse scale/model/input/output,
pad-to-window forward, PNG out) over the OSS-UNet generators — the reference
file as shipped instantiates a fork-leftover DiffIR model; the intended flow
(pad -> forward -> unpad x scale) is implemented here against our models.

    python inference.py --model_path exp/net_g.ckpt --arch MambaRealSR11 \
        --input inputs/ --output results/ --scale 4 [--tile 256]
"""

import argparse
import glob
import os

import jax.numpy as jnp
import numpy as np

from vmambair_tpu.train import build_model
from vmambair_tpu.utils.img_util import batch2img, img2batch, imread, imwrite


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_path", type=str, required=True)
    parser.add_argument("--arch", type=str, default="MambaRealSR11")
    parser.add_argument("-i", "--input", type=str, default="inputs")
    parser.add_argument("-o", "--output", type=str, default="results")
    parser.add_argument("-s", "--scale", type=int, default=4)
    parser.add_argument(
        "--tile", type=int, default=0,
        help="fixed-tile chop inference (0 = whole image)",
    )
    parser.add_argument("--tile_pad", type=int, default=0)
    parser.add_argument(
        "--window", type=int, default=0,
        help="pad-to-multiple window; default 32/16/8 by scale "
        "(`RealSR/inference.py:19-33`)",
    )
    parser.add_argument(
        "--network_opt", type=str, default=None,
        help='JSON kwargs for the arch, e.g. \'{"dim": 48, '
        '"num_blocks": [15,1,1,1]}\'',
    )
    parser.add_argument(
        "--sp", action="store_true",
        help="sequence-parallel scans: shard each scan's L axis over all "
        "devices (giant whole-image inference that does not fit one chip; "
        "sets scan_impl=sp over a 1D mesh)",
    )
    args = parser.parse_args()

    if args.sp:
        import jax
        import numpy as np_

        from vmambair_tpu.parallel.mesh import set_default_sp_mesh
        from jax.sharding import Mesh

        set_default_sp_mesh(
            Mesh(np_.array(jax.devices()), ("data",)), "data"
        )

    # window-per-scale map matches the reference exactly
    # (`RealSR/inference.py:19-33`: scale 1 -> 32, 2 -> 16, 4 -> 8)
    window = args.window or {1: 32, 2: 16, 4: 8}.get(args.scale, 8)
    network_g = {"type": args.arch, "scale": args.scale}
    if args.sp:
        network_g["scan_impl"] = "sp"
    if args.network_opt:
        import json

        network_g.update(json.loads(args.network_opt))
    opt = {
        "name": "inference",
        "model_type": "SRModel",
        "is_train": False,
        "scale": args.scale,
        "num_gpu": 1,
        "manual_seed": 0,
        "network_g": network_g,
        "path": {"pretrain_network_g": args.model_path,
                 "param_key_g": "params_ema"},
        "val": {"window_size": window},
    }
    model = build_model(opt)

    os.makedirs(args.output, exist_ok=True)
    paths = (
        [args.input]
        if os.path.isfile(args.input)
        else sorted(glob.glob(os.path.join(args.input, "*")))
    )
    for path in paths:
        name = os.path.splitext(os.path.basename(path))[0]
        print(f"Processing {name} ...")
        img = imread(path, float32=True)
        model.lq = jnp.asarray(img2batch(img))
        if args.tile:
            model.test_tiled(args.tile, args.tile_pad)
        else:
            model.test()
        out = batch2img(np.asarray(model.output)[0])
        imwrite(out, os.path.join(args.output, f"{name}_out.png"))


if __name__ == "__main__":
    main()
