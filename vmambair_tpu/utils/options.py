"""YAML option parsing — reference-compatible config schema.

Rebuilds `parse_options` (`/root/reference/Deraining/basicsr/utils/options.py:
31-110` and pip-basicsr's variant used at `SRGAN/VmambaIR/train_pipeline.py:
94`): one ordered-YAML file per run with sections name/model_type/scale/
num_gpu/manual_seed, datasets.{train,val_*,test_*}, network_g/_d, path,
train, val, logger, dist_params. `type:` strings instantiate registered
classes. The `debug` name shortcut flips fast val/log/ckpt frequencies.

TPU notes: `num_gpu` is accepted and mapped to the data-parallel device
count; `dist_params`/launcher flags are accepted but ignored (JAX is single-
controller — `jax.distributed.initialize` replaces process groups).
"""

from __future__ import annotations

import argparse
import os
import random
import sys
from pathlib import Path
from typing import Any, Dict, Optional

import yaml


def ordered_yaml_load(path_or_str, is_file=True):
    if is_file:
        with open(path_or_str, "r") as f:
            return yaml.safe_load(f)
    return yaml.safe_load(path_or_str)


def set_nested(d: dict, keys: str, value: Any):
    ks = keys.split(":")
    cur = d
    for k in ks[:-1]:
        cur = cur.setdefault(k, {})
    # parse value
    v: Any = value
    try:
        v = eval(value)  # noqa: S307 - matches basicsr --force_yml semantics
    except Exception:
        pass
    cur[ks[-1]] = v


def parse_options(root_path: str, is_train: bool = True, argv=None):
    """CLI-compatible with the reference: `-opt <yaml> [--launcher ...]
    [--auto_resume] [--debug] [--local_rank N] [--force_yml k:v ...]`."""
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", type=str, required=True, help="Path to YAML")
    parser.add_argument(
        "--launcher", choices=["none", "pytorch", "slurm", "jax"],
        default="none", help="accepted for CLI parity; JAX auto-initializes",
    )
    parser.add_argument("--auto_resume", action="store_true")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--local_rank", type=int, default=0)
    parser.add_argument(
        "--force_yml", nargs="+", default=None,
        help="Override yaml options, e.g. train:total_iter=100",
    )
    args = parser.parse_args(argv)

    opt = ordered_yaml_load(args.opt)
    if args.force_yml:
        for entry in args.force_yml:
            keys, value = entry.split("=", 1)
            set_nested(opt, keys.strip(), value.strip())

    opt["auto_resume"] = args.auto_resume
    opt["is_train"] = is_train
    opt["opt_path"] = args.opt
    if args.debug and not opt["name"].startswith("debug"):
        opt["name"] = "debug_" + opt["name"]

    return finalize_options(opt, root_path, is_train)


def finalize_options(opt: Dict, root_path: str, is_train: bool = True):
    """Pure-dict version of option finalization (usable from tests)."""
    opt.setdefault("is_train", is_train)
    opt.setdefault("manual_seed", None)
    if opt["manual_seed"] is None:
        opt["manual_seed"] = random.randint(1, 10000)

    # propagate phase/scale into dataset opts (reference `options.py:84-95`)
    for phase, dataset in (opt.get("datasets") or {}).items():
        phase_key = phase.split("_")[0]
        dataset["phase"] = phase_key
        if "scale" in opt:
            dataset["scale"] = opt["scale"]

    # experiment dir tree (reference `options.py:96-110`)
    root = Path(root_path)
    opt.setdefault("path", {})
    if is_train:
        exp_root = Path(opt["path"].get("experiments_root")
                        or root / "experiments" / opt["name"])
        opt["path"]["experiments_root"] = str(exp_root)
        opt["path"]["models"] = str(exp_root / "models")
        opt["path"]["training_states"] = str(exp_root / "training_states")
        opt["path"]["log"] = str(exp_root)
        opt["path"]["visualization"] = str(exp_root / "visualization")
        if "debug" in opt["name"]:
            opt.setdefault("val", {})
            if opt.get("val") is not None:
                opt["val"]["val_freq"] = 8
            opt.setdefault("logger", {})
            opt["logger"]["print_freq"] = 1
            opt["logger"]["save_checkpoint_freq"] = 8
    else:
        results_root = Path(opt["path"].get("results_root")
                            or root / "results" / opt["name"])
        opt["path"]["results_root"] = str(results_root)
        opt["path"]["log"] = str(results_root)
        opt["path"]["visualization"] = str(results_root / "visualization")
    return opt


def copy_opt_file(opt_path: str, experiments_root: str):
    """Copy the option file into the experiment dir for provenance
    (reference `train_pipeline.py:109`)."""
    import shutil
    import time

    os.makedirs(experiments_root, exist_ok=True)
    filename = Path(opt_path).name
    dst = Path(experiments_root) / filename
    if dst.exists():
        dst = Path(experiments_root) / (
            Path(opt_path).stem + f"_{time.strftime('%Y%m%d_%H%M%S')}.yml"
        )
    shutil.copyfile(opt_path, dst)


def dict2str(opt: dict, indent: int = 1) -> str:
    msg = "\n"
    for k, v in opt.items():
        if isinstance(v, dict):
            msg += " " * (indent * 2) + f"{k}:[" + dict2str(v, indent + 1)
            msg += " " * (indent * 2) + "]\n"
        else:
            msg += " " * (indent * 2) + f"{k}: {v}\n"
    return msg
