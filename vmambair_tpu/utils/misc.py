"""Misc utilities: seeding, dirs, scandir, resume discovery.

Counterpart of `/root/reference/Deraining/basicsr/utils/misc.py:12-180`.
"""

from __future__ import annotations

import os
import random
import time
from os import path as osp
from typing import Optional

import numpy as np


def set_random_seed(seed: int):
    random.seed(seed)
    np.random.seed(seed)


def get_time_str() -> str:
    return time.strftime("%Y%m%d_%H%M%S", time.localtime())


def mkdir_and_rename(path: str):
    """mkdir; if it exists, archive it with a timestamp suffix (reference
    `misc.py` behavior protecting old experiments)."""
    if osp.exists(path):
        new_name = path + "_archived_" + get_time_str()
        print(f"Path already exists. Renaming it to {new_name}", flush=True)
        os.rename(path, new_name)
    os.makedirs(path, exist_ok=True)


def make_exp_dirs(opt: dict):
    path_opt = dict(opt["path"])
    if opt["is_train"]:
        mkdir_and_rename(path_opt.pop("experiments_root"))
    else:
        mkdir_and_rename(path_opt.pop("results_root"))
    for key, p in path_opt.items():
        if ("strict_load" in key or "pretrain" in key or "resume" in key
                or "param_key" in key or p is None):
            continue
        os.makedirs(p, exist_ok=True)


def scandir(dir_path: str, suffix=None, recursive=False, full_path=False):
    """Recursively (optionally) scan files, yielding relative (or full)
    paths filtered by suffix."""
    root = dir_path

    def _scan(d):
        for entry in os.scandir(d):
            if entry.name.startswith("."):
                continue
            if entry.is_file():
                rel = (entry.path if full_path
                       else osp.relpath(entry.path, root))
                if suffix is None or rel.endswith(tuple(
                        [suffix] if isinstance(suffix, str) else suffix)):
                    yield rel
            elif recursive and entry.is_dir():
                yield from _scan(entry.path)

    return _scan(dir_path)


def sizeof_fmt(size: float, suffix="B") -> str:
    for unit in ["", "K", "M", "G", "T", "P", "E", "Z"]:
        if abs(size) < 1024.0:
            return f"{size:3.1f} {unit}{suffix}"
        size /= 1024.0
    return f"{size:3.1f} Y{suffix}"


def find_latest_state(state_dir: str) -> Optional[str]:
    """Find the highest-iteration training state for auto-resume (reference
    `train.py:138-150` scans `training_states/` for max `<iter>.state`)."""
    if not osp.isdir(state_dir):
        return None
    states = [f for f in os.listdir(state_dir) if f.endswith(".state")]
    if not states:
        return None
    iters = sorted(int(f.split(".state")[0]) for f in states
                   if f.split(".state")[0].isdigit())
    if not iters:
        return None
    return osp.join(state_dir, f"{iters[-1]}.state")


def check_resume(opt: dict, resume_iter: int):
    """Rewire pretrain paths to the checkpoints of the resumed iteration
    (reference `misc.py:137` check_resume)."""
    if not opt["path"].get("resume_state"):
        return
    for net in ("network_g", "network_d"):
        if net in opt and opt["path"].get(
                f"pretrain_{net.replace('network', 'network')}") is None:
            name = net.replace("network_", "net_")
            candidate = osp.join(
                opt["path"]["models"], f"{name}_{resume_iter}.ckpt"
            )
            if osp.exists(candidate):
                opt["path"][f"pretrain_{net}"] = candidate


class AvgTimer:
    """Iteration/data timers (reference `train_pipeline.py:163-186`)."""

    def __init__(self, window: int = 200):
        self.window = window
        self.avg_time = 0.0
        self.count = 0
        self.tic()

    def tic(self):
        self.start_time = time.time()

    def toc(self):
        dt = time.time() - self.start_time
        self.count += 1
        self.avg_time += (dt - self.avg_time) / min(self.count, self.window)
        self.start_time = time.time()
        return dt

    def get_avg_time(self):
        return self.avg_time
