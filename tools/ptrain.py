#!/usr/bin/env python
"""End-to-end TRAIN PIPELINE throughput vs the pure device step.

VERDICT r3 #4: the device step was measured (bench.py train section) but
nobody had timed the pipeline — loader + feed_data + optimize — so
input-bound stalls were invisible. This harness builds a synthetic paired
dataset on disk, runs the real loader stack (EnlargedSampler + threaded
DataLoader + InfinitePrefetcher + DevicePrefetcher) through
SRModel.feed_data/optimize_parameters, and compares iterations/sec with a
loop that re-feeds one resident device batch (the pure-step bound).

Usage:
  # CPU mesh sanity (tiny net):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/ptrain.py --preset tiny --iters 40
  # TPU at the S1 recipe shapes (MambaSISR6, lq64 b8 -> gt256):
  python tools/ptrain.py --preset s1 --iters 12

Prints one JSON line: pipeline_step_ms, device_step_ms, overhead_pct,
data_wait_ms (host time blocked inside prefetcher.next()).
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def make_dataset(root, n, gt_size, scale):
    from vmambair_tpu.utils.img_util import imwrite

    gt_dir = os.path.join(root, "gt")
    lq_dir = os.path.join(root, "lq")
    os.makedirs(gt_dir, exist_ok=True)
    os.makedirs(lq_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(n):
        gt = (rng.rand(gt_size, gt_size, 3) * 255).astype(np.uint8)
        lq = (rng.rand(gt_size // scale, gt_size // scale, 3) * 255).astype(
            np.uint8)
        imwrite(gt, os.path.join(gt_dir, f"{i:03d}.png"))
        imwrite(lq, os.path.join(lq_dir, f"{i:03d}.png"))
    return gt_dir, lq_dir


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", choices=["tiny", "s1"], default="tiny")
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--workers", type=int, default=6)
    p.add_argument("--no-device-prefetch", action="store_true")
    args = p.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # noqa: BLE001
        pass

    if args.preset == "s1":
        scale, gt_size = 4, 256
        network = {"type": "MambaSISR6", "dtype": "bfloat16"}
    else:
        scale, gt_size = 4, 64
        network = {"type": "OSSNet", "scale": 4, "dim": 8,
                   "num_blocks": [1, 1, 1, 1], "num_refinement_blocks": 1,
                   "scan_impl": "xla"}

    tmp = tempfile.mkdtemp(prefix="ptrain_")
    n_imgs = max(2 * args.batch, 16)
    gt_dir, lq_dir = make_dataset(tmp, n_imgs, gt_size, scale)

    from vmambair_tpu.data import (
        DevicePrefetcher,
        InfinitePrefetcher,
        build_dataloader,
        build_dataset,
    )
    from vmambair_tpu.train import build_model

    ds_opt = {
        "name": "synth", "type": "PairedImageDataset", "phase": "train",
        "scale": scale, "gt_size": gt_size, "use_hflip": True,
        "use_rot": True, "dataroot_gt": gt_dir, "dataroot_lq": lq_dir,
        "io_backend": {"type": "disk"},
        "batch_size_per_gpu": args.batch, "num_worker_per_gpu": args.workers,
        "dataset_enlarge_ratio": 100, "num_gpu": 1,
    }
    dataset = build_dataset(dict(ds_opt))
    loader, _ = build_dataloader(dataset, dict(ds_opt), seed=0)

    opt = {
        "name": "ptrain", "model_type": "SRModel", "is_train": True,
        "scale": scale, "num_gpu": "auto", "manual_seed": 0,
        "network_g": network, "path": {},
        "datasets": {"train": ds_opt},
        "train": {
            "total_iter": 10**6, "ema_decay": 0.999,
            "optim_g": {"type": "Adam", "lr": 2e-4, "betas": [0.9, 0.99]},
            "scheduler": {"type": "MultiStepLR", "milestones": [10**6],
                          "gamma": 0.5},
            "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0,
                          "reduction": "mean"},
        },
        "val": {},
    }
    model = build_model(opt)

    prefetcher = InfinitePrefetcher(loader, 0)
    if not args.no_device_prefetch:
        prefetcher = DevicePrefetcher(prefetcher, model.put_batch)

    import jax.numpy as jnp

    def block():
        # through the axon tunnel `block_until_ready` alone does not
        # force execution — a HOST FETCH does (CLAUDE.md timing rules)
        leaf = jax.tree_util.tree_leaves(model.params)[0]
        return float(jnp.sum(leaf))

    # warmup: compile + fill prefetch queues
    for it in range(1, 4):
        model.feed_data(prefetcher.next())
        model.optimize_parameters(it)
    block()

    # pipeline timing: loader -> feed -> step, async dispatch throughout,
    # difference-timed (t(N) - t(1) cancels the fetch + tunnel RTT)
    state = {"it": 10, "wait": 0.0}

    def run_pipe(n):
        t0 = time.perf_counter()
        for _ in range(n):
            td = time.perf_counter()
            batch = prefetcher.next()
            state["wait"] += time.perf_counter() - td
            model.feed_data(batch)
            state["it"] += 1
            model.optimize_parameters(state["it"])
        block()
        return time.perf_counter() - t0

    run_pipe(1)  # settle queues after warmup
    tp1 = min(run_pipe(1) for _ in range(2))
    state["wait"] = 0.0
    tpn = run_pipe(args.iters)
    t_pipe = max(tpn - tp1, 1e-9) / (args.iters - 1)
    data_wait = state["wait"]

    # pure device-step bound: one resident batch re-fed every iteration
    batch = prefetcher.next()
    model.feed_data(batch)

    def run_dev(n):
        t0 = time.perf_counter()
        for _ in range(n):
            state["it"] += 1
            model.optimize_parameters(state["it"])
        block()
        return time.perf_counter() - t0

    run_dev(1)
    td1 = min(run_dev(1) for _ in range(2))
    tdn = run_dev(args.iters)
    t_dev = max(tdn - td1, 1e-9) / (args.iters - 1)

    print(json.dumps({
        "preset": args.preset,
        "backend": jax.default_backend(),
        "batch": args.batch, "gt_size": gt_size, "iters": args.iters,
        "device_prefetch": not args.no_device_prefetch,
        "pipeline_step_ms": round(t_pipe * 1e3, 2),
        "device_step_ms": round(t_dev * 1e3, 2),
        "overhead_pct": round(100.0 * (t_pipe - t_dev) / t_dev, 1),
        "data_wait_ms": round(data_wait / args.iters * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
