"""End-to-end training pipeline (L4).

Rebuilds the reference trainer skeleton
(`/root/reference/SRGAN/VmambaIR/train_pipeline.py:92-226`,
`Deraining/basicsr/train.py:131-317`): parse -> resume -> dirs -> loggers ->
dataloaders -> model -> prefetcher -> loop {lr, feed, optimize, log, save,
val}, plus the deraining trainer's **progressive learning** — a per-iter
(patch, batch) schedule (`train.py:213-271`) that on TPU maps to a small
fixed set of jit signatures (one compile per stage).
"""

from __future__ import annotations

import logging
import os
import time
from typing import Any, Dict, Optional

import numpy as np

from ..data import (
    DevicePrefetcher,
    InfinitePrefetcher,
    build_dataloader,
    build_dataset,
)
from ..parallel.mesh import init_distributed, is_main_process
from ..utils.logger import (
    MessageLogger,
    get_env_info,
    get_root_logger,
    init_tb_logger,
)
from ..utils.misc import (
    AvgTimer,
    check_resume,
    find_latest_state,
    make_exp_dirs,
    set_random_seed,
)
from ..utils.options import copy_opt_file, dict2str, parse_options
from ..utils.profiling import StepProfiler
from . import build_model

logger = logging.getLogger("vmambair_tpu")


def resolve_num_gpu(opt: Dict[str, Any]) -> int:
    """Resolve the reference's top-level `num_gpu` (int / "auto" / absent) to
    the actual data-parallel device count. The reference launches N DDP procs
    (`SRGAN/train_S1.sh`) so global batch = batch_size_per_gpu x N; under a
    single-controller mesh the multiplier must come from the mesh size, not
    default to 1 — otherwise recipe global batch 64 silently becomes 8."""
    import jax

    n_dev = opt.get("num_gpu")
    if n_dev in (None, "auto", 0):
        n_dev = len(jax.devices())
    return int(n_dev)


def create_train_val_dataloaders(opt: Dict[str, Any]):
    train_loader, val_loaders = None, []
    total_iters = int(opt["train"]["total_iter"])
    for phase, dataset_opt in (opt.get("datasets") or {}).items():
        if phase == "train":
            dataset_opt = dict(dataset_opt)
            dataset_opt.setdefault("num_gpu", resolve_num_gpu(opt))
            train_set = build_dataset(dataset_opt)
            train_loader, _ = build_dataloader(
                train_set, dataset_opt, seed=opt["manual_seed"]
            )
            num_iter_per_epoch = max(1, len(train_loader))
            total_epochs = -(-total_iters // num_iter_per_epoch)
            logger.info(
                "Training stats: %d images, %d iters/epoch, %d epochs "
                "for %d total iters.",
                len(train_set), num_iter_per_epoch, total_epochs,
                total_iters,
            )
        elif phase.split("_")[0] == "val":
            val_set = build_dataset(dict(dataset_opt))
            val_loader, _ = build_dataloader(val_set, dict(dataset_opt))
            val_loaders.append(val_loader)
    return train_loader, val_loaders


class ProgressiveSchedule:
    """Deraining progressive learning (`Deraining/basicsr/train.py:213-271`):
    at iteration thresholds `iters`, switch to (gt_size, batch) stages by
    subsampling the loaded max-size batch. Static shapes per stage -> one
    jit cache entry each."""

    def __init__(self, train_ds_opt: Dict[str, Any], scale: int):
        self.enabled = "iters" in train_ds_opt
        if not self.enabled:
            return
        self.iters = np.cumsum(train_ds_opt["iters"]).tolist()
        self.gt_sizes = list(train_ds_opt["gt_sizes"])
        self.batch_sizes = list(train_ds_opt["mini_batch_sizes"])
        self.gt_size = int(train_ds_opt["gt_size"])
        self.scale = scale
        self._logged = set()

    def apply(self, batch: Dict[str, Any], current_iter: int,
              rng: np.random.RandomState):
        if not self.enabled:
            return batch
        stage = next(
            (i for i, t in enumerate(self.iters) if current_iter <= t),
            len(self.iters) - 1,
        )
        if stage not in self._logged:
            logger.info(
                "Progressive stage %d: gt_size %d, batch %d",
                stage + 1, self.gt_sizes[stage], self.batch_sizes[stage],
            )
            self._logged.add(stage)
        mini_gt = self.gt_sizes[stage]
        mini_b = self.batch_sizes[stage]
        lq, gt = batch["lq"], batch["gt"]
        b = lq.shape[0]
        idx = rng.choice(b, size=min(mini_b, b), replace=False)
        lq, gt = lq[idx], gt[idx]
        s = self.scale
        lq_size = mini_gt // s
        h, w = lq.shape[1:3]
        if h > lq_size and w > lq_size:
            top = rng.randint(0, h - lq_size + 1)
            left = rng.randint(0, w - lq_size + 1)
            lq = lq[:, top : top + lq_size, left : left + lq_size]
            gt = gt[:, top * s : (top + lq_size) * s,
                    left * s : (left + lq_size) * s]
        out = dict(batch)
        out["lq"], out["gt"] = (
            np.ascontiguousarray(lq), np.ascontiguousarray(gt),
        )
        return out


def train_pipeline(root_path: str, opt: Optional[Dict[str, Any]] = None,
                   argv=None):
    if opt is None:
        opt = parse_options(root_path, is_train=True, argv=argv)
    init_distributed()
    set_random_seed(int(opt["manual_seed"]))

    # auto-resume (`train.py:138-150`): resolve the state path and rewire
    # pretrain_network_* to the paired net ckpts BEFORE the model is built —
    # the reference calls check_resume before create_model (`train.py:150` ->
    # `misc.py:137`); doing it after would leave the generator at random init
    # while only optimizer/EMA state gets restored.
    resume_state_path = (opt.get("path") or {}).get("resume_state")
    if opt.get("auto_resume") and not resume_state_path:
        resume_state_path = find_latest_state(
            opt["path"]["training_states"]
        )
    if resume_state_path:
        opt.setdefault("path", {})["resume_state"] = resume_state_path
        resume_iter = int(
            os.path.splitext(os.path.basename(resume_state_path))[0]
        )
        check_resume(opt, resume_iter)
    else:
        make_exp_dirs(opt)

    log_file = os.path.join(
        opt["path"]["log"], f"train_{opt['name']}_{int(time.time())}.log"
    )
    get_root_logger(log_file=log_file)
    logger.info(get_env_info())
    logger.info(dict2str(opt))
    if opt.get("opt_path"):
        copy_opt_file(opt["opt_path"], opt["path"]["experiments_root"])
    tb_logger = None
    if (opt.get("logger") or {}).get("use_tb_logger") and is_main_process():
        tb_logger = init_tb_logger(
            os.path.join(root_path, "tb_logger", opt["name"])
        )

    train_loader, val_loaders = create_train_val_dataloaders(opt)
    model = build_model(opt)

    start_epoch, current_iter = 0, 0
    if resume_state_path:
        rs = model.resume_training(resume_state_path)
        start_epoch, current_iter = rs["epoch"], rs["iter"]
        logger.info(
            "Resuming training from epoch %d, iter %d.",
            start_epoch, current_iter,
        )

    msg_logger = MessageLogger(opt, current_iter, tb_logger)
    prefetcher = InfinitePrefetcher(train_loader, start_epoch)
    # `train: profile_dir:` traces a fixed iteration window with
    # jax.profiler (SURVEY §5 tracing; the torch.profiler analog);
    # window via profile_start / profile_iters (default iters 10-12)
    profiler = StepProfiler(
        opt["train"].get("profile_dir"),
        int(opt["train"].get("profile_start", 10)),
        int(opt["train"].get("profile_iters", 3)),
    )
    progressive = ProgressiveSchedule(
        opt["datasets"]["train"], int(opt.get("scale", 1))
    )
    prog_rng = np.random.RandomState(int(opt["manual_seed"]) + 11)

    # device-side double-buffered prefetch (VERDICT r3 #4, the
    # CUDAPrefetcher analog): batch N+1's H2D transfer is issued while
    # step N computes. Opt out with `train: device_prefetch: false`.
    device_prefetch = bool(opt["train"].get("device_prefetch", True))
    if device_prefetch and hasattr(model, "put_batch"):
        base_iter = current_iter
        transform = (
            (lambda batch, seq: progressive.apply(
                batch, base_iter + seq, prog_rng))
            if progressive.enabled else None
        )
        prefetcher = DevicePrefetcher(
            prefetcher, model.put_batch, transform=transform
        )

    total_iters = int(opt["train"]["total_iter"])
    print_freq = int((opt.get("logger") or {}).get("print_freq", 100))
    save_freq = int(
        (opt.get("logger") or {}).get("save_checkpoint_freq", 10**9)
    )
    val_freq = int((opt.get("val") or {}).get("val_freq", 0) or 0)
    save_img = bool((opt.get("val") or {}).get("save_img", False))

    iter_timer, data_timer = AvgTimer(), AvgTimer()
    start_time = time.time()

    # pre-train validation pass — exercises the eval path at iter 0 like
    # the reference (`SRGAN/VmambaIR/train_pipeline.py:161-162`)
    if val_freq and current_iter == 0:
        logger.info("Pre-train validation at iter 0.")
        for val_loader in val_loaders:
            model.validation(val_loader, current_iter, tb_logger, save_img)

    logger.info("Start training from iter %d", current_iter)

    try:
        while current_iter < total_iters:
            data_timer.tic()
            batch = prefetcher.next()
            data_timer.toc()
            current_iter += 1
            if not isinstance(prefetcher, DevicePrefetcher):
                # device prefetch applies the progressive transform
                # before its one-step-ahead transfer
                batch = progressive.apply(batch, current_iter, prog_rng)
            profiler.step(current_iter)

            iter_timer.tic()
            model.feed_data(batch)
            model.optimize_parameters(current_iter)
            iter_timer.toc()

            if current_iter % print_freq == 0:
                log_vars = {
                    "epoch": prefetcher.epoch,
                    "iter": current_iter,
                    "time": iter_timer.get_avg_time(),
                    "data_time": data_timer.get_avg_time(),
                }
                log_vars.update(model.get_current_log())
                msg_logger(log_vars)

            if current_iter % save_freq == 0:
                logger.info("Saving models and training states.")
                model.save(prefetcher.epoch, current_iter)

            if val_freq and current_iter % val_freq == 0:
                for val_loader in val_loaders:
                    model.validation(
                        val_loader, current_iter, tb_logger, save_img
                    )
    finally:
        # flush an in-flight trace window even when the loop raises —
        # a crash inside the window is exactly when the trace matters
        profiler.close()
    consumed = time.time() - start_time
    logger.info("End of training. Time consumed: %.1fs", consumed)
    logger.info("Save the latest model.")
    model.save(epoch=prefetcher.epoch, current_iter=current_iter)
    if val_freq:
        for val_loader in val_loaders:
            model.validation(val_loader, current_iter, tb_logger, save_img)
    return model


def test_pipeline(root_path: str, opt: Optional[Dict[str, Any]] = None,
                  argv=None):
    """Eval entry (`SRGAN/VmambaIR/test.py:8-16` -> pip basicsr
    test_pipeline): build test loaders, load weights, run validation per
    dataset."""
    if opt is None:
        opt = parse_options(root_path, is_train=False, argv=argv)
    set_random_seed(int(opt["manual_seed"]))
    os.makedirs(opt["path"]["log"], exist_ok=True)
    log_file = os.path.join(
        opt["path"]["log"], f"test_{opt['name']}_{int(time.time())}.log"
    )
    get_root_logger(log_file=log_file)
    logger.info(get_env_info())
    logger.info(dict2str(opt))

    test_loaders = []
    for phase, dataset_opt in sorted((opt.get("datasets") or {}).items()):
        test_set = build_dataset(dict(dataset_opt))
        test_loader, _ = build_dataloader(test_set, dict(dataset_opt))
        logger.info(
            "Number of test images in %s: %d",
            dataset_opt.get("name"), len(test_set),
        )
        test_loaders.append(test_loader)

    model = build_model(opt)
    for test_loader in test_loaders:
        name = getattr(test_loader, "name", "test")
        logger.info("Testing %s...", name)
        metrics = model.validation(
            test_loader, current_iter=opt["name"],
            save_img=bool((opt.get("val") or {}).get("save_img", True)),
        )
        logger.info("Results [%s]: %s", name, metrics)
    return model
