"""Logging: root logger, message logger with ETA, TensorBoard.

Counterpart of `/root/reference/Deraining/basicsr/utils/logger.py:10-174`
(`MessageLogger`, `get_root_logger`, `init_tb_logger`, env banner). wandb is
gated (not installed in this image).
"""

from __future__ import annotations

import datetime
import logging
import time
from typing import Optional

_initialized_loggers = set()


def get_root_logger(logger_name="vmambair_tpu", log_level=logging.INFO,
                    log_file: Optional[str] = None):
    logger = logging.getLogger(logger_name)
    if logger_name in _initialized_loggers:
        return logger
    fmt = "%(asctime)s %(levelname)s: %(message)s"
    sh = logging.StreamHandler()
    sh.setFormatter(logging.Formatter(fmt))
    logger.addHandler(sh)
    logger.propagate = False
    if log_file is not None:
        fh = logging.FileHandler(log_file, "w")
        fh.setFormatter(logging.Formatter(fmt))
        logger.addHandler(fh)
    logger.setLevel(log_level)
    _initialized_loggers.add(logger_name)
    return logger


def init_tb_logger(log_dir: str):
    try:
        from torch.utils.tensorboard import SummaryWriter
    except ImportError:  # pragma: no cover
        from tensorboardX import SummaryWriter
    return SummaryWriter(log_dir=log_dir)


def init_wandb_logger(opt):  # pragma: no cover - wandb not in image
    try:
        import wandb
    except ImportError:
        get_root_logger().warning("wandb not available; skipping")
        return None
    wandb.init(
        project=opt["logger"]["wandb"].get("project"),
        resume="allow",
        name=opt["name"],
        config=opt,
    )
    return wandb


def get_env_info() -> str:
    import jax
    import flax

    return (
        f"\n\tJAX {jax.__version__}, Flax {flax.__version__}"
        f"\n\tBackend: {jax.default_backend()}"
        f"\n\tDevices: {jax.devices()}"
    )


class MessageLogger:
    """Formats per-iteration training logs with LR/time/ETA and forwards
    scalars to TensorBoard (reference `logger.py:34-110`)."""

    def __init__(self, opt: dict, start_iter: int = 1, tb_logger=None):
        self.exp_name = opt["name"]
        self.interval = opt["logger"]["print_freq"]
        self.start_iter = start_iter
        self.max_iters = opt["train"]["total_iter"]
        self.use_tb_logger = opt["logger"].get("use_tb_logger", False)
        self.tb_logger = tb_logger
        self.start_time = time.time()
        self.logger = get_root_logger()

    def __call__(self, log_vars: dict):
        current_iter = log_vars.pop("iter")
        epoch = log_vars.pop("epoch", 0)
        lrs = log_vars.pop("lrs", None)
        if lrs is None:
            lr = log_vars.pop("lr", None)
            lrs = [lr] if lr is not None else []

        msg = (f"[{self.exp_name[:30]}..][epoch:{epoch:3d}, "
               f"iter:{current_iter:8,d}, lr:(")
        msg += ", ".join(f"{lr:.3e}" for lr in lrs) + ")] "

        if "time" in log_vars:
            iter_time = log_vars.pop("time")
            data_time = log_vars.pop("data_time", 0.0)
            total_time = time.time() - self.start_time
            time_sec_avg = total_time / max(current_iter - self.start_iter + 1, 1)
            eta_sec = time_sec_avg * (self.max_iters - current_iter - 1)
            eta_str = str(datetime.timedelta(seconds=int(eta_sec)))
            msg += f"[eta: {eta_str}, time (data): {iter_time:.3f} ({data_time:.3f})] "

        for k, v in log_vars.items():
            msg += f"{k}: {v:.4e} "
            if self.tb_logger and self.use_tb_logger:
                key = f"losses/{k}" if k.startswith("l_") else k
                self.tb_logger.add_scalar(key, v, current_iter)
        self.logger.info(msg)
