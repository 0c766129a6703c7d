"""Profiling / MFU accounting (SURVEY §5 tracing).

The reference relies on torch.profiler-style ad-hoc timing plus the
`flop_count` FLOPs table (`MambaSISR6_arch.py:137,649-676`); here the
equivalents are `jax.profiler` device traces and XLA `cost_analysis`.

Usage in training YAML:

    train:
      profile_dir: experiments/<name>/trace   # trace iters 10-12
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Optional

import jax

logger = logging.getLogger("vmambair_tpu")

# peak dense-matmul throughput per chip, FLOP/s
PEAK_FLOPS = {
    "tpu_v5e_bf16": 197e12,
    "tpu_v5e_int8": 394e12,
    "tpu_v4_bf16": 275e12,
}


@contextlib.contextmanager
def device_trace(logdir: str):
    """`jax.profiler.trace` wrapper that degrades to a no-op where the
    backend can't collect device traces (e.g. tunneled single-chip dev
    environments)."""
    try:
        jax.profiler.start_trace(logdir)
        started = True
        logger.info("jax.profiler trace started -> %s", logdir)
    except Exception as e:  # pragma: no cover - backend dependent
        logger.warning("profiler trace unavailable: %s", e)
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
                logger.info("jax.profiler trace written -> %s", logdir)
            except Exception as e:  # pragma: no cover
                logger.warning("profiler stop failed: %s", e)


def cost_flops(fn, *args) -> Optional[float]:
    """XLA-counted FLOPs of one call of jitted `fn(*args)` (None if the
    backend does not report a cost analysis)."""
    try:
        cost = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception:
        return None


def mfu(step_flops: float, step_seconds: float,
        peak: str = "tpu_v5e_bf16") -> float:
    """Model FLOPs utilization: achieved / peak."""
    return step_flops / step_seconds / PEAK_FLOPS[peak]


class StepProfiler:
    """Traces a fixed iteration window of the training loop."""

    def __init__(self, logdir: Optional[str], start_iter: int = 10,
                 n_iters: int = 3):
        self.logdir = logdir
        self.start_iter = start_iter
        self.end_iter = start_iter + n_iters
        self._active = False
        self._t0 = None

    def close(self):
        """Stop an in-flight trace (training ended inside the window)."""
        if self._active:
            try:
                jax.profiler.stop_trace()
            except Exception as e:  # pragma: no cover
                logger.warning("profiler stop failed: %s", e)
            self._active = False

    def step(self, current_iter: int):
        if not self.logdir:
            return
        if current_iter == self.start_iter and not self._active:
            try:
                jax.profiler.start_trace(self.logdir)
                self._active = True
                self._t0 = time.time()
                logger.info("profiling iters %d-%d -> %s", self.start_iter,
                            self.end_iter - 1, self.logdir)
            except Exception as e:  # pragma: no cover
                logger.warning("profiler unavailable: %s", e)
                self.logdir = None
        elif current_iter == self.end_iter and self._active:
            try:
                jax.profiler.stop_trace()
            except Exception as e:  # pragma: no cover
                logger.warning("profiler stop failed: %s", e)
            self._active = False
            logger.info(
                "profiler trace (%d iters, %.2fs) written -> %s",
                self.end_iter - self.start_iter, time.time() - self._t0,
                self.logdir,
            )
