"""Metrics logging + profiling.

Replaces the reference's logging stack (ref: utils/logger.py LOGGER /
RunningMeter / TB_LOGGER, utils/metric_logger.py wandb gate at
utils/lib.py:28-35, agent.py:143-154 memory+lr lines) with:

* ``MetricsLogger`` — JSONL scalars on disk (always), optional wandb when
  importable and ``WANDB_ENABLE=1`` (same env gate as the reference);
* ``profile_steps`` — a `jax.profiler` trace context for N steps, the
  TPU-native upgrade SURVEY.md §5 calls for (the reference has no profiler
  integration at all — only a disabled DeepSpeed flops profiler);
* ``device_memory_stats`` — per-device live-bytes, the jax equivalent of the
  reference's ``T.cuda.max_memory_allocated`` log line (agent.py:149).
"""

from __future__ import annotations

import contextlib
import json
import logging
import os
import time
from typing import Any

import jax

logger = logging.getLogger(__name__)

WANDB_ENABLE = bool(int(os.environ.get("WANDB_ENABLE", "0")))


class MetricsLogger:
    """Append-only JSONL scalar log + optional wandb mirror."""

    def __init__(self, out_dir: str, run_name: str = "run",
                 use_wandb: bool | None = None):
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, "metrics.jsonl")
        self._fh = open(self.path, "a", buffering=1)
        self._wandb = None
        if use_wandb if use_wandb is not None else WANDB_ENABLE:
            try:
                import wandb
                self._wandb = wandb
                wandb.init(project=f"empirical_mvm_tpu_{run_name}",
                           dir=out_dir)
            except Exception as e:  # noqa: BLE001
                logger.warning("wandb unavailable: %s", e)

    def log(self, scalars: dict[str, Any], step: int) -> None:
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._fh.write(json.dumps(rec) + "\n")
        if self._wandb is not None:
            self._wandb.log(scalars, step=step)

    def close(self) -> None:
        self._fh.close()
        if self._wandb is not None:
            self._wandb.finish()


@contextlib.contextmanager
def profile_steps(out_dir: str):
    """Capture a jax profiler trace (view with tensorboard/xprof)."""
    os.makedirs(out_dir, exist_ok=True)
    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", out_dir)


def device_memory_stats() -> dict[str, int]:
    """Live/peak bytes per device where the backend reports them."""
    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats() or {}
            out[str(d)] = int(stats.get("bytes_in_use",
                                        stats.get("peak_bytes_in_use", 0)))
        except Exception:  # noqa: BLE001
            pass
    return out
