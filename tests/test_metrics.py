"""Tests for the metrics logger + profiler utilities."""

import json
import os

import tests.conftest  # noqa: F401

from empirical_mvm_tpu.train.metrics import (MetricsLogger,
                                             device_memory_stats,
                                             profile_steps)


def test_metrics_jsonl(tmp_path):
    ml = MetricsLogger(str(tmp_path), "unit", use_wandb=False)
    ml.log({"loss": 1.5, "acc": 0.25}, step=1)
    ml.log({"loss": 1.25}, step=2)
    ml.close()
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["loss"] == 1.5 and lines[0]["step"] == 1
    assert lines[1]["step"] == 2


def test_device_memory_stats():
    stats = device_memory_stats()
    assert isinstance(stats, dict)


def test_profile_trace_writes(tmp_path):
    import jax.numpy as jnp
    out = str(tmp_path / "trace")
    with profile_steps(out):
        (jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()
    found = []
    for root, _, files in os.walk(out):
        found.extend(files)
    assert found  # some trace artifact exists
