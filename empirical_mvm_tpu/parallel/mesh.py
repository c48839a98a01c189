"""Device mesh + sharding rules — the TPU-native replacement for the
reference's NCCL data parallelism.

The reference supports exactly one parallelism strategy: single-node data
parallelism via DeepSpeed ZeRO-1 or DDP (ref: agent.py:195-201,
utils/dist.py:20-75; SURVEY.md §2.3). Here that maps to a 1-D ``data`` mesh
over all chips: the batch is sharded on ``data``, params are replicated, and
XLA inserts the gradient all-reduce over ICI when the jitted train step
requests replicated gradients — no hand-written collectives.

``fsdp_rules`` additionally offers ZeRO-3-style parameter sharding (a strict
upgrade over the reference's ZeRO-1) for large configs: parameters shard
their largest dimension over ``data`` and XLA all-gathers them just-in-time.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None,
              axis_name: str = "data") -> Mesh:
    """1-D data mesh over all (or the first n) devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def make_data_mesh(batch_size: int, axis_name: str = "data") -> Mesh:
    """1-D data mesh whose size divides the per-step batch (a batch sharded
    on ``data`` must split evenly; use the largest divisor of batch_size that
    fits the device count)."""
    n = len(jax.devices())
    best = 1
    for k in range(min(n, batch_size), 0, -1):
        if batch_size % k == 0:
            best = k
            break
    if best < n:
        import logging
        logging.getLogger(__name__).warning(
            "batch size %d only divides across %d of %d devices — %d chips "
            "will sit IDLE. Pick a batch size divisible by the device count.",
            batch_size, best, n, n - best)
    return make_mesh(best, axis_name)


def pad_batch(batch: Any, target_b: int) -> tuple[Any, int]:
    """Pad every array's leading dim to ``target_b`` by repeating the last
    row; returns (padded_batch, n_valid). Used for eval tail batches."""
    first = next(v for v in batch.values()
                 if isinstance(v, np.ndarray) and v.ndim > 0)
    b = first.shape[0]
    if b == target_b:
        return batch, b
    assert b < target_b

    def pad(x):
        if not isinstance(x, np.ndarray) or x.ndim == 0:
            return x
        reps = np.concatenate([x] + [x[-1:]] * (target_b - b), axis=0)
        return reps

    return {k: pad(v) for k, v in batch.items()}, b


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, axis_name: str = "data") -> Any:
    """Place a host batch onto the mesh, sharded on its leading dim.

    One ``jax.device_put`` call for the whole pytree: per-leaf puts cost a
    full tunnel/RPC round-trip each (measured 64ms/step vs 9ms for the
    batched put on the axon setup, BENCH_LOCAL_r3.txt)."""
    sh = batch_sharding(mesh, axis_name)
    rep = replicated(mesh)
    batch = jax.tree.map(np.asarray, batch)
    shardings = jax.tree.map(lambda x: rep if np.ndim(x) == 0 else sh, batch)
    return jax.device_put(batch, shardings)


def param_shardings(mesh: Mesh, params: Any, fsdp: bool = False,
                    axis_name: str = "data",
                    min_size_to_shard: int = 2 ** 18) -> Any:
    """Sharding tree for params: replicated (reference-equivalent DDP) or
    ZeRO-3-style FSDP (shard the largest divisible dim over ``data``)."""
    n = mesh.shape[axis_name]

    def rule(x):
        if not fsdp or x.size < min_size_to_shard:
            return NamedSharding(mesh, P())
        # shard the largest dim divisible by the mesh size
        dims = sorted(range(x.ndim), key=lambda d: -x.shape[d])
        for d in dims:
            if x.shape[d] % n == 0:
                spec = [None] * x.ndim
                spec[d] = axis_name
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)


def distributed_init() -> None:
    """Multi-host init (ref: utils/dist.py:20-75 NCCL init). On TPU pods the
    coordinator comes from the environment; single-host is a no-op."""
    import os
    if os.environ.get("COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    """(ref: utils/dist.py:107-111)"""
    return jax.process_index() == 0


def all_gather_metrics(values: list[float]) -> list[float]:
    """Gather per-host metric lists so every host computes the global number
    (ref: utils/dist.py:187-227 pickle all_gather, used at
    main_qamc.py:172-175). Single-host: identity. Multi-host: pads to a
    common length and gathers through
    ``jax.experimental.multihost_utils.process_allgather``."""
    if jax.process_count() == 1:
        return list(values)
    from jax.experimental import multihost_utils

    n_local = np.asarray([len(values)], np.int32)
    counts = np.asarray(multihost_utils.process_allgather(n_local)).reshape(-1)
    max_n = int(counts.max())
    padded = np.full((max_n,), np.nan, np.float32)
    padded[:len(values)] = np.asarray(values, np.float32)
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    gathered = gathered.reshape(jax.process_count(), max_n)
    out: list[float] = []
    for host, cnt in enumerate(counts):
        out.extend(gathered[host, :cnt].tolist())
    return out
