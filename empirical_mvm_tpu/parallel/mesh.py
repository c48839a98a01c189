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
    on ``data`` must split evenly).

    A batch smaller than the device count can only occupy ``batch_size``
    chips (one sample each) — that is inherent, not a misconfiguration, so
    it is allowed (used by small eval/test runs). A batch *larger* than the
    device count that does not divide it, however, would silently idle chips
    while the rest carry more samples (batch 20 on 8 devices would train on
    4 chips at half throughput) — the reference hard-asserts divisibility
    for the same reason (per-GPU batch x world_size), and so do we."""
    n = len(jax.devices())
    if batch_size >= n:
        if batch_size % n != 0:
            raise ValueError(
                f"batch size {batch_size} does not divide across the "
                f"{n}-device mesh — this would silently idle chips. Pick a "
                f"batch size divisible by the device count (or a batch "
                f"smaller than it).")
        return make_mesh(n, axis_name)
    # batch < n: use the largest divisor of batch_size (= batch_size itself)
    return make_mesh(batch_size, axis_name)


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
    batched put on the axon setup, BENCH_LOCAL_r3.txt).

    Single-device meshes take a RAW device put: the NamedSharding put path
    costs ~5x more through a tunnel (46 vs 8.6ms/step for the same bytes,
    BENCH_LOCAL_r3 microbench) and a SingleDeviceSharding is equivalent to
    any sharding on a 1-device mesh, so jitted steps with NamedSharding
    in_shardings accept it without a reshard."""
    batch = jax.tree.map(np.asarray, batch)
    devs = mesh.devices.reshape(-1)
    if devs.size == 1:
        return jax.device_put(batch, devs[0])
    sh = batch_sharding(mesh, axis_name)
    rep = replicated(mesh)
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
