"""Batch loading: per-host index sharding, prefetch, and multi-dataset mixing.

Replaces the reference's torch DataLoader stack (ref: dataset.py:220-250,
480-509; swinbert/data_sampler.py DistributedSampler/NodeSplitSampler/
IterationBasedBatchSampler) with:

* ``ShardedBatchLoader`` — deterministic per-host, per-epoch shuffling and
  fixed-size batches (drop-last at train), decode on a thread pool, and a
  1-deep prefetch queue to overlap host decode with device steps;
* ``MetaLoader`` — the multi-dataset weighted sampler (ref: dataset.py:511-547)
  rebuilt as a deterministic seeded schedule: every host computes the same
  dataset choice from (seed, step), so the rank-0 ``broadcast_object_list``
  collective disappears entirely (SURVEY.md §5 distributed-backend note).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Iterator

import numpy as np


def _collate(items: list[dict[str, Any]]) -> dict[str, np.ndarray]:
    out: dict[str, Any] = {}
    for k in items[0]:
        vals = [it[k] for it in items]
        if isinstance(vals[0], np.ndarray) or np.isscalar(vals[0]) \
                or isinstance(vals[0], (int, float, np.integer, np.floating)):
            out[k] = np.stack([np.asarray(v) for v in vals])
        else:
            out[k] = vals  # e.g. video-id strings
    return out


class ShardedBatchLoader:
    """Deterministic sharded loader (ref: get_dl at dataset.py:220-228 +
    DistributedSampler semantics)."""

    def __init__(self, dataset, batch_size: int, *, shuffle: bool,
                 seed: int = 88, num_hosts: int = 1, host_index: int = 0,
                 drop_last: bool | None = None, num_threads: int = 8,
                 prefetch: int = 2, limit_samples: int = -1,
                 source_idx: list[int] | None = None):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_hosts = num_hosts
        self.host_index = host_index
        self.drop_last = shuffle if drop_last is None else drop_last
        self.num_threads = num_threads
        self.prefetch = prefetch
        # per-host sample cap (ref: swinbert/data_sampler.py:13-95
        # DistributedSamplerLimited)
        self.limit_samples = limit_samples
        # per-item source-shard ids: whole shards get host affinity instead
        # of the contiguous split (ref: swinbert/data_sampler.py:98-193
        # NodeSplitSampler; used by composite YAML pretraining)
        self.source_idx = source_idx
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        if self.source_idx is not None:
            from empirical_mvm_tpu.data.composite import shard_affinity_indices
            mine = shard_affinity_indices(
                self.source_idx, self.num_hosts, self.host_index,
                seed=self.seed + self.epoch, shuffle=self.shuffle)
            if self.limit_samples > 0:
                mine = mine[:self.limit_samples]
            return np.asarray(mine)
        n = len(self.ds)
        idx = np.arange(n)
        if self.shuffle:
            rs = np.random.RandomState(self.seed + self.epoch)
            rs.shuffle(idx)
        # per-host contiguous shard, padded like DistributedSampler
        per_host = int(np.ceil(n / self.num_hosts))
        pad = per_host * self.num_hosts - n
        if pad:
            idx = np.concatenate([idx, idx[:pad]])
        mine = idx[self.host_index::self.num_hosts]
        if self.limit_samples > 0:
            mine = mine[:self.limit_samples]
        return mine

    def __len__(self) -> int:
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return int(np.ceil(n / self.batch_size))

    def __iter__(self) -> Iterator[dict[str, np.ndarray]]:
        idx = self._indices()
        nb = len(self)
        stop = object()
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)

        err: list[BaseException] = []

        def produce():
            try:
                with ThreadPoolExecutor(self.num_threads) as pool:
                    for b in range(nb):
                        chunk = idx[b * self.batch_size:(b + 1) * self.batch_size]
                        items = list(pool.map(self.ds.__getitem__, chunk))
                        q.put(_collate(items))
            except BaseException as e:  # noqa: BLE001 — re-raised in consumer
                err.append(e)
            finally:
                q.put(stop)             # never leave the consumer blocked

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                if err:
                    raise err[0]
                break
            yield item


class MetaLoader:
    """Weighted multi-dataset mixing with a deterministic schedule
    (ref: dataset.py:511-547; weights = iters ratio per
    main_pretrain_yaml.py:256-259).

    The reference broadcasts rank-0's random choice each step; here every
    host derives the same choice from (seed, step) — same distribution, no
    collective.
    """

    def __init__(self, loaders: dict[str, tuple[ShardedBatchLoader, int]],
                 seed: int = 88, accum_steps: int = 1):
        self.loaders = {n: l for n, (l, _) in loaders.items()}
        # ratios may be rational (iters ratios) — scale so every dataset
        # gets a non-zero integer slot count instead of silently dropping
        # weights < 1 via int() truncation
        ratios = {n: float(r) for n, (_, r) in loaders.items()}
        if any(r <= 0 for r in ratios.values()):
            bad = [n for n, r in ratios.items() if r <= 0]
            raise ValueError(f"MetaLoader ratios must be > 0: {bad}")
        import math
        from fractions import Fraction
        fr = {n: Fraction(r).limit_denominator(1000)
              for n, r in ratios.items()}
        lcm = math.lcm(*(f.denominator for f in fr.values()))
        counts = {n: max(1, int(f * lcm)) for n, f in fr.items()}
        g = math.gcd(*counts.values())
        self.pool: list[str] = []
        for name, c in counts.items():
            self.pool.extend([name] * (c // g))
        self.seed = seed
        self.accum_steps = accum_steps
        self.step = 0
        self._iters = {n: iter(l) for n, l in self.loaders.items()}

    def _choice(self, step: int) -> str:
        rs = np.random.RandomState((self.seed * 1_000_003 + step) % (2 ** 31))
        return self.pool[rs.randint(len(self.pool))]

    def __iter__(self):
        task = self.pool[0]
        while True:
            if self.step % self.accum_steps == 0:
                task = self._choice(self.step // self.accum_steps)
            self.step += 1
            try:
                batch = next(self._iters[task])
            except StopIteration:
                self.loaders[task].set_epoch(
                    self.loaders[task].epoch + 1)
                self._iters[task] = iter(self.loaders[task])
                batch = next(self._iters[task])
            yield task, batch


class DevicePrefetcher:
    """Background host->device transfer pipeline.

    Pulls (tag, host_batch) items from ``source``, runs ``put_fn`` (e.g.
    ``shard_batch``) in a producer thread, and yields device-resident
    batches. On the axon-tunnel dev setup the jitted-step dispatch BLOCKS
    the main thread ~170ms/step (max one step in flight), and the loader's
    decode + the device_put (~105ms/step combined) were serializing behind
    it; issuing the put from a second thread overlaps both with the
    dispatch wait (measured breakdown in BENCH_LOCAL_r3.txt). On real
    multi-core TPU VMs this is the standard double-buffering that keeps the
    input pipeline off the step's critical path.

    ``depth`` bounds device-resident batches in flight (each flagship batch
    is ~10MB uint8 on device).
    """

    def __init__(self, source, put_fn, depth: int = 2):
        self.source = source
        self.put_fn = put_fn
        self.depth = depth

    def __iter__(self):
        stop = object()
        q: queue.Queue = queue.Queue(maxsize=self.depth)
        err: list[BaseException] = []

        def produce():
            try:
                for item in self.source:
                    if isinstance(item, tuple):
                        tag, batch = item
                    else:
                        tag, batch = None, item
                    q.put((tag, self.put_fn(batch)))
            except BaseException as e:  # noqa: BLE001 — re-raised in consumer
                err.append(e)
            finally:
                q.put(stop)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                if err:
                    raise err[0]
                break
            yield item
