"""Device input pipeline: background host loading + double-buffered transfer.

TPU-native replacement for the reference's DataLoader worker processes
(reference hyperparameter_tuning.py:776-803): a daemon thread decodes the
next batches while the device computes, and each batch is `device_put` with
its target `NamedSharding` so per-host shards stream straight onto the mesh
(DCN for host->device staging, ICI never sees raw images).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterable, Iterator

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def local_slice(batch: dict, process_index: int | None = None,
                process_count: int | None = None) -> dict:
    """Per-host input sharding: slice a globally-indexed host batch down to
    this process's contiguous rows (SURVEY.md section 5.8 DCN row: each host
    feeds only its own shard; ICI never sees another host's raw images).
    No-op on a single process."""
    pc = jax.process_count() if process_count is None else process_count
    if pc <= 1:
        return batch
    pi = jax.process_index() if process_index is None else process_index
    def _sl(x):
        per = x.shape[0] // pc
        return x[pi * per : (pi + 1) * per]

    return {k: _sl(v) for k, v in batch.items()}


def shard_put(batch: dict, mesh: Mesh, data_axis: str = "data") -> dict:
    """Place a host batch onto the mesh, sharded along the data axis. On a
    multi-host mesh the batch must be this process's LOCAL slice
    (``local_slice``); the global array is assembled from the per-process
    shards without any cross-host data movement."""
    multi = jax.process_count() > 1

    def _put(x):
        spec = P(data_axis, *([None] * (x.ndim - 1)))
        sharding = NamedSharding(mesh, spec)
        if multi:
            import numpy as np

            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return {k: _put(v) for k, v in batch.items()}


def prefetch_to_device(
    it: Iterable[dict],
    mesh: Mesh | None = None,
    depth: int = 2,
    data_axis: str = "data",
) -> Iterator[dict]:
    """Iterate ``it`` on a background thread, keeping ``depth`` batches
    resident on device ahead of the consumer (double buffering for depth=2)."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    _END = object()
    err: list[BaseException] = []

    def _producer():
        try:
            for batch in it:
                q.put(shard_put(batch, mesh, data_axis) if mesh is not None else jax.device_put(batch))
        except BaseException as e:  # propagate into consumer
            err.append(e)
        finally:
            q.put(_END)

    t = threading.Thread(target=_producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            if err:
                raise err[0]
            return
        yield item


class InMemoryBatcher:
    """Batches over in-memory arrays (synthetic datasets, benchmarks)."""

    def __init__(self, arrays: dict[str, Any], batch_size: int, shuffle: bool = True, seed: int = 0):
        import numpy as np

        self._np = np
        self.arrays = arrays
        n = len(next(iter(arrays.values())))
        assert all(len(v) == n for v in arrays.values())
        self.n = n
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self._epoch = 0

    def __len__(self):
        return -(-self.n // self.batch_size)

    def epoch(self, epoch: int | None = None):
        np = self._np
        if epoch is None:
            epoch = self._epoch
            self._epoch += 1
        order = np.arange(self.n)
        if self.shuffle:
            np.random.default_rng((self.seed, epoch)).shuffle(order)
        bs = self.batch_size
        for s in range(0, self.n, bs):
            idx = order[s : s + bs]
            batch = {k: v[idx] for k, v in self.arrays.items()}
            mask = np.ones(len(idx), np.float32)
            if len(idx) < bs:
                pad = bs - len(idx)
                batch = {
                    k: np.concatenate([v, np.zeros((pad, *v.shape[1:]), v.dtype)]) for k, v in batch.items()
                }
                mask = np.concatenate([mask, np.zeros(pad, np.float32)])
            batch["mask"] = mask
            yield batch

    def __iter__(self):
        return self.epoch()
