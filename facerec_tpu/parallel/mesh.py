"""Device mesh construction and sharding helpers.

The reference has **no** distributed backend (zero NCCL/MPI/torch.distributed —
SURVEY.md section 2.2/5.8; e.g. reference training.py:210 pins a single CUDA
device). This module is the TPU-native first-class replacement: one `Mesh`
with named axes, `NamedSharding` constructors used by the pjit train/serve
paths, and thin collective wrappers. XLA lowers the collectives onto ICI
within a slice; cross-host input sharding rides DCN.

Axes:
  * ``data``  — data parallelism (batch dimension). Primary scaling axis.
  * ``model`` — tensor parallelism for the gallery/classifier matmuls
    (shards the gallery/class dimension).
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from facerec_tpu.config import MeshConfig

_REPLICATED = P()


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Env-gated multi-host bootstrap (SURVEY.md section 5.8: the comm-backend
    component the reference never had; the TPU equivalent of NCCL rendezvous).

    Call once before any jax device query on every host of a multi-host
    slice. Reads ``FACEREC_COORDINATOR`` (host:port),
    ``FACEREC_NUM_PROCESSES`` and ``FACEREC_PROCESS_ID`` when arguments are
    not given; on Cloud TPU pods all three are auto-detected by jax itself,
    so setting only ``FACEREC_COORDINATOR=auto`` defers entirely to
    ``jax.distributed.initialize()`` defaults. Returns True when multi-process
    mode was initialized, False when unconfigured (single-host).

    Tested two ways (tests/test_parallel.py): an env-gating contract test,
    and an EXECUTED 2-process CPU rendezvous (tests/mp_worker.py) that builds
    a global mesh over both processes' devices, assembles a global batch from
    local_slice'd halves, and runs a DP train step whose loss/params match
    the single-process run."""
    import os

    addr = coordinator_address or os.environ.get("FACEREC_COORDINATOR")
    if not addr:
        return False
    kwargs: dict = {}
    if addr != "auto":
        kwargs["coordinator_address"] = addr
        n = num_processes if num_processes is not None else os.environ.get("FACEREC_NUM_PROCESSES")
        p = process_id if process_id is not None else os.environ.get("FACEREC_PROCESS_ID")
        if n is not None:
            kwargs["num_processes"] = int(n)
        if p is not None:
            kwargs["process_id"] = int(p)
    jax.distributed.initialize(**kwargs)
    return True


def build_mesh(config: MeshConfig = MeshConfig(), devices: Sequence[jax.Device] | None = None) -> Mesh:
    """Construct a 2-D (data, model) mesh over all (or given) devices.

    ``data_parallel=-1`` consumes every device not claimed by ``model``.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    mp = max(1, config.model_parallel)
    if n % mp != 0:
        raise ValueError(f"model_parallel={mp} does not divide device count {n}")
    dp = config.data_parallel if config.data_parallel > 0 else n // mp
    if dp * mp != n:
        raise ValueError(f"data_parallel*model_parallel={dp * mp} != device count {n}")
    arr = np.asarray(devices).reshape(dp, mp)
    return Mesh(arr, axis_names=(config.data_axis, config.model_axis))


@functools.lru_cache(maxsize=1)
def default_mesh() -> Mesh:
    return build_mesh()


def batch_sharding(mesh: Mesh, ndim: int = 4, data_axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the data axis."""
    return NamedSharding(mesh, P(data_axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, _REPLICATED)


def gallery_sharding(mesh: Mesh, model_axis: str = "model") -> NamedSharding:
    """Gallery matrix [capacity, dim] sharded along capacity (rows) so each
    chip holds a gallery shard; top-k results are combined with a small
    all-gather. This is the TP axis for serving (SURVEY.md section 2.2 TP row)."""
    return NamedSharding(mesh, P(model_axis, None))


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Replicate a parameter pytree onto the mesh (models are ResNet18-class,
    so parameters are replicated; batch/gallery dims carry the parallelism)."""
    sh = replicated(mesh)
    return jax.device_put(params, sh)


def shard_batch(batch: Any, mesh: Mesh, data_axis: str = "data") -> Any:
    """Place a host batch pytree onto the mesh, sharded along axis 0."""

    def _put(x):
        return jax.device_put(x, NamedSharding(mesh, P(data_axis, *([None] * (x.ndim - 1)))))

    return jax.tree_util.tree_map(_put, batch)


def pad_to_multiple(batch: Any, multiple: int) -> tuple[Any, int]:
    """Pad leading dim of every array in the pytree to a multiple (so shards
    divide evenly); returns (padded_batch, original_size)."""
    leaves = jax.tree_util.tree_leaves(batch)
    if not leaves:
        return batch, 0
    n = leaves[0].shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return batch, n

    def _pad(x):
        pad_widths = [(0, rem)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(np.asarray(x), pad_widths)

    return jax.tree_util.tree_map(_pad, batch), n
