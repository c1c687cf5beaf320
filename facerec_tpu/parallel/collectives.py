"""Thin named-axis collective wrappers.

Used inside ``shard_map``-style regions and pmap fallbacks. Under pure pjit /
GSPMD most collectives are implicit (XLA inserts them from shardings); these
wrappers exist for the explicitly-programmed paths (sharded gallery top-k
merge, cross-replica metric reduction) and for tests that pin collective
placement. TPU-native counterpart of the reference's absent NCCL layer
(SURVEY.md section 5.8).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def psum(x, axis_name: str = "data"):
    return jax.lax.psum(x, axis_name)


def pmean(x, axis_name: str = "data"):
    return jax.lax.pmean(x, axis_name)


def all_gather(x, axis_name: str = "model", axis: int = 0, tiled: bool = True):
    return jax.lax.all_gather(x, axis_name, axis=axis, tiled=tiled)


def ppermute_ring(x, axis_name: str, shift: int = 1):
    n = jax.lax.axis_size(axis_name)
    perm = [(i, (i + shift) % n) for i in range(n)]
    return jax.lax.ppermute(x, axis_name, perm)


def reduce_scatter(x, axis_name: str = "data", scatter_dimension: int = 0):
    return jax.lax.psum_scatter(x, axis_name, scatter_dimension=scatter_dimension, tiled=True)


def axis_index(axis_name: str):
    return jax.lax.axis_index(axis_name)


def global_topk_merge(local_vals: jnp.ndarray, local_idx: jnp.ndarray, k: int, axis_name: str = "model"):
    """Merge per-shard top-k (values desc, local indices) into a global top-k.

    Each shard contributes its k best; an all-gather over the small [k] slabs
    (k << gallery) followed by a replicated sort yields the exact global
    answer with O(devices*k) traffic instead of all-gathering the gallery.
    """
    # local_vals/local_idx: [..., k] per shard. Gather to [n, ..., k], tag each
    # candidate with its shard id, flatten shard into the candidate axis, and
    # take a replicated exact top-k over n*k candidates.
    all_vals = jax.lax.all_gather(local_vals, axis_name, axis=0, tiled=False)  # [n, ..., k]
    all_idx = jax.lax.all_gather(local_idx, axis_name, axis=0, tiled=False)
    shard_ids = jax.lax.broadcasted_iota(jnp.int32, all_idx.shape, 0)
    def _flatten(a):  # [n, ..., k] -> [..., n*k]
        a = jnp.moveaxis(a, 0, -2)  # [..., n, k]
        return a.reshape(*a.shape[:-2], -1)

    flat_vals, flat_idx, flat_shard = _flatten(all_vals), _flatten(all_idx), _flatten(shard_ids)
    top_vals, pos = jax.lax.top_k(flat_vals, k)
    return top_vals, jnp.take_along_axis(flat_idx, pos, axis=-1), jnp.take_along_axis(flat_shard, pos, axis=-1)
