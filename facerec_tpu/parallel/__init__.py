"""Device mesh + collectives (the reference has no distributed backend;
SURVEY.md section 2.2/5.8 — this is the TPU-native first-class equivalent)."""

from facerec_tpu.parallel.collectives import (
    all_gather, axis_index, global_topk_merge, pmean, ppermute_ring, psum, reduce_scatter,
)
from facerec_tpu.parallel.mesh import (
    batch_sharding, build_mesh, default_mesh, gallery_sharding, pad_to_multiple,
    replicated, shard_batch, shard_params,
)

__all__ = [
    "all_gather", "axis_index", "global_topk_merge", "pmean", "ppermute_ring",
    "psum", "reduce_scatter", "batch_sharding", "build_mesh", "default_mesh",
    "gallery_sharding", "pad_to_multiple", "replicated", "shard_batch", "shard_params",
]
