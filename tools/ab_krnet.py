#!/usr/bin/env python
"""Interleaved A/B of the stage-1 candidate budget k_rnet at bench shape
(CLAUDE.md: A/B on the SAME machine state before believing any perf delta).

The dark-face bench misses are stage-1 rank starvation (tools/probe_pnet_dark:
P-Net scores them 0.75-0.91 raw, but 8 faces x multi-scale duplicates overflow
the 32 fine slots). Raising k_rnet admits them; this measures what it costs.

Usage: PYTHONPATH=/root/repo python tools/ab_krnet.py [k values...]
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache"))


def build_pipe(k_rnet: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from facerec_tpu.config import ServeConfig
    from facerec_tpu.detect.mtcnn import MTCNN
    from facerec_tpu.detect.weights import load_detector_params
    from facerec_tpu.models import get_model
    from facerec_tpu.serve.pipeline import FacePipeline

    frame_hw = (480, 640)
    cfg = ServeConfig(max_faces=8, gallery_capacity=1024, top_k=5, embed_size=160,
                      detection_threshold=0.0)
    detector = MTCNN(frame_hw, min_face_size=40, max_faces=cfg.max_faces,
                     k_pnet=64, k_rnet=k_rnet, dtype=jnp.bfloat16, input_range="255")
    det_params = load_detector_params()
    embedder = get_model("arcface", num_classes=18, compute_dtype="bfloat16")
    ex = jnp.zeros((1, cfg.embed_size, cfg.embed_size, 3), jnp.float32)
    evars = embedder.init({"params": jax.random.key(1), "dropout": jax.random.key(2)},
                          ex, labels=jnp.zeros(1, jnp.int32), train=True)
    evars = {"params": evars["params"], "batch_stats": evars.get("batch_stats", {})}

    def embed_fn(variables, x):
        return embedder.apply(variables, x, method="embed")

    pipe = FacePipeline(cfg, frame_hw, detector, det_params, embed_fn, embed_dim=512,
                        embed_variables=evars)
    rng = np.random.default_rng(0)
    pipe.gallery.add_many([f"id_{i}" for i in range(512)],
                          rng.normal(size=(512, 512)).astype(np.float32))
    return pipe


def main():
    import jax
    import numpy as np

    from bench import _face_frames

    ks = [int(a) for a in sys.argv[1:]] or [32, 48, 64]
    batch = int(os.environ.get("BENCH_BATCH", 48))
    rng = np.random.default_rng(0)
    frames = _face_frames(batch, (480, 640), 8, rng)

    pipes = {k: build_pipe(k) for k in ks}
    fills = {}
    for k, pipe in pipes.items():
        r = pipe.process(frames)
        fills[k] = int(jax.device_get((r.probs >= 0.6).sum()))
    # interleaved rounds so relay drift hits all arms equally
    results = {k: [] for k in ks}
    for _ in range(3):
        for k, pipe in pipes.items():
            stats = pipe.benchmark(frames, iters=12)
            results[k].append(stats["faces_per_sec"])
    for k in ks:
        print(json.dumps({"k_rnet": k, "faces_per_sec": [round(v, 1) for v in results[k]],
                          "best": round(max(results[k]), 1),
                          "fill": fills[k], "expected": batch * 8}))


if __name__ == "__main__":
    main()
