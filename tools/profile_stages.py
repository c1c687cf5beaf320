"""Stage budget of the serve pipeline on the real TPU.

Times the four stages (detect / align / embed / match) as separate jits with
the same slope methodology as serve/pipeline.benchmark() — distinct
device-resident inputs per call, in-jit reductions, one final host
materialization, slope between a short and a long dispatch chain. Shapes
mirror bench.py (batch 48 or BENCH_BATCH, 8 faces, 480x640 frames, 160px crops, 1024-row
gallery, 512-d embeddings).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_stages.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def slope_time(fn, variants, *fixed, iters=12):
    """Seconds per call via chain-slope over distinct inputs.

    Every dispatch in every chain consumes a FRESH variant (a moving cursor,
    wrapping only when the pool is exhausted) so no execution can ever be an
    identical-input repeat — CLAUDE.md measurement trap #1. (Re-tested
    2026-08-17: the current relay does NOT serve identical repeats from a
    cache — 33 vs 35 ms on an exact repeat chain — but the hygiene stays.)
    """
    @jax.jit
    def callsum(v, *f):
        out = fn(v, *f)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(jnp.asarray(l, jnp.float32)) for l in leaves)

    cursor = [0]

    def chain(n):
        t0 = time.perf_counter()
        outs = []
        for _ in range(n):
            outs.append(callsum(variants[cursor[0] % len(variants)], *fixed))
            cursor[0] += 1
        float(outs[-1])
        return time.perf_counter() - t0

    float(callsum(variants[-1], *fixed))  # compile + warm
    n_short = max(iters // 4, 2)
    t_short = chain(n_short)
    t_long = chain(iters)
    return max((t_long - t_short) / (iters - n_short), 1e-9)


def main():
    from facerec_tpu.detect.mtcnn import MTCNN
    from facerec_tpu.detect.weights import load_detector_params
    from facerec_tpu.models import get_model
    from facerec_tpu.ops.gallery import gallery_topk_pallas, gallery_topk_xla
    from facerec_tpu.ops.warp_fast import align_and_crop_fast_batched

    import os

    B = int(os.environ.get("BENCH_BATCH", 48))  # mirror bench.py
    F, HW, E, D = 8, (480, 640), 160, 512
    # BENCH_GALLERY: production-scale match-stage profiling (e.g. 131072) —
    # mirrors bench.py's env knob so the stage budget can be read at the same
    # gallery size as the e2e number.
    G = int(os.environ.get("BENCH_GALLERY", 1024))
    rng = np.random.default_rng(0)
    on_tpu = jax.default_backend() == "tpu"
    print(f"backend={jax.default_backend()} B={B} F={F}")

    det = MTCNN(HW, min_face_size=40, max_faces=F, k_pnet=64, k_rnet=32,
                dtype=jnp.bfloat16, input_range="255")
    det_params = jax.device_put(load_detector_params())

    frames = [jnp.asarray(rng.uniform(0, 255, (B, *HW, 3)).astype(np.float32))
              for _ in range(13)]

    dt = slope_time(lambda fr: det.detect(det_params, fr), frames)
    print(f"detect:  {dt*1e3:7.2f} ms/batch  ({B*F/dt:9.0f} faces/s)")

    boxes = np.zeros((B, F, 4), np.float32)
    lmk = np.zeros((B, F, 5, 2), np.float32)
    for b in range(B):
        for f in range(F):
            x1 = rng.uniform(0, HW[1] - 170); y1 = rng.uniform(0, HW[0] - 170)
            s = rng.uniform(80, 160)
            boxes[b, f] = [x1, y1, x1 + s, y1 + s]
            lmk[b, f] = [[x1+s*.3, y1+s*.4], [x1+s*.7, y1+s*.4], [x1+s*.5, y1+s*.6],
                         [x1+s*.35, y1+s*.8], [x1+s*.65, y1+s*.8]]
    boxes_j, lmk_j = jnp.asarray(boxes), jnp.asarray(lmk)

    # the PIPELINE's align path: batched crop matmuls + the Pallas VMEM
    # rotation on TPU, bf16 crops out (serve/pipeline.py _build_step)
    dt = slope_time(
        lambda fr: align_and_crop_fast_batched(fr, boxes_j, lmk_j, E,
                                               use_pallas=on_tpu,
                                               out_dtype=jnp.bfloat16), frames)
    print(f"align:   {dt*1e3:7.2f} ms/batch  ({B*F/dt:9.0f} faces/s)")

    embedder = get_model("arcface", num_classes=8, compute_dtype="bfloat16")
    ex = jnp.zeros((1, E, E, 3), jnp.float32)
    ev = embedder.init({"params": jax.random.key(1), "dropout": jax.random.key(2)},
                       ex, labels=jnp.zeros(1, jnp.int32), train=True)
    ev = jax.device_put({"params": ev["params"],
                         "batch_stats": ev.get("batch_stats", {})})
    crops = [jnp.asarray(rng.uniform(0, 255, (B * F, E, E, 3)).astype(np.float32))
             for _ in range(13)]
    dt = slope_time(lambda c: embedder.apply(ev, c, method="embed"), crops)
    print(f"embed:   {dt*1e3:7.2f} ms/batch  ({B*F/dt:9.0f} faces/s)")

    # device-generated gallery: content is irrelevant to the sweep's timing,
    # and a host-random 1M x 512 f32 block would be a 2 GB tunnel upload
    gallery = jax.random.normal(jax.random.key(3), (G, D), jnp.float32)
    count = jnp.asarray(G, jnp.int32)
    embs = [jnp.asarray(rng.normal(size=(B * F, D)).astype(np.float32))
            for _ in range(13)]
    topk = gallery_topk_pallas if on_tpu else gallery_topk_xla
    # gallery rides as a jit ARGUMENT (slope_time *fixed), not a closure:
    # a closed-over 131072x512 f32 matrix bakes 256 MB of constants into the
    # HLO and the remote-compile tunnel rejects the request (HTTP 413).
    dt = slope_time(lambda e, g: topk(e, g, count, k=5), embs, gallery)
    print(f"match:   {dt*1e3:7.2f} ms/batch  ({B*F/dt:9.0f} faces/s)  [f32 gallery]")
    # serve default (ServeConfig.gallery_dtype="bfloat16"): half the HBM
    # sweep bytes; same-state A/B against the f32 line above
    dt = slope_time(lambda e, g: topk(e, g, count, k=5), embs,
                    gallery.astype(jnp.bfloat16))
    print(f"match:   {dt*1e3:7.2f} ms/batch  ({B*F/dt:9.0f} faces/s)  [bf16 gallery]")


if __name__ == "__main__":
    main()
