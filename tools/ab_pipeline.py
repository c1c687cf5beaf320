"""Interleaved full-pipeline A/B on the real TPU.

Builds N FacePipeline variants in ONE process and alternates
``pipe.benchmark`` rounds (A, B, ..., A, B, ...) so relay drift
(CLAUDE.md: same bench 23.4k vs 22.7k an hour apart) cannot masquerade as a
win. Only same-round deltas are meaningful.

Variants are selected by name on the command line; default: folded unfolded.
Detector variants: lowlight / nolowlight (unfolded embedder, detector built
with lowlight_norm on/off) — the gate itself costs one fused full-frame
stats pass per call even when it never fires.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/ab_pipeline.py \
        [--rounds 3] [--batch 32] [variant ...]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_pipeline(variant: str, cfg, frame_hw, detector, det_params):
    import jax
    import jax.numpy as jnp

    from facerec_tpu.models import get_model
    from facerec_tpu.models.fold import folded_arcface

    num_classes = 18
    init_model = get_model("arcface", num_classes=num_classes, compute_dtype="bfloat16")
    ex = jnp.zeros((1, cfg.embed_size, cfg.embed_size, 3), jnp.float32)
    evars = init_model.init(
        {"params": jax.random.key(1), "dropout": jax.random.key(2)},
        ex, labels=jnp.zeros(1, jnp.int32), train=True)
    evars = {"params": evars["params"], "batch_stats": evars.get("batch_stats", {})}

    if variant == "folded":
        embedder, evars = folded_arcface(num_classes, evars)
    elif variant in ("unfolded", "lowlight", "nolowlight",
                     "pyramid_frame", "pyramid_base", "nms1", "nms4"):
        embedder = init_model
    else:
        raise SystemExit(f"unknown variant {variant!r}")
    if variant in ("lowlight", "nolowlight"):
        from facerec_tpu.detect.mtcnn import MTCNN
        detector = MTCNN(frame_hw, min_face_size=40, max_faces=cfg.max_faces,
                         k_pnet=64, k_rnet=32, dtype=jnp.bfloat16,
                         input_range="255",
                         lowlight_norm=(variant == "lowlight"))
    if variant in ("pyramid_frame", "pyramid_base"):
        from facerec_tpu.detect.mtcnn import MTCNN
        detector = MTCNN(frame_hw, min_face_size=40, max_faces=cfg.max_faces,
                         k_pnet=64, k_rnet=32, dtype=jnp.bfloat16,
                         input_range="255",
                         pyramid_source=variant.removeprefix("pyramid_"))
    if variant in ("nms1", "nms4"):
        # fresh detector instance: detect() is jit-cached per MTCNN object,
        # and the nms unroll is baked at trace time (main() warms each
        # pipeline inside its patch scope)
        from facerec_tpu.detect.mtcnn import MTCNN
        detector = MTCNN(frame_hw, min_face_size=40, max_faces=cfg.max_faces,
                         k_pnet=64, k_rnet=32, dtype=jnp.bfloat16,
                         input_range="255")

    def embed_fn(variables, x):
        return embedder.apply(variables, x, method="embed")

    from facerec_tpu.serve.pipeline import FacePipeline

    return FacePipeline(cfg, frame_hw, detector, det_params, embed_fn,
                        embed_dim=512, embed_variables=evars)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("variants", nargs="*", default=["folded", "unfolded"])
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _face_frames
    from facerec_tpu.config import ServeConfig
    from facerec_tpu.detect.mtcnn import MTCNN
    from facerec_tpu.detect.weights import load_detector_params

    frame_hw = (480, 640)
    cfg = ServeConfig(max_faces=8, gallery_capacity=1024, top_k=5, embed_size=160,
                      detection_threshold=0.0)
    detector = MTCNN(frame_hw, min_face_size=40, max_faces=cfg.max_faces,
                     k_pnet=64, k_rnet=32, dtype=jnp.bfloat16, input_range="255")
    det_params = load_detector_params()
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} batch={args.batch} "
          f"variants={args.variants}")

    frames = _face_frames(args.batch, frame_hw, cfg.max_faces, rng)

    pipes = {}
    for v in args.variants:
        import functools

        import facerec_tpu.detect.mtcnn as mtcnn_mod

        from facerec_tpu.ops.nms import nms as nms_fn

        orig_nms = mtcnn_mod.nms
        if v in ("nms1", "nms4"):
            mtcnn_mod.nms = functools.partial(nms_fn, unroll=int(v[3:]))
        try:
            pipes[v] = build_pipeline(v, cfg, frame_hw, detector, det_params)
            pipes[v].gallery.add_many([f"id_{i}" for i in range(512)],
                                      rng.normal(size=(512, 512)).astype(np.float32))
            # compile + warm INSIDE the patch scope (trace time bakes nms)
            r = pipes[v].process(frames)
            probs = np.asarray(jax.device_get(r.probs))
            print(f"fill {v}: {int((probs >= 0.6).sum())}/"
                  f"{args.batch * cfg.max_faces} @0.6, "
                  f"{int((probs >= 0.9).sum())} @0.9")
            pipes[v].benchmark(frames, iters=8)
        finally:
            mtcnn_mod.nms = orig_nms

    results = {v: [] for v in args.variants}
    for r in range(args.rounds):
        line = [f"round {r}:"]
        for v in args.variants:
            fps = pipes[v].benchmark(frames, iters=20)["faces_per_sec"]
            results[v].append(fps)
            line.append(f"{v} {fps:,.0f}")
        print("  ".join(line))
    base = float(np.median(results[args.variants[0]]))
    for v in args.variants:
        m = float(np.median(results[v]))
        print(f"median {v}: {m:,.0f} faces/s ({(m - base) / base * 100:+.1f}% vs "
              f"{args.variants[0]})")


if __name__ == "__main__":
    main()
