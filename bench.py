"""Benchmark: end-to-end detect->align->embed->match throughput on one chip.

Timing methodology: distinct device-resident input batches + dispatch-chain
slope timing (see serve/pipeline.py benchmark docstring — the runtime caches
identical-input executions, block_until_ready does not truly block, and each
host materialization costs a ~30 ms round trip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.json / BASELINE.md): >=5,000 aligned faces/sec/chip
through the full fused pipeline on TPU v5e; vs_baseline = value / 5000.

The measured program is the real serving path (facerec_tpu/serve/pipeline.py):
MTCNN cascade over a static image pyramid, landmark-based fused affine
align+crop, a ResNet-18-class ArcFace embedder at 160x160, and the Pallas
gallery top-k against a 1024-entry gallery — all one jit step, steady-state
timed after compilation.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache"))


def _face_frames(batch: int, frame_hw: tuple[int, int], faces_per_frame: int, rng):
    """Frames genuinely containing faces so the detector finds real boxes and
    the align/embed path does representative gather work (empty frames take a
    degenerate all-default-boxes fast path and time ~60x faster)."""
    import numpy as np

    from facerec_tpu.data.synthetic import _identity_params, render_face_photo

    h, w = frame_hw
    frames = rng.uniform(0, 80, size=(batch, h, w, 3)).astype(np.float32)
    cols = int(np.ceil(np.sqrt(faces_per_frame)))
    rows = int(np.ceil(faces_per_frame / cols))
    cell_h, cell_w = h // rows, w // cols
    for b in range(batch):
        for f in range(faces_per_frame):
            # wide-appearance identities (skin luminance 0.25-1.0, full-beard
            # darkening): the bench measures the distribution the detector
            # trains on and real deployments see, not the legacy
            # light/medium-only draw (fill re-validated after widening:
            # 384/384 at batch 48)
            p = _identity_params(rng, skin_lum_range=(0.25, 1.0))
            size = int(rng.integers(64, min(cell_h, cell_w)))
            # photo-style faces (shaded, alpha-blended, mild rotation): the
            # domain the detector trains on at 75% weight and the closest
            # stand-in for real webcam frames — flat cartoon pastes sat at
            # ~75% detection with photo-domain-trained weights
            face, alpha = render_face_photo(p, size, jitter_rng=rng,
                                            rot_deg=float(rng.uniform(-8, 8)))
            r, c = divmod(f, cols)
            oy = r * cell_h + int(rng.integers(0, max(cell_h - size, 1)))
            ox = c * cell_w + int(rng.integers(0, max(cell_w - size, 1)))
            region = frames[b, oy : oy + size, ox : ox + size]
            a = alpha[..., None]
            frames[b, oy : oy + size, ox : ox + size] = (
                a * face * 255.0 + (1 - a) * region)
    return frames


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from facerec_tpu.config import ServeConfig
    from facerec_tpu.detect.mtcnn import MTCNN
    from facerec_tpu.models import get_model
    from facerec_tpu.serve.pipeline import FacePipeline

    frame_hw = (480, 640)
    # Batch sweep on v5e (same machine state, round 3): 32 -> 22.4k,
    # 48 -> 23.9k, 64 -> 23.2k faces/s — 48 is the sweet spot; the round-2
    # "batch-64 knee" (64 regressing below 32) no longer reproduces.
    batch = int(os.environ.get("BENCH_BATCH", 48))
    # BENCH_GALLERY: production-scale variant (e.g. 131072) — round-3 VERDICT
    # item 7; the default stays at the reference demo's scale regime.
    gallery_cap = int(os.environ.get("BENCH_GALLERY", 1024))
    cfg = ServeConfig(max_faces=8, gallery_capacity=gallery_cap, top_k=5, embed_size=160,
                      detection_threshold=0.0)  # thresholds don't change the compute

    # The round-3 darkest-tail misses were stage-1 candidate rank starvation
    # (8 faces x multi-scale P-Net duplicates overflow 32 fine slots; P-Net
    # scores those faces 0.75-0.91 — tools/probe_pnet_dark.py), fixed by the
    # 'dupmin' cross-scale NMS default (detect/mtcnn.py): fill 91.7% -> 99%
    # at k_rnet=32, vs 97.4% and -10% e2e for the k_rnet=64 alternative.
    detector = MTCNN(frame_hw, min_face_size=40, max_faces=cfg.max_faces,
                     k_pnet=64, k_rnet=int(os.environ.get("BENCH_K_RNET", 32)),
                     dtype=jnp.bfloat16,
                     input_range="255")  # skip the per-call range reduce (~0.7 ms)
    try:
        from facerec_tpu.detect.weights import load_detector_params

        det_params = load_detector_params()
    except FileNotFoundError:
        det_params = detector.init(jax.random.key(0))

    # plain eval (unfolded) embedder: serve-time BN folding measured a WASH
    # e2e and -8% standalone (docs/EMBEDDER.md "BN folding is NOT a win") —
    # XLA already fuses the eval-BN affine into the conv epilogue.
    embedder = get_model("arcface", num_classes=18, compute_dtype="bfloat16")
    ex = jnp.zeros((1, cfg.embed_size, cfg.embed_size, 3), jnp.float32)
    evars = embedder.init({"params": jax.random.key(1), "dropout": jax.random.key(2)},
                          ex, labels=jnp.zeros(1, jnp.int32), train=True)
    evars = {"params": evars["params"], "batch_stats": evars.get("batch_stats", {})}

    def embed_fn(variables, x):
        return embedder.apply(variables, x, method="embed")

    pipe = FacePipeline(cfg, frame_hw, detector, det_params, embed_fn, embed_dim=512,
                        embed_variables=evars)
    # Frames render FIRST from rng(0) so the frame set (and hence the
    # detected-fill columns) is IDENTICAL across gallery sizes and matches
    # tools/diagnose_dark.face_frames_with_gt(rng(0)) bit-for-bit — the
    # old order drew gallery embeddings first, so every BENCH_GALLERY value
    # benchmarked a different set of rendered faces.
    rng = np.random.default_rng(0)
    frames = _face_frames(batch, frame_hw, cfg.max_faces, rng)

    # populated gallery (half capacity) — bulk enrollment is ONE upload; at
    # production scale (>=65k ids) generate the synthetic identities ON
    # DEVICE (add_many_device): a 524,288 x 512 f32 host block is a 1 GB
    # upload (~minutes through the remote tunnel) vs milliseconds of device
    # RNG, and enrollment happens before timing either way.
    n_ids = gallery_cap // 2
    names = [f"id_{i}" for i in range(n_ids)]
    if n_ids > 8192:
        pipe.gallery.add_many_device(
            names, jax.random.normal(jax.random.key(5), (n_ids, 512), jnp.float32))
    else:
        pipe.gallery.add_many(names, rng.normal(size=(n_ids, 512)).astype(np.float32))
    t0 = time.time()
    # The throughput metric counts B*max_faces slots; assert the trained
    # detector actually FINDS the rendered faces so the number is honest
    # (compute is threshold-independent under static shapes, but an empty
    # valid mask would mean we timed a detector that sees nothing).
    r = pipe.process(frames)
    probs = jax.device_get(r.probs)
    found = float((probs >= 0.6).sum())
    # fill at the demo operating point too (reference app.py:18 DET=0.9) so a
    # score-calibration regression can't hide under the looser 0.6 count
    found_090 = float((probs >= 0.9).sum())
    expected = batch * cfg.max_faces
    # 0.95 bar (ratcheted from 0.8 after the round-4 k_rnet fix: measured
    # 383/384; the residual loss mode is adjacent-face NMS slot merging)
    bar = 0.95
    if found < bar * expected:
        print(f"# WARNING detector found {found:.0f}/{expected} faces at prob>=0.6",
              file=sys.stderr)
    stats = pipe.benchmark(frames, iters=20)
    transfer = None
    if os.environ.get("BENCH_TRANSFER"):
        # transfer-INCLUSIVE variant: fresh uint8 host frames every iteration
        transfer = pipe.benchmark_transfer(frames, iters=12)
    compile_note = time.time() - t0

    value = stats["faces_per_sec"]
    out = {
        "metric": "aligned faces/sec/chip (detect->align->embed->match)",
        "value": round(value, 1),
        "unit": "faces/sec/chip",
        "vs_baseline": round(value / 5000.0, 4),
        # detection slot fill travels WITH the throughput number so a detector
        # regression below the bar can't hide in a stderr warning
        "detected": int(found),
        "detected_expected": expected,
        "detected_ok": bool(found >= bar * expected),
        "detected_p090": int(found_090),
        # gate the demo operating point too (reference app.py:18 DET=0.9):
        # without this, an O-Net score-calibration regression that drops
        # true faces below 0.9 would not flip any flag (round-4 VERDICT #3)
        "detected_p090_ok": bool(found_090 >= bar * expected),
    }
    if transfer is not None:
        out["transfer_inclusive_faces_per_sec"] = round(transfer["faces_per_sec"], 1)
    print(json.dumps(out))
    print(f"# frames/sec={stats['frames_per_sec']:.1f} batch={batch} "
          f"frame={frame_hw} max_faces={cfg.max_faces} gallery={gallery_cap} "
          f"total_bench_s={compile_note:.1f} "
          f"backend={jax.default_backend()} detected={found:.0f}/{expected} "
          f"detected@0.9={found_090:.0f}", file=sys.stderr)


if __name__ == "__main__":
    main()
