#!/usr/bin/env python
"""A/B the whole-over-part demotion area-ratio floor (round-5 bench-loss fix).

The round-5 loss probe (tools/probe_bench_loss.py) classified 2 of the ~4
residual bench slot losses as prefer_whole demotions where an OVERSIZED
duplicate of the SAME face (outer/inner area ratio < 2.5) demotes its own
tight box at the final min-NMS, and the surviving outer box lands at IoU
0.23-0.29 vs ground truth — a localization miss manufactured by the
heuristic, not a detection miss. True facial-part boxes measure 2.9-5x
smaller than their face on the reference gallery (detect/mtcnn.py
demote_nested docstring), so a part_ratio floor of 2.5 should separate the
two populations: same-face duplicates stop demoting, real part boxes still
do.

This runs the SAME frames through the served cascade at part_ratio 1.5 (the
classic default) and 2.5 in one process (same machine state) and reports:
  * bench-frame fill at prob>=0.6 and >=0.9 (the two bench gates)
  * real-photo (reference gallery) recall + full-face coverage — the
    population the prefer_whole heuristic exists FOR; must not regress
Run ON TPU (CPU/TPU numerics flip knife-edge O-Net scores — CLAUDE.md).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/ab_part_ratio.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.diagnose_dark import face_frames_with_gt, iou_matrix  # noqa: E402

REF_DIR = Path("/root/reference/face_references")


def bench_fill(det, params, frames, gt, B, F):
    import jax

    out = jax.device_get(det.detect(params, frames))
    fills = {}
    for thr in (0.6, 0.9):
        n = 0
        for g in gt:
            iou = iou_matrix(g["box"], out.boxes[g["b"]])
            n += bool(((iou >= 0.3) & (out.probs[g["b"]] >= thr)).any())
        fills[thr] = n
    return fills


def real_photo_coverage(det, params):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    paths = sorted(REF_DIR.glob("*.jpg"))
    imgs = np.stack([
        np.asarray(Image.open(p).convert("RGB").resize((160, 160)), np.float32)
        for p in paths])
    out = jax.device_get(det.detect(params, jnp.asarray(imgs)))
    recall = covered = 0
    for i in range(len(paths)):
        v = out.valid[i]
        recall += bool(v.any())
        cov = False
        for f in range(out.boxes.shape[1]):
            if v[f]:
                b = out.boxes[i, f]
                w = min(b[2], 160.0) - max(b[0], 0.0)
                h = min(b[3], 160.0) - max(b[1], 0.0)
                cov |= bool(w >= 80 and h >= 80)
        covered += cov
    return recall, covered, len(paths)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from facerec_tpu.detect.mtcnn import MTCNN
    from facerec_tpu.detect.weights import CALIBRATED_THRESHOLDS, load_detector_params

    params = load_detector_params()
    frame_hw, B, F = (480, 640), 48, 8
    rng = np.random.default_rng(0)
    frames, gt = face_frames_with_gt(B, frame_hw, F, rng)
    fj = jnp.asarray(frames)
    print(f"# backend={jax.default_backend()}", file=sys.stderr)

    for ratio in (1.5, 2.5, 2.0):
        det = MTCNN(frame_hw, min_face_size=40, max_faces=F, k_pnet=64,
                    k_rnet=32, dtype=jnp.bfloat16, input_range="255",
                    part_ratio=ratio)
        fills = bench_fill(det, params, fj, gt, B, F)
        det160 = MTCNN((160, 160), min_face_size=40,
                       thresholds=CALIBRATED_THRESHOLDS, max_faces=8,
                       k_pnet=64, k_rnet=32, part_ratio=ratio)
        recall, covered, n = real_photo_coverage(det160, params)
        print(json.dumps({"part_ratio": ratio,
                          "bench_fill_p06": f"{fills[0.6]}/{B*F}",
                          "bench_fill_p09": f"{fills[0.9]}/{B*F}",
                          "real_recall": f"{recall}/{n}",
                          "real_covered": f"{covered}/{n}"}))


if __name__ == "__main__":
    main()
