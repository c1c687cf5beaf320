#!/usr/bin/env python
"""Two-domain detector evaluation (CLAUDE.md seed-variance rule: evaluate
BOTH domains before adopting retrained weights).

Domain 1 — the 7 real reference photographs (/root/reference/face_references):
recall, central hits, and full-face coverage (best box >= 80x80 on the 160x160
resize) at the calibrated serving operating point. Reference bar: the
pretrained MTCNN boxes these faces fully (reference app.py:274-286).
max_faces defaults to 4 (round 4): every deployment surface runs >= 8 slots
(demo/preprocessing 16, bench 8); the old top-2 harness additionally demanded
the whole-face box outrank every OTHER above-threshold candidate, which on the
33x42 near-black JPEG flips on a 0.83-vs-0.70 junk-box knife edge and
penalized the dupmin stage-1 dedupe for surfacing one more candidate. Both
modes produce the whole-face box (88x102) on that photo; measured 7/7 covered
at max_faces=4 (dupmin) and 7/7 at max_faces=2 (union).

Domain 2 — bench-style photo-domain frames (bench.py _face_frames): detected
slots at prob>=0.6 out of batch*max_faces; the bench bar is 0.8.

Usage:
  python tools/detector_eval.py [--weights DIR] [--bench-batch 8]
Prints one JSON line; also importable (evaluate_detector).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REF_DIR = Path("/root/reference/face_references")


def eval_real_photos(det_params, thresholds, cross_scale_mode: str = "dupmin",
                     max_faces: int = 4) -> dict:
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from facerec_tpu.detect.mtcnn import MTCNN

    paths = sorted(REF_DIR.glob("*.jpg"))
    imgs = np.stack([
        np.asarray(Image.open(p).convert("RGB").resize((160, 160)), np.float32)
        for p in paths])
    det = MTCNN((160, 160), min_face_size=40, max_faces=max_faces, k_pnet=64, k_rnet=32,
                thresholds=thresholds, cross_scale_nms_mode=cross_scale_mode)
    out = jax.device_get(det.detect(det_params, jnp.asarray(imgs)))
    valid, boxes = np.asarray(out.valid), np.asarray(out.boxes)
    detected = central = covered = 0
    lo, hi = 160 * 0.2, 160 * 0.8
    per_photo = []
    for i, p in enumerate(paths):
        if not valid[i].any():
            per_photo.append({"name": p.name, "detected": False})
            continue
        detected += 1
        best_w = best_h = 0.0
        hits_central = False
        for f in range(boxes.shape[1]):
            if not valid[i, f]:
                continue
            b = boxes[i, f]
            w = min(b[2], 160.0) - max(b[0], 0.0)
            h = min(b[3], 160.0) - max(b[1], 0.0)
            if w * h > best_w * best_h:
                best_w, best_h = w, h
            if b[0] < hi and b[2] > lo and b[1] < hi and b[3] > lo:
                hits_central = True
        central += hits_central
        cov = best_w >= 80 and best_h >= 80
        covered += cov
        per_photo.append({"name": p.name, "detected": True, "central": bool(hits_central),
                          "covered": bool(cov), "best_wh": [int(best_w), int(best_h)]})
    return {"n": len(paths), "detected": int(detected), "central": int(central),
            "covered": int(covered), "per_photo": per_photo}


def eval_bench_frames(det_params, thresholds, batch: int = 8,
                      frame_hw=(480, 640), faces_per_frame: int = 8, seed: int = 0,
                      cross_scale_mode: str = "dupmin") -> dict:
    import jax
    import jax.numpy as jnp

    from bench import _face_frames
    from facerec_tpu.detect.mtcnn import MTCNN

    rng = np.random.default_rng(seed)
    frames = _face_frames(batch, frame_hw, faces_per_frame, rng)
    det = MTCNN(frame_hw, min_face_size=40, max_faces=faces_per_frame,
                k_pnet=64, k_rnet=32, dtype=jnp.bfloat16, thresholds=thresholds,
                cross_scale_nms_mode=cross_scale_mode)
    out = jax.device_get(det.detect(det_params, jnp.asarray(frames)))
    found = int((np.asarray(out.probs) >= 0.6).sum())
    expected = batch * faces_per_frame
    return {"found": found, "expected": expected, "fill": round(found / expected, 4),
            "ok": bool(found >= 0.8 * expected)}


def evaluate_detector(weights_dir=None, bench_batch: int = 8, bench_seed: int = 0,
                      cross_scale_mode: str = "dupmin", max_faces: int = 4) -> dict:
    from facerec_tpu.detect.weights import (load_detector_params_with_source,
                                            thresholds_for_source)

    params, source = load_detector_params_with_source(weights_dir)
    th = thresholds_for_source(source)
    report = {"weights": str(weights_dir or "default"), "source": source,
              "thresholds": list(th), "cross_scale_mode": cross_scale_mode}
    if REF_DIR.is_dir():
        report["real"] = eval_real_photos(params, th, cross_scale_mode, max_faces)
    report["bench"] = eval_bench_frames(params, th, batch=bench_batch, seed=bench_seed,
                                        cross_scale_mode=cross_scale_mode)
    return report


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default=None)
    ap.add_argument("--bench-batch", type=int, default=8)
    ap.add_argument("--bench-seed", type=int, default=0)
    ap.add_argument("--cross-scale-mode", default="dupmin")
    ap.add_argument("--max-faces", type=int, default=4)
    args = ap.parse_args()
    rep = evaluate_detector(args.weights, args.bench_batch, args.bench_seed,
                            args.cross_scale_mode, args.max_faces)
    print(json.dumps(rep))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
