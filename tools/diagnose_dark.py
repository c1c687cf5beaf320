#!/usr/bin/env python
"""Diagnose darkest-tail bench-frame detection misses (VERDICT r3 item 1).

Renders bench-style frames EXACTLY like bench._face_frames (same rng draw
order) while capturing per-face ground truth (box, skin luminance, size),
runs the committed detector, matches GT to detections, and for every miss
reports where in the cascade the face died:
  - best stage-1 (P-Net) candidate IoU + P-Net validity at that slot
  - best R-Net-survivor IoU
  - final detection IoU / prob

Usage:
  PYTHONPATH=/root/repo python tools/diagnose_dark.py [--batch 8] [--seeds 0 1 2]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def face_frames_with_gt(batch, frame_hw, faces_per_frame, rng):
    """bench._face_frames with ground-truth capture. Keep the rng call order
    IDENTICAL to bench.py so the frames are bit-equal."""
    from facerec_tpu.data.synthetic import (_identity_params, face_bbox,
                                            render_face_photo)

    h, w = frame_hw
    frames = rng.uniform(0, 80, size=(batch, h, w, 3)).astype(np.float32)
    cols = int(np.ceil(np.sqrt(faces_per_frame)))
    rows = int(np.ceil(faces_per_frame / cols))
    cell_h, cell_w = h // rows, w // cols
    gt = []  # (b, f) -> dict
    for b in range(batch):
        for f in range(faces_per_frame):
            p = _identity_params(rng, skin_lum_range=(0.25, 1.0))
            size = int(rng.integers(64, min(cell_h, cell_w)))
            rot = float(rng.uniform(-8, 8))
            face, alpha = render_face_photo(p, size, jitter_rng=rng, rot_deg=rot)
            r, c = divmod(f, cols)
            oy = r * cell_h + int(rng.integers(0, max(cell_h - size, 1)))
            ox = c * cell_w + int(rng.integers(0, max(cell_w - size, 1)))
            region = frames[b, oy : oy + size, ox : ox + size]
            a = alpha[..., None]
            frames[b, oy : oy + size, ox : ox + size] = (
                a * face * 255.0 + (1 - a) * region)
            box = face_bbox(p, size, rot_deg=rot) + np.asarray([ox, oy, ox, oy], np.float32)
            gt.append({"b": b, "f": f, "box": box.tolist(),
                       "lum": float(p["skin_lum"]), "size": size})
    return frames, gt


def iou_matrix(gt_box, boxes):
    gt_box = np.asarray(gt_box)
    x1 = np.maximum(gt_box[0], boxes[:, 0]); y1 = np.maximum(gt_box[1], boxes[:, 1])
    x2 = np.minimum(gt_box[2], boxes[:, 2]); y2 = np.minimum(gt_box[3], boxes[:, 3])
    inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    aa = (gt_box[2] - gt_box[0]) * (gt_box[3] - gt_box[1])
    ab = np.maximum(boxes[:, 2] - boxes[:, 0], 0) * np.maximum(boxes[:, 3] - boxes[:, 1], 0)
    return inter / np.maximum(aa + ab - inter, 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0])
    ap.add_argument("--weights", default=None)
    ap.add_argument("--thresholds", type=float, nargs=3, default=None)
    ap.add_argument("--k-rnet", type=int, default=32)
    ap.add_argument("--k-pnet", type=int, default=64)
    ap.add_argument("--rnet-nms-iou", type=float, default=0.7)
    ap.add_argument("--cross-scale-mode", default="dupmin")  # pipeline default
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from facerec_tpu.detect.mtcnn import MTCNN
    from facerec_tpu.detect.weights import load_detector_params

    frame_hw = (480, 640)
    faces = 8
    det = MTCNN(frame_hw, min_face_size=40, max_faces=faces,
                k_pnet=args.k_pnet, k_rnet=args.k_rnet,
                rnet_nms_iou=args.rnet_nms_iou,
                cross_scale_nms_mode=args.cross_scale_mode,
                dtype=jnp.bfloat16, input_range="255",
                **({"thresholds": tuple(args.thresholds)} if args.thresholds else {}))
    params = load_detector_params(args.weights)

    stage1_fn = jax.jit(lambda p, x: det.stage1(p, det.normalize(x)))

    misses, total = [], 0
    lum_found, lum_missed = [], []
    midconf = []  # matched at prob>=0.6 but below the demo operating point 0.9
    for seed in args.seeds:
        rng = np.random.default_rng(seed)
        frames, gt = face_frames_with_gt(args.batch, frame_hw, faces, rng)
        xj = jnp.asarray(frames)
        out = jax.device_get(det.detect(params, xj))
        s1_boxes, s1_scores, s1_valid = jax.device_get(stage1_fn(params, xj))
        for g in gt:
            total += 1
            b = g["b"]
            det_iou = iou_matrix(g["box"], out.boxes[b])
            ok = bool(((det_iou >= 0.3) & (out.probs[b] >= 0.6)).any())
            if ok:
                lum_found.append(g["lum"])
                best = int(np.argmax(np.where(out.probs[b] >= 0.6, det_iou, -1.0)))
                p_best = float(out.probs[b][best])
                if p_best < 0.9:
                    midconf.append({"seed": seed, "b": b, "lum": round(g["lum"], 3),
                                    "size": g["size"], "prob": round(p_best, 3),
                                    "iou": round(float(det_iou[best]), 3)})
                continue
            lum_missed.append(g["lum"])
            # where did it die?
            s1_iou = iou_matrix(g["box"], np.asarray(s1_boxes[b]))
            best_s1 = int(np.argmax(s1_iou))
            hit = det_iou >= 0.3
            misses.append({
                "seed": seed, "b": b, "lum": round(g["lum"], 3), "size": g["size"],
                "s1_best_iou": round(float(s1_iou[best_s1]), 3),
                "s1_valid": bool(np.asarray(s1_valid)[b, best_s1]),
                "s1_score": round(float(np.asarray(s1_scores)[b, best_s1]), 3),
                "final_best_iou": round(float(det_iou.max()), 3),
                "final_prob_at_best": round(float(out.probs[b][np.argmax(det_iou)]), 3)
                if hit.any() else round(float(out.probs[b][np.argmax(det_iou)]), 3),
            })
    print(json.dumps({
        "total": total, "found": total - len(misses), "fill": round(1 - len(misses) / total, 4),
        "lum_found_mean": round(float(np.mean(lum_found)), 3) if lum_found else None,
        "lum_missed": sorted(round(v, 3) for v in lum_missed),
        "found_below_p090": len(midconf),
    }))
    for m in misses:
        print(json.dumps(m))
    for m in midconf:
        print(json.dumps({"midconf": m}))


if __name__ == "__main__":
    main()
