#!/usr/bin/env python
"""Probe P-Net's raw response on the dark missed faces (pre-top-k/NMS).

For each missed face from diagnose_dark, compute the P-Net prob map at the
pyramid levels nearest the face scale and report the MAX prob inside the GT
box region, under three inputs:
  raw       — the served normalize() path (lowlight gate: whole-frame std<24)
  reexpose  — unconditional global re-exposure to std 48 / mean 110
  oracle    — per-face-region re-exposure (GT-box stats -> std 48 / mean 110)

If `oracle` lights up (>0.6) where `raw` is ~0, the weights are fine and a
LOCAL exposure remap solves it; if even oracle stays low, P-Net needs
training on dark/low-contrast scenes.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from diagnose_dark import face_frames_with_gt, iou_matrix  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from facerec_tpu.detect.mtcnn import MTCNN
    from facerec_tpu.detect.weights import load_detector_params
    from facerec_tpu.ops.image import resize_bilinear

    frame_hw = (480, 640)
    det = MTCNN(frame_hw, min_face_size=40, max_faces=8, k_pnet=64, k_rnet=32,
                dtype=jnp.bfloat16, input_range="255")
    params = load_detector_params()

    rng = np.random.default_rng(0)
    frames, gt = face_frames_with_gt(8, frame_hw, 8, rng)
    out = jax.device_get(det.detect(params, jnp.asarray(frames)))
    missed = []
    for g in gt:
        det_iou = iou_matrix(g["box"], out.boxes[g["b"]])
        if not bool(((det_iou >= 0.3) & (out.probs[g["b"]] >= 0.6)).any()):
            missed.append(g)
    print(f"# missed: {[(m['b'], round(m['lum'],3), m['size']) for m in missed]}",
          file=sys.stderr)

    @jax.jit
    def pnet_map(x, scale_idx):
        # build one pyramid level and return the prob map
        pass  # placeholder; levels built below per scale outside jit

    def prob_maps(frame_u8: np.ndarray):
        """frame [H,W,3] float 0..255 -> list of (scale, prob_map np)."""
        xn = ((frame_u8.astype(np.float32) - 127.5) / 128.0)
        x = jnp.asarray(xn, jnp.bfloat16)[None]
        maps = []
        for scale in det.scales:
            sh = max(int(np.ceil(frame_hw[0] * scale)), 12)
            sw = max(int(np.ceil(frame_hw[1] * scale)), 12)
            level = resize_bilinear(x, (sh, sw))
            prob, _ = det.pnet.apply({"params": params["pnet"]}, level)
            maps.append((scale, np.asarray(jax.device_get(prob))[0]))
        return maps

    def max_in_box(maps, box):
        """max P-Net prob over cells whose 12px window center falls in box,
        per scale; returns {scale: max_prob} for levels where the face is
        8..24 px (the scoring levels)."""
        x1, y1, x2, y2 = box
        side = max(x2 - x1, y2 - y1)
        res = {}
        for scale, pm in maps:
            fsz = side * scale
            if not (7.0 <= fsz <= 26.0):
                continue
            bh, bw = pm.shape
            iy, ix = np.mgrid[0:bh, 0:bw]
            cx = (ix * 2.0 + 6.0) / scale
            cy = (iy * 2.0 + 6.0) / scale
            sel = (cx >= x1) & (cx <= x2) & (cy >= y1) & (cy <= y2)
            res[round(scale, 4)] = round(float(pm[sel].max()), 4) if sel.any() else None
        return res

    for m in missed[:4]:
        b = m["b"]
        frame = frames[b]
        box = np.asarray(m["box"])
        # raw
        raw = max_in_box(prob_maps(frame), box)
        # global re-exposure
        mu, sd = frame.mean(), frame.std()
        gframe = np.clip((frame - mu) * (48.0 / max(sd, 4.0)) + 110.0, 0, 255)
        glob = max_in_box(prob_maps(gframe), box)
        # oracle local re-exposure: stats from the GT box, applied globally
        x1, y1, x2, y2 = [int(round(v)) for v in box]
        reg = frame[max(y1, 0):y2, max(x1, 0):x2]
        mu_r, sd_r = reg.mean(), reg.std()
        oframe = np.clip((frame - mu_r) * (48.0 / max(sd_r, 4.0)) + 110.0, 0, 255)
        orac = max_in_box(prob_maps(oframe), box)
        print(json.dumps({"b": b, "lum": m["lum"], "size": m["size"],
                          "region_mean": round(float(mu_r), 1),
                          "region_std": round(float(sd_r), 1),
                          "raw": raw, "reexpose_global": glob, "oracle_local": orac}))


if __name__ == "__main__":
    main()
