#!/usr/bin/env python
"""Dump stage-1/stage-2 candidates for one reference photo under different
cross-scale NMS modes — debugging why dupmin loses full-face coverage on
random3_00000003.jpg while union keeps it."""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from facerec_tpu.detect.mtcnn import MTCNN
    from facerec_tpu.detect.weights import (load_detector_params,
                                            CALIBRATED_THRESHOLDS)

    name = sys.argv[1] if len(sys.argv) > 1 else "random3_00000003.jpg"
    img = np.asarray(Image.open(f"/root/reference/face_references/{name}")
                     .convert("RGB").resize((160, 160)), np.float32)[None]
    params = load_detector_params()
    for mode in ("union", "dupmin"):
        det = MTCNN((160, 160), min_face_size=40, max_faces=2, k_pnet=64, k_rnet=32,
                    thresholds=CALIBRATED_THRESHOLDS, cross_scale_nms_mode=mode)
        xn = det.normalize(jnp.asarray(img))
        bx, sc, vl = jax.device_get(jax.jit(det.stage1)(params, xn))
        rows = []
        for i in range(bx.shape[1]):
            if not vl[0, i]:
                continue
            b = bx[0, i]
            rows.append({"i": i, "box": [round(float(v), 1) for v in b],
                         "side": round(float(max(b[2] - b[0], b[3] - b[1])), 1),
                         "score": round(float(sc[0, i]), 3)})
        out = jax.device_get(det.detect(params, jnp.asarray(img)))
        dets = [{"box": [round(float(v), 1) for v in out.boxes[0, j]],
                 "prob": round(float(out.probs[0, j]), 3)}
                for j in range(out.boxes.shape[1]) if out.valid[0, j]]
        print(json.dumps({"mode": mode, "stage1_valid": rows[:24], "final": dets}))


if __name__ == "__main__":
    main()
