"""Intra-detector stage profile on the real TPU (bench shapes).

Slope-times PREFIX programs of the MTCNN cascade — pyramid resizes only,
+P-Net, +stage-1 NMS, +R-Net, full cascade — consecutive differences give
per-stage time. Same methodology as tools/profile_stages.py (distinct
device-resident inputs, in-jit reduction, final float() barrier).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_detect.py [batch]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.profile_stages import slope_time  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from facerec_tpu.detect.mtcnn import MTCNN
    from facerec_tpu.detect.weights import load_detector_params
    from facerec_tpu.ops.image import resize_bilinear

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    HW = (480, 640)
    # input_range="255" matches the served construction (bench.py,
    # profile_stages.py): the default "auto" adds a full-frame jnp.max
    # range probe (~0.7 ms at serve shapes) the serve path never runs,
    # which would be misattributed to the pyramid stage.
    det = MTCNN(HW, min_face_size=40, max_faces=8, k_pnet=64, k_rnet=32,
                dtype=jnp.bfloat16, input_range="255")
    params = jax.device_put(load_detector_params())
    rng = np.random.default_rng(0)
    frames = [jnp.asarray(rng.uniform(0, 255, (B, *HW, 3)).astype(np.float32))
              for _ in range(13)]
    h, w = HW
    print(f"backend={jax.default_backend()} B={B} levels={len(det.scales)} "
          f"k_pnet={det.k_pnet} k_rnet={det.k_rnet} onet_slots="
          f"{det.rnet_keep + det.k_large} rnet_crop_scale={det.rnet_crop_scale}")

    # Prefix probes call the SAME methods detect() composes (normalize /
    # stage1 / rnet_crops / rnet.apply), so the deltas cannot drift from the
    # served program (an earlier hand-copied stage1 omitted the stratified
    # coarse quota and cropped full-res f32 — misattributing ~2x crop cost).
    def pyramid(images):
        xn = det.normalize(images)
        levels = []
        for scale in det.scales:
            sh = max(int(math.ceil(h * scale)), 12)
            sw = max(int(math.ceil(w * scale)), 12)
            levels.append(resize_bilinear(xn, (sh, sw)))
        return levels

    def pnet_maps(images):
        return [det.pnet.apply({"params": params["pnet"]}, lv)
                for lv in pyramid(images)]

    def stage1(images):
        return det.stage1(params, det.normalize(images))

    def rnet_crops(images):
        boxes, _, _ = stage1(images)
        return det.rnet_crops(det.normalize(images), boxes)

    def rnet_out(images):
        crops = rnet_crops(images)
        return det.rnet.apply({"params": params["rnet"]},
                              crops.reshape(-1, 24, 24, 3))

    probes = [
        ("pyramid        ", lambda im: sum(jnp.sum(lv) for lv in pyramid(im))),
        ("+pnet          ", lambda im: sum(jnp.sum(p) + jnp.sum(r)
                                           for p, r in pnet_maps(im))),
        ("+stage1 nms    ", lambda im: sum(jnp.sum(t) for t in stage1(im))),
        ("+rnet crops    ", lambda im: jnp.sum(rnet_crops(im))),
        ("+rnet          ", lambda im: sum(jnp.sum(t) for t in rnet_out(im))),
        ("full cascade   ", lambda im: sum(jnp.sum(t)
                                           for t in det.detect(params, im))),
    ]
    prev = 0.0
    for name, fn in probes:
        dt = slope_time(fn, frames)
        print(f"{name} {dt*1e3:7.2f} ms/batch  (delta {(dt-prev)*1e3:+6.2f} ms)")
        prev = dt


if __name__ == "__main__":
    main()
