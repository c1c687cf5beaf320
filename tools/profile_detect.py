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

    from facerec_tpu.detect.mtcnn import MTCNN, _square, _pad_slots
    from facerec_tpu.detect.weights import load_detector_params
    from facerec_tpu.ops.image import resize_bilinear
    from facerec_tpu.ops.nms import nms
    from facerec_tpu.ops.warp_fast import crop_resize_matmul

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    HW = (480, 640)
    det = MTCNN(HW, min_face_size=40, max_faces=8, k_pnet=64, k_rnet=32,
                dtype=jnp.bfloat16)
    params = jax.device_put(load_detector_params())
    rng = np.random.default_rng(0)
    frames = [jnp.asarray(rng.uniform(0, 255, (B, *HW, 3)).astype(np.float32))
              for _ in range(13)]
    h, w = HW
    print(f"backend={jax.default_backend()} B={B} levels={len(det.scales)} "
          f"k_pnet={det.k_pnet} k_rnet={det.k_rnet} onet_slots="
          f"{det.max_faces + det.k_large}")

    def norm(images):
        x = images.astype(jnp.float32)
        x = jnp.where(jnp.max(x) <= 2.0, x * 255.0, x)
        return ((x - 127.5) / 128.0).astype(det.dtype)

    def pyramid(images):
        xn = norm(images)
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
        """P-Net top-k + per-scale and cross-scale NMS (mirrors detect())."""
        b = images.shape[0]
        all_b, all_s, all_v = [], [], []
        for scale, (prob, reg) in zip(det.scales, pnet_maps(images)):
            bh, bw = prob.shape[1], prob.shape[2]
            k = min(det.k_pnet, bh * bw)
            flat = prob.reshape(b, -1)
            tp, ti = jax.lax.top_k(flat, k)
            iy = (ti // bw).astype(jnp.float32)
            ix = (ti % bw).astype(jnp.float32)
            boxes = jnp.stack([ix * 2 / scale, iy * 2 / scale,
                               (ix * 2 + 12) / scale, (iy * 2 + 12) / scale], -1)
            if boxes.shape[1] < det.k_pnet:
                pad = det.k_pnet - boxes.shape[1]
                boxes = jnp.pad(boxes, ((0, 0), (0, pad), (0, 0)))
                tp = jnp.pad(tp, ((0, 0), (0, pad)))
            all_b.append(boxes)
            all_s.append(tp)
            all_v.append(tp > 0.5)
        sb = jnp.stack(all_b, 1)
        ss = jnp.stack(all_s, 1)
        sv = jnp.stack(all_v, 1)
        k_keep = min(det.k_pnet, det.k_rnet)
        bx, sc, vl, _ = jax.vmap(jax.vmap(
            lambda bb, s_, vv: nms(bb, s_, vv, 0.5, "union", k_keep)))(sb, ss, sv)
        boxes, scores, valid, _ = jax.vmap(
            lambda bb, ss_, vv: nms(bb, ss_, vv, 0.7, "union", det.k_rnet)
        )(bx.reshape(b, -1, 4), sc.reshape(b, -1), vl.reshape(b, -1))
        boxes, scores, valid = _pad_slots(boxes, scores, valid, det.k_rnet)
        return _square(boxes), scores, valid

    def rnet_crops(images):
        boxes, _, _ = stage1(images)
        return jax.vmap(lambda im, bx: crop_resize_matmul(im, bx, 24))(
            norm(images), boxes)

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
