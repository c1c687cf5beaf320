"""Probe: windowed crop (dynamic_slice + small matmul) vs full-frame crop matmul.

The align/R-Net/O-Net crop matmuls contract over the FULL frame height/width
per face (480/640 taps where bilinear needs ~2) — ~2.7 ms of the batch-48
serve step. A fixed-size window around each box would shrink the contraction
~2.3x, IF vmapped dynamic_slice extraction is cheap (per-element gathers run
at 3-9 ns/elem on TPU, which would eat the win; a previous K-tap
slice-per-tap formulation measured 80-96 ms — this probes ONE slice per
face).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_window_crop.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.profile_stages import slope_time  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from facerec_tpu.ops.warp_fast import _bilinear_weights, crop_resize_matmul

    B, F, H, W, C = 48, 8, 480, 640, 3
    P = 208  # align patch size
    WIN = 288  # window big enough for boxes up to ~220 px + pad
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} B={B} F={F} window={WIN} P={P}")

    frames = [jnp.asarray(rng.uniform(-1, 1, (B, H, W, C)).astype(np.float32))
              for _ in range(13)]
    boxes = np.zeros((B, F, 4), np.float32)
    for b in range(B):
        for f in range(F):
            s = rng.uniform(64, 180)
            x1 = rng.uniform(0, W - s - 1)
            y1 = rng.uniform(0, H - s - 1)
            boxes[b, f] = [x1, y1, x1 + s, y1 + s]
    boxes_j = jnp.asarray(boxes)

    def full_frame(fr):
        return jax.vmap(lambda im, bx: crop_resize_matmul(
            im, bx, P, out_dtype=jnp.bfloat16))(fr, boxes_j)

    def windowed(fr):
        bx = boxes_j
        x1, y1, x2, y2 = bx[..., 0], bx[..., 1], bx[..., 2], bx[..., 3]
        bw = jnp.maximum(x2 - x1, 1.0)
        bh = jnp.maximum(y2 - y1, 1.0)
        # window origin: centered, clamped to frame (f32 -> int32)
        oy = jnp.clip((y1 + y2) / 2 - WIN / 2, 0, H - WIN).astype(jnp.int32)
        ox = jnp.clip((x1 + x2) / 2 - WIN / 2, 0, W - WIN).astype(jnp.int32)

        def slice_one(im, oy1, ox1):
            return jax.lax.dynamic_slice(im, (oy1, ox1, 0), (WIN, WIN, C))

        wins = jax.vmap(  # [B, F, WIN, WIN, C]
            lambda im, oys, oxs: jax.vmap(lambda a, b2: slice_one(im, a, b2))(oys, oxs)
        )(fr, oy, ox)
        # weights in window coords
        sy = bh / P
        sx = bw / P
        wy = _bilinear_weights((y1 - oy).reshape(-1), sy.reshape(-1), P, WIN)
        wx = _bilinear_weights((x1 - ox).reshape(-1), sx.reshape(-1), P, WIN)
        wf = wins.reshape(B * F, WIN, WIN, C)
        t = jnp.einsum("nph,nhwc->npwc", wy.astype(jnp.bfloat16), wf.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        out = jnp.einsum("nqw,npwc->npqc", wx.astype(jnp.bfloat16),
                         t.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        return out.astype(jnp.bfloat16)

    # correctness first (window must reproduce the full-frame crop)
    a = np.asarray(full_frame(frames[0]), np.float32).reshape(B, F, P, P, C)
    c = np.asarray(windowed(frames[0]), np.float32).reshape(B, F, P, P, C)
    err = np.max(np.abs(a - c))
    print(f"max |full - windowed| = {err:.4f} (bf16 resolution ~0.008)")

    for name, fn in [("full-frame", full_frame), ("windowed", windowed)]:
        dt = slope_time(fn, frames)
        print(f"{name:11s} {dt*1e3:7.2f} ms/batch")


if __name__ == "__main__":
    main()
