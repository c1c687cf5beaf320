"""Probe: align stage pieces + glue suspects at the batch-48 serve shape.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_align48.py
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

    from facerec_tpu.ops.pallas_warp import rotate_patches_pallas
    from facerec_tpu.ops.warp_fast import align_and_crop_fast_batched, _align_prep

    B, F, H, W, C, E = 48, 8, 480, 640, 3, 160
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} B={B} F={F}")

    frames = [jnp.asarray(rng.uniform(0, 255, (B, H, W, C)).astype(np.float32))
              for _ in range(13)]
    boxes = np.zeros((B, F, 4), np.float32)
    lmk = np.zeros((B, F, 5, 2), np.float32)
    for b in range(B):
        for f in range(F):
            s = rng.uniform(80, 160)
            x1 = rng.uniform(0, W - s - 1)
            y1 = rng.uniform(0, H - s - 1)
            boxes[b, f] = [x1, y1, x1 + s, y1 + s]
            lmk[b, f] = [[x1 + s * .3, y1 + s * .4], [x1 + s * .7, y1 + s * .4],
                         [x1 + s * .5, y1 + s * .6], [x1 + s * .35, y1 + s * .8],
                         [x1 + s * .65, y1 + s * .8]]
    boxes_j, lmk_j = jnp.asarray(boxes), jnp.asarray(lmk)

    def full_align(fr):
        return align_and_crop_fast_batched(fr, boxes_j, lmk_j, E, use_pallas=True,
                                           out_dtype=jnp.bfloat16)

    def prep_only(fr):
        p, a, c = jax.vmap(lambda im, bx, lm: _align_prep(im, bx, lm, E, 0.15))(
            fr, boxes_j, lmk_j)
        return p

    # rotate-only: fixed patches input (dtype bf16, as produced by _align_prep)
    p0 = jax.jit(prep_only)(frames[0])
    psize = p0.shape[2]
    patches = [jnp.asarray(rng.uniform(-1, 1, (B * F, psize, psize, C))
                           .astype(np.float32)).astype(jnp.bfloat16)
               for _ in range(13)]
    angles = jnp.asarray(rng.uniform(-0.2, 0.2, (B * F,)).astype(np.float32))
    centers = jnp.asarray(
        rng.uniform(psize * 0.4, psize * 0.6, (B * F, 2)).astype(np.float32))

    dt = slope_time(full_align, frames)
    print(f"align full (prep+pallas rotate): {dt*1e3:7.2f} ms")
    dt = slope_time(prep_only, frames)
    print(f"align prep (crop matmuls):       {dt*1e3:7.2f} ms")
    dt = slope_time(lambda p: rotate_patches_pallas(p, angles, centers, E), patches)
    print(f"pallas rotate standalone:        {dt*1e3:7.2f} ms")

    # glue suspect: the detect() range-autodetect full reduce over the frames
    dt = slope_time(lambda fr: jnp.where(jnp.max(fr) <= 2.0, fr * 255.0, fr).sum(),
                    frames)
    print(f"jnp.max range autodetect+where:  {dt*1e3:7.2f} ms")
    dt = slope_time(lambda fr: ((fr - 127.5) / 128.0).astype(jnp.bfloat16).sum(),
                    frames)
    print(f"normalize+cast only:             {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
