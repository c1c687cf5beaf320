"""Match-kernel scaling probe: per-grid-step time vs gallery size.

The round-5 campaign measured the packed top-k at 131k bf16 in 0.28 ms
(4.4 us per 2048-row gallery tile) but 1M bf16 in ~4.6 ms (9 us/tile —
2x the per-step cost, with f32 timing the SAME as bf16 at that scale).
Same tile shapes, so per-step work is identical; this probe sweeps gallery
size at fixed tile geometry IN ONE RUN (immune to the relay's cross-run
drift, CLAUDE.md) and reports ms + us/step + effective GB/s for bf16 and
f32, plus a block_b variant, to locate where and why the per-step cost
inflates.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_match_scale.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.profile_stages import slope_time  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from facerec_tpu.ops.gallery import gallery_topk_pallas

    B, D, K, TG = 384, 512, 5, 2048
    print(f"backend={jax.default_backend()} B={B} D={D} k={K} block_g={TG}")

    embs = [jax.random.normal(jax.random.key(100 + i), (B, D), jnp.float32)
            for i in range(13)]
    for g_rows in (65_536, 131_072, 262_144, 524_288, 1_048_576):
        gal = jax.random.normal(jax.random.key(g_rows % 97), (g_rows, D), jnp.float32)
        count = jnp.asarray(g_rows, jnp.int32)
        steps = g_rows // TG
        for dtype, name in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32 ")):
            gd = gal.astype(dtype)
            # block_g=4096 is NOT an arm: at batch tile 384 its scores +
            # packed + pair halves total ~18 MB of VMEM scratch, over the
            # v5e 16 MB scoped limit (measured compile OOM 2026-08-21)
            for merge, bg in (("pair", 2048), ("flat", 2048)):
                dt = slope_time(lambda e, g: gallery_topk_pallas(e, g, count, k=K,
                                                                 merge=merge,
                                                                 block_g=bg),
                                embs, gd)
                nbytes = g_rows * D * jnp.dtype(dtype).itemsize
                print(f"G={g_rows:9d} {name} {merge}/{bg}: {dt*1e3:7.3f} ms  "
                      f"{dt/(g_rows//bg)*1e6:6.2f} us/step  "
                      f"{nbytes/dt/1e9:6.0f} GB/s eff")
        # block_b 128: 3 batch tiles -> 3x the gallery re-streaming, but each
        # step's merge walks a 3x smaller [TB, TG] tile — separates
        # bandwidth-bound from merge-bound regimes
        gd = gal.astype(jnp.bfloat16)
        dt = slope_time(lambda e, g: gallery_topk_pallas(e, g, count, k=K,
                                                         block_b=128), embs, gd)
        print(f"G={g_rows:9d} bb128: {dt*1e3:6.3f} ms")


if __name__ == "__main__":
    main()
