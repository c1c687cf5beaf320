"""Interleaved A/B: BN-folded vs unfolded serve embedder on the real TPU.

The relay's speed drifts run-to-run (CLAUDE.md: micro-probes 1.3-7x), so a
fold-vs-unfold comparison is only believable when the two measurements
alternate within one process: A, B, A, B, ... and per-pair deltas are
reported. Each measurement is a slope-timed chain over distinct
device-resident inputs (repo-standard methodology).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/ab_fold.py [batch [rounds]]
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

    from facerec_tpu.models import get_model
    from facerec_tpu.models.fold import fold_batchnorm

    E = 160
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} B={B} rounds={rounds}")

    model = get_model("arcface", num_classes=8, compute_dtype="bfloat16")
    ex = jnp.zeros((1, E, E, 3), jnp.float32)
    ev = model.init({"params": jax.random.key(1), "dropout": jax.random.key(2)},
                    ex, labels=jnp.zeros(1, jnp.int32), train=True)
    ev = {"params": ev["params"], "batch_stats": ev.get("batch_stats", {})}
    folded_vars = jax.device_put(fold_batchnorm(ev))
    ev = jax.device_put(ev)
    folded_model = get_model("arcface", num_classes=8, compute_dtype="bfloat16",
                             arcface_kwargs={"folded": True})

    crops = [jnp.asarray(rng.uniform(0, 255, (B, E, E, 3)).astype(np.float32))
             for _ in range(13)]

    def t_folded():
        return slope_time(lambda c: folded_model.apply(folded_vars, c, method="embed"), crops)

    def t_unfolded():
        return slope_time(lambda c: model.apply(ev, c, method="embed"), crops)

    t_folded(); t_unfolded()  # compile both before any timed round
    fs, us = [], []
    for r in range(rounds):
        f = t_folded()
        u = t_unfolded()
        fs.append(f)
        us.append(u)
        print(f"round {r}: folded {f*1e3:7.3f} ms | unfolded {u*1e3:7.3f} ms "
              f"| fold delta {(u-f)/u*100:+.1f}%")
    fm, um = float(np.median(fs)), float(np.median(us))
    print(f"median: folded {fm*1e3:.3f} ms, unfolded {um*1e3:.3f} ms, "
          f"fold saves {(um-fm)/um*100:+.1f}%")


if __name__ == "__main__":
    main()
