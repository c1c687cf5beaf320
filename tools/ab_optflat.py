"""Optimizer-fusion A/B: per-leaf optax chain vs optax.flatten (one vector).

Round-4 VERDICT #6 follow-up. `tools/profile_train.py` measures the
optimizer-only chain (global-norm clip + AdamW over the 11.4M-param arcface
tree) at ~2.9 ms against a 0.39 ms HBM roofline (7 f32 passes over 45.7 MB
of params = 321 MB at 819 GB/s): ~7x off the floor. Hypothesis: the tree has
~60 leaves and XLA fuses per-leaf update chains separately — dozens of small
kernels whose launch + sub-lane-width tails dominate. `optax.flatten` runs
the SAME transform over one concatenated f32 vector: one fused elementwise
chain at full VPU width.

Semantics note for adoption (not just the probe): the production chain is
chain(backbone_scale, clip_by_global_norm, adamw). backbone_scale matches
param-tree key paths, so it CANNOT live inside flatten (a flat vector has no
keys); the adoption shape would be chain(backbone_scale, flatten(chain(clip,
adamw))). Global-norm clip over the flat vector computes the same norm up to
f32 reduction order. This probe measures the update math only, with
backbone_scale at its default no-op scale=1.

Interleaved rounds, medians, state threads through every chain (no relay
execution-cache hits — CLAUDE.md measurement traps).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/ab_optflat.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ROUNDS = 3


def main() -> None:
    from facerec_tpu.config import TrainConfig
    from facerec_tpu.models import get_model
    from facerec_tpu.train.state import create_train_state, make_optimizer

    cfg = TrainConfig(model_type="arcface", batch_size=256, num_classes=18)
    model = get_model("arcface", num_classes=18, compute_dtype=cfg.compute_dtype)
    batch = {"image": np.zeros((2, 160, 160, 3), np.float32),
             "label": np.zeros((2,), np.int32)}
    state = create_train_state(model, batch, cfg, "arcface", jax.random.key(0))
    params = state.params
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    n_leaves = len(jax.tree_util.tree_leaves(params))
    print(f"backend={jax.default_backend()} params={n_params/1e6:.2f}M "
          f"leaves={n_leaves}")

    grads = jax.jit(lambda p: jax.tree_util.tree_map(
        lambda x: jnp.full_like(x, 1e-4), p))(params)

    opt = cfg.optimizer
    variants = {
        # the production chain (what profile_train measures)
        "tree": make_optimizer(opt, "arcface"),
        # adoption shape: clip+adamw fused over one flat vector
        "flat": optax.flatten(optax.chain(
            optax.clip_by_global_norm(0.3),
            optax.adamw(opt.learning_rate, b1=opt.beta1, b2=opt.beta2,
                        weight_decay=opt.weight_decay))),
        # control: same transforms per-leaf (isolates flatten from the
        # inject_hyperparams/backbone plumbing the production chain carries)
        "tree_plain": optax.chain(
            optax.clip_by_global_norm(0.3),
            optax.adamw(opt.learning_rate, b1=opt.beta1, b2=opt.beta2,
                        weight_decay=opt.weight_decay)),
    }

    # numerical check first: one update, flat vs per-leaf (same math modulo
    # f32 reduction order in the global norm)
    upd = {}
    for name, tx in variants.items():
        st = jax.jit(tx.init)(params)
        u, _ = jax.jit(tx.update)(grads, st, params)
        upd[name] = u
    dmax = max(float(jnp.max(jnp.abs(a - b)))
               for a, b in zip(jax.tree_util.tree_leaves(upd["flat"]),
                               jax.tree_util.tree_leaves(upd["tree_plain"])))
    print(f"flat-vs-tree_plain max|update diff| = {dmax:.2e} (reduction-order only)")

    # SCANNED chains, one dispatch per timing call: host-chained dispatches
    # through the relay carry non-constant per-dispatch overhead that does
    # not cancel in the 4-vs-16 slope (the train-step probe measured 62 ms
    # "per step" on a 4-chain vs 17 on a 16-chain — tools/profile_train.py
    # history). Warm each n TWICE: the executable recompiles once against
    # the scan-output carry layout.
    import functools

    chains = {}
    for name, tx in variants.items():
        opt_state = jax.jit(tx.init)(params)

        @functools.partial(jax.jit, static_argnames="n")
        def steps_n(p, s, g, n, tx=tx):
            def body(carry, _):
                pp, ss = carry
                u, s2 = tx.update(g, ss, pp)
                return (optax.apply_updates(pp, u), s2), ()
            (p, s), _ = jax.lax.scan(body, (p, s), None, length=n)
            return p, s, jnp.sum(jax.tree_util.tree_leaves(p)[0].astype(jnp.float32))

        def chain(p, s, n, steps_n=steps_n):
            t0 = time.perf_counter()
            p, s, tot = steps_n(p, s, grads, n)
            float(tot)
            return time.perf_counter() - t0, p, s

        p = params
        for w in (4, 16, 4, 16):  # compile both n, then warm both layouts
            _, p, opt_state = chain(p, opt_state, w)
        chains[name] = (chain, p, opt_state)

    results = {name: [] for name in variants}
    for r in range(ROUNDS):
        for name, (chain, p, s) in chains.items():
            t_s, p, s = chain(p, s, 4)
            t_l, p, s = chain(p, s, 16)
            chains[name] = (chain, p, s)
            results[name].append(max((t_l - t_s) / 12, 1e-9))
            print(f"round {r} {name:10s}: {results[name][-1]*1e3:6.3f} ms/step")

    floor_ms = 7 * n_params * 4 / 819e9 * 1e3
    print(f"\nHBM floor (7 f32 passes): {floor_ms:.2f} ms")
    for name, ts in results.items():
        med = float(np.median(ts)) * 1e3
        print(f"median {name:10s}: {med:6.3f} ms/step  ({med/floor_ms:.1f}x floor)")


if __name__ == "__main__":
    main()
