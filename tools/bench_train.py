"""Training-step throughput on the real TPU.

BASELINE.md's reference metric shapes include epoch wall time
(/root/reference/src/training.py:473,642,656) and avg inference ms at eval
(testing.py:163-178); the repo's perf numbers so far are serve-side only.
This measures the REAL training path — facerec_tpu.train.steps.jit_steps
(GSPMD batch sharding, donated state, injected hyperparams) — at the
reference's model scale (ResNet18-class backbone, 160x160, 512-d).

Methodology (CLAUDE.md measurement traps): the train step threads TrainState
through every call, so no two executions ever see identical inputs; batches
come from a pool of distinct device-resident uploads; the only host
materialization is one final scalar; per-step time is the slope between a
short and a long chain. Round 5: the chain is a lax.scan INSIDE one jit —
host-chained train_step dispatches carry a non-constant per-dispatch
overhead through the relay (the ~190-leaf state tree serializes per call)
that does not cancel in the slope and inflated the step to 23.4 ms; the
scanned chain measures ~14.5-15 ms (instrumented 2026-08-20, see
tools/profile_train.py). Each scan executable compiles twice (init-state
layout, then its own output layout) — warm both before timing.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_train.py
Env: BENCH_TRAIN_BATCH (default 256), BENCH_TRAIN_MODEL (arcface|siamese|
baseline, default arcface).
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np


def make_batches(model_type: str, batch: int, size: int, n_pool: int, mesh):
    from facerec_tpu.parallel.mesh import shard_batch

    rng = np.random.default_rng(0)
    pool = []
    for _ in range(n_pool):
        if model_type == "siamese":
            b = {
                "image_a": rng.normal(0, 1, (batch, size, size, 3)).astype(np.float32),
                "image_b": rng.normal(0, 1, (batch, size, size, 3)).astype(np.float32),
                "pair_label": rng.integers(0, 2, (batch,)).astype(np.int32),
            }
        else:
            b = {
                "image": rng.normal(0, 1, (batch, size, size, 3)).astype(np.float32),
                "label": rng.integers(0, 18, (batch,)).astype(np.int32),
            }
        pool.append(shard_batch(b, mesh))
    return pool


def make_eval_chain(eval_step, image_key="image"):
    """Scanned eval chain, one dispatch per timing call (CLAUDE.md trap #8:
    host-chained dispatches of the ~190-leaf state break the slope; an
    earlier version also re-created its jit wrapper per chain, putting a
    retrace inside the timed window). eval_step is stateless, so the scan
    body is salted by the iteration index — without it the body is
    loop-invariant and XLA would hoist a single evaluation out of the
    loop (sub-trap B)."""
    import functools

    raw = eval_step.__wrapped__ if hasattr(eval_step, "__wrapped__") else eval_step

    @functools.partial(jax.jit, static_argnames="n")
    def evals_n(state, batch, n):
        def body(carry, i):
            b = dict(batch)
            b[image_key] = b[image_key] + i.astype(jnp.float32) * 1e-4
            m = raw(state, b)
            return carry, m["loss_sum"]
        _, losses = jax.lax.scan(body, 0, jnp.arange(n))
        return jnp.sum(losses)

    def chain(state, batch, n):
        t0 = time.perf_counter()
        float(evals_n(state, batch, n))
        return time.perf_counter() - t0

    return chain


def main() -> None:
    from facerec_tpu.config import TrainConfig
    from facerec_tpu.models import get_model
    from facerec_tpu.parallel.mesh import build_mesh, shard_params
    from facerec_tpu.train.state import create_train_state
    from facerec_tpu.train.steps import jit_steps

    model_type = os.environ.get("BENCH_TRAIN_MODEL", "arcface")
    batch = int(os.environ.get("BENCH_TRAIN_BATCH", 256))
    size = 160
    cfg = TrainConfig(model_type=model_type, batch_size=batch, num_classes=18)

    model = get_model(model_type, num_classes=18, compute_dtype=cfg.compute_dtype)
    mesh = build_mesh(cfg.mesh)
    pool = make_batches(model_type, batch, size, n_pool=8, mesh=mesh)

    state = create_train_state(model, pool[0], cfg, model_type, jax.random.key(0))
    state = state.replace(params=shard_params(state.params, mesh),
                          batch_stats=shard_params(state.batch_stats, mesh))
    train_step, eval_step = jit_steps(model, model_type, mesh)

    import functools

    raw_step = train_step.__wrapped__ if hasattr(train_step, "__wrapped__") else train_step

    @functools.partial(jax.jit, static_argnames="n")
    def steps_n(s, batch, n):
        def body(carry, _):
            s2, m = raw_step(carry, batch)
            return s2, m["loss_sum"]
        s, losses = jax.lax.scan(body, s, None, length=n)
        return s, jnp.sum(losses)

    def scan_time(s, batch, n):
        t0 = time.perf_counter()
        s, tot = steps_n(s, batch, n)
        float(tot)
        return time.perf_counter() - t0, s

    t0 = time.time()
    for w in range(4):  # compile n=4/n=16, then re-warm both on the carry layout
        _, state = scan_time(state, pool[w % len(pool)], 4 if w % 2 == 0 else 16)
    compile_s = time.time() - t0

    t_short, state = scan_time(state, pool[4 % len(pool)], 4)
    t_long, state = scan_time(state, pool[5 % len(pool)], 16)
    step_s = max((t_long - t_short) / 12, 1e-9)

    ekey = "image_a" if model_type == "siamese" else "image"
    eval_chain = make_eval_chain(eval_step, ekey)
    for w in (4, 16, 4, 16):  # compile both n, then warm
        eval_chain(state, pool[w % len(pool)], w)
    e_short = eval_chain(state, pool[0], 4)
    e_long = eval_chain(state, pool[1], 16)
    eval_s = max((e_long - e_short) / 12, 1e-9)

    out = {
        "model": model_type,
        "batch": batch,
        "image": size,
        "train_step_ms": round(step_s * 1e3, 2),
        "train_imgs_per_sec": round(batch / step_s, 1),
        "eval_step_ms": round(eval_s * 1e3, 2),
        "eval_imgs_per_sec": round(batch / eval_s, 1),
        "backend": jax.default_backend(),
        "devices": len(jax.devices()),
        "compile_s": round(compile_s, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
