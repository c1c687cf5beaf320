"""Training-step throughput on the real TPU.

BASELINE.md's reference metric shapes include epoch wall time
(/root/reference/src/training.py:473,642,656) and avg inference ms at eval
(testing.py:163-178); the repo's perf numbers so far are serve-side only.
This measures the REAL training path — facerec_tpu.train.steps.jit_steps
(GSPMD batch sharding, donated state, injected hyperparams) — at the
reference's model scale (ResNet18-class backbone, 160x160, 512-d).

Methodology (CLAUDE.md measurement traps): the train step threads TrainState
through every call, so a dispatch chain is naturally serialized and no two
executions ever see identical inputs; batches come from a pool of distinct
device-resident uploads; the only host materialization is one final scalar;
per-step time is the slope between a short and a long chain.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_train.py
Env: BENCH_TRAIN_BATCH (default 256), BENCH_TRAIN_MODEL (arcface|siamese|
baseline, default arcface).
"""

from __future__ import annotations

import itertools
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


def time_train_chain(train_step, state, pool, n_steps):
    """Seconds for n_steps chained train dispatches (state threads through),
    ending in ONE host materialization. Returns (seconds, final_state)."""
    t0 = time.perf_counter()
    metrics = None
    for i in range(n_steps):
        state, metrics = train_step(state, pool[i % len(pool)])
    float(metrics["loss_sum"])  # the only true barrier through the relay
    return time.perf_counter() - t0, state


_EVAL_CURSOR = itertools.count(1)


def time_eval_chain(eval_step, state, pool, n_steps, image_key="image"):
    """Unlike the train chain (state threads through, so inputs are never
    repeated), eval_step is stateless: without a per-call salt the pool
    wraps after len(pool) calls and every later call repeats an exact
    (state, batch) pair — served from the execution cache at ~0 time
    (CLAUDE.md trap #1). The salt is traced (added in-jit) and the cursor
    persists across chains so the long chain never replays the short one."""

    @jax.jit
    def salted(state, batch, salt):
        b = dict(batch)
        b[image_key] = b[image_key] + salt * 1e-4
        return eval_step(state, b)

    t0 = time.perf_counter()
    metrics = None
    for _ in range(n_steps):
        i = next(_EVAL_CURSOR)
        metrics = salted(state, pool[i % len(pool)], float(i))
    float(metrics["loss_sum"])
    return time.perf_counter() - t0


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

    t0 = time.time()
    _, state = time_train_chain(train_step, state, pool, 2)  # compile + warm
    compile_s = time.time() - t0

    t_short, state = time_train_chain(train_step, state, pool, 4)
    t_long, state = time_train_chain(train_step, state, pool, 16)
    step_s = max((t_long - t_short) / 12, 1e-9)

    ekey = "image_a" if model_type == "siamese" else "image"
    time_eval_chain(eval_step, state, pool, 2, ekey)  # compile + warm
    e_short = time_eval_chain(eval_step, state, pool, 4, ekey)
    e_long = time_eval_chain(eval_step, state, pool, 16, ekey)
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
