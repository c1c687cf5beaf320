"""Train-step roofline: prefix-diff breakdown of the ArcFace train step.

Round-4 VERDICT #6: training runs at ~11k imgs/s (batch 256 @ 160x160) ≈ 40%
of bf16 peak counting fwd+bwd conv FLOPs, vs the serve embedder's ~80% — is
that the bwd roofline or money on the table? This tool decomposes the REAL
`train/steps.py` step three ways, all with the repo-standard slope-chain
methodology (distinct device-resident batches, in-jit reductions, one final
host materialization — CLAUDE.md measurement traps):

1. Stage split: fwd-loss-only vs value_and_grad vs optimizer-only
   (AdamW update + clip, state threading through a real chain), with the
   full train step as the cross-check sum.
2. Per-unit bwd: prefix runs of the train-mode backbone (stem, layer1..4 via
   ResNet18's ``upto`` hook) under value_and_grad; consecutive differences
   give per-unit fwd+bwd time; subtracting the fwd-only prefix diff gives
   per-unit bwd time and MXU efficiency against the analytic 2x-fwd bwd
   FLOPs (dL/dx + dL/dW are each one conv-shaped contraction).
3. Optimizer roofline: AdamW at f32 reads p/m/v/g and writes p/m/v —
   7 passes over the parameter bytes; measured vs that bound.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_train.py
Env: BENCH_TRAIN_BATCH (default 256).
"""

from __future__ import annotations

import functools
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.bench_train import make_batches  # noqa: E402
from tools.profile_embedder import PEAK_BF16_TFLOPS, unit_flops  # noqa: E402
from tools.profile_stages import slope_time  # noqa: E402

HBM_GBPS = 819.0  # v5e nominal


def main() -> None:
    from facerec_tpu.config import TrainConfig
    from facerec_tpu.models import get_model, get_criterion
    from facerec_tpu.models.resnet import ResNet18
    from facerec_tpu.parallel.mesh import build_mesh, shard_params
    from facerec_tpu.train.state import create_train_state
    from facerec_tpu.train.steps import _forward, jit_steps

    B = int(os.environ.get("BENCH_TRAIN_BATCH", 256))
    E = int(os.environ.get("BENCH_TRAIN_SIZE", 160))  # shrink for CPU smoke runs
    mt = "arcface"
    cfg = TrainConfig(model_type=mt, batch_size=B, num_classes=18)
    model = get_model(mt, num_classes=18, compute_dtype=cfg.compute_dtype)
    mesh = build_mesh(cfg.mesh)
    pool = make_batches(mt, B, E, n_pool=16, mesh=mesh)
    loss_fn = get_criterion(mt)

    state = create_train_state(model, pool[0], cfg, mt, jax.random.key(0))
    state = state.replace(params=shard_params(state.params, mesh),
                          batch_stats=shard_params(state.batch_stats, mesh))
    train_step, _ = jit_steps(model, mt, mesh)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(state.params))
    print(f"backend={jax.default_backend()} model={mt} B={B} {E}x{E} "
          f"params={n_params/1e6:.1f}M")

    # ---- 1. full step (cross-check target) --------------------------------
    # SCANNED, not host-chained: a host-side dispatch chain of train_step
    # calls measured 247 ms for 4 steps vs 268 ms for 16 on the relay — the
    # per-dispatch overhead (~tens of ms, non-constant) swamps the 17 ms of
    # compute and even drives the slope NEGATIVE-ish (the first run of this
    # tool printed "full step 0.00 ms"). lax.scan runs the whole chain as ONE
    # dispatch, so the n=16 vs n=4 slope is pure step compute. Reusing one
    # batch inside the scan is safe: within a single executable there is no
    # execution cache, and state (params/opt) changes every iteration.
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

    # Each executable compiles TWICE: once against the hand-sharded initial
    # state's layout and once against the scan-OUTPUT state layout that all
    # later calls carry (instrumented 2026-08-20: call 3 of this sequence was
    # a 34 s recompile, which made t_s > t_l and printed "full step 0.00 ms").
    # Two warm rounds make both executables steady before timing.
    for w in range(4):
        _, state = scan_time(state, pool[w], 4 if w % 2 == 0 else 16)
    fulls = []
    for r in range(2):
        t_s, state = scan_time(state, pool[4 + 2 * r], 4)
        t_l, state = scan_time(state, pool[5 + 2 * r], 16)
        fulls.append(max((t_l - t_s) / 12, 1e-9))
    full = float(np.median(fulls))
    fwd_flops = sum(f for _, f in unit_flops(E)) * B
    print(f"full step: {full*1e3:7.2f} ms  ({B/full:7.0f} imgs/s; fwd+bwd conv "
          f"{3*fwd_flops/full/1e12:.1f} TFLOP/s = "
          f"{3*fwd_flops/full/1e12/PEAK_BF16_TFLOPS*100:.0f}% bf16 peak)")

    # ---- stage split: fwd / fwd+bwd (stateless, slope over distinct batches)
    key = jax.random.key(7)
    params, stats = state.params, state.batch_stats

    def fwd_only(batch, p, st):
        out, new_stats = _forward(model, mt, p, st, batch, True, 0, key)
        return loss_fn(out, batch, None), new_stats

    def fwd_bwd(batch, p, st):
        def cl(pp):
            out, new_stats = _forward(model, mt, pp, st, batch, True, 0, key)
            return loss_fn(out, batch, None), new_stats
        (loss, new_stats), grads = jax.value_and_grad(cl, has_aux=True)(p)
        return loss, grads

    t_fwd = slope_time(fwd_only, pool, params, stats)
    t_vg = slope_time(fwd_bwd, pool, params, stats)
    print(f"fwd loss:  {t_fwd*1e3:7.2f} ms  ({fwd_flops/t_fwd/1e12:5.1f} TFLOP/s fwd conv, "
          f"{fwd_flops/t_fwd/1e12/PEAK_BF16_TFLOPS*100:.0f}% peak)")
    bwd = t_vg - t_fwd
    print(f"fwd+bwd:   {t_vg*1e3:7.2f} ms  -> bwd {bwd*1e3:.2f} ms "
          f"({2*fwd_flops/bwd/1e12:5.1f} TFLOP/s bwd conv, "
          f"{2*fwd_flops/bwd/1e12/PEAK_BF16_TFLOPS*100:.0f}% peak)")

    # ---- optimizer-only: scanned chain, state threads through -------------
    # Host-chained opt_step dispatches measured 2.9-3.7 ms/step here — a
    # per-dispatch overhead artifact (the state tree is ~190 leaves). The
    # scanned chain (tools/ab_optflat.py cross-checks it) puts the SAME
    # production chain at ~0.4 ms ≈ its 7-pass HBM floor. Caveat: grads are
    # scan-invariant, so XLA may hoist grad-only work (e.g. the global-norm
    # reduction) out of the loop — treat as the in-situ lower bound; the
    # full-step sum check keeps it honest.
    grads = jax.jit(lambda p: jax.tree_util.tree_map(
        lambda x: jnp.full_like(x, 1e-4), p))(params)

    @functools.partial(jax.jit, static_argnames="n")
    def opt_n(s, g, n):
        def body(carry, _):
            return carry.apply_gradients(g), ()
        s, _ = jax.lax.scan(body, s, None, length=n)
        return s, jnp.sum(jax.tree_util.tree_leaves(s.params)[0].astype(jnp.float32))

    def opt_chain(s, n):
        t0 = time.perf_counter()
        s, tot = opt_n(s, grads, n)
        float(tot)
        return time.perf_counter() - t0, s

    st2 = state
    for w in (4, 16, 4, 16):  # compile both n, then warm the carry layout
        _, st2 = opt_chain(st2, w)
    t_s, st2 = opt_chain(st2, 4)
    t_l, st2 = opt_chain(st2, 16)
    t_opt = max((t_l - t_s) / 12, 1e-9)
    opt_bytes = 7 * n_params * 4  # read p,m,v,g + write p,m,v (f32)
    if t_opt < 5e-5:
        # With scan-invariant grads XLA can hoist essentially the whole
        # update out of the loop and the slope collapses; the honest in-situ
        # optimizer cost is the full-step residual printed below.
        print("optimizer:  <slope noise floor with constant grads "
              "(XLA hoists the update; see tools/ab_optflat.py: ~0.39 ms "
              "= its 7-pass HBM floor)")
    else:
        print(f"optimizer: {t_opt*1e3:7.2f} ms  (clip+AdamW; {opt_bytes/1e6:.0f} MB "
              f"roofline {opt_bytes/HBM_GBPS/1e6:.2f} ms @ {HBM_GBPS:.0f} GB/s -> "
              f"{opt_bytes/t_opt/1e9:.0f} GB/s effective)")
    print(f"full - (fwd+bwd) residual = optimizer+metrics+gnorm in situ: "
          f"{(full-t_vg)*1e3:+.2f} ms "
          f"(vs the optimizer's {opt_bytes/HBM_GBPS/1e6:.2f} ms HBM floor)")

    # ---- per-unit bwd via train-mode backbone prefixes ---------------------
    backbone = ResNet18(dtype=jnp.bfloat16)
    bv = backbone.init({"params": jax.random.key(1)},
                       jnp.zeros((1, E, E, 3), jnp.float32), train=True)
    bparams, bstats = jax.device_put(bv["params"]), jax.device_put(bv["batch_stats"])
    imgs = [p["image"] for p in pool]

    def prefix_fwd(x, p, st, upto):
        out, st2 = backbone.apply({"params": p, "batch_stats": st}, x, train=True,
                                  upto=upto, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32) ** 2), st2

    def prefix_vg(x, p, st, upto):
        def cl(pp):
            return prefix_fwd(x, pp, st, upto)
        (loss, _), grads = jax.value_and_grad(cl, has_aux=True)(p)
        return loss, grads

    # INTERLEAVED rounds with per-prefix medians: a sequential prefix walk
    # puts minutes of relay drift (1.3-7x on micro-probes, CLAUDE.md) between
    # prefix k and k+1, which produced negative layer3/4 diffs on the first
    # run of this tool. Round-robin keeps every consecutive-diff pair within
    # one drift window.
    ROUNDS = 3
    cf = [[] for _ in range(5)]
    cb = [[] for _ in range(5)]
    for _ in range(ROUNDS):
        for u in range(5):
            cf[u].append(slope_time(lambda x, p, s, u=u: prefix_fwd(x, p, s, u), imgs, bparams, bstats))
            cb[u].append(slope_time(lambda x, p, s, u=u: prefix_vg(x, p, s, u), imgs, bparams, bstats))
    cum_f = [float(np.median(v)) for v in cf]
    cum_b = [float(np.median(v)) for v in cb]
    print("\nper-unit (train-mode backbone prefix diffs):")
    print(f"  {'unit':8s} {'fwd ms':>8s} {'f+b ms':>8s} {'bwd ms':>8s} "
          f"{'bwd TFLOP/s':>12s} {'% peak':>7s}")
    pf = pb = 0.0
    for j, (name, f) in enumerate(unit_flops(E)[:5]):
        df, db = cum_f[j] - pf, cum_b[j] - pb
        pf, pb = cum_f[j], cum_b[j]
        dbwd = db - df
        eff = 2 * f * B / max(dbwd, 1e-9) / 1e12
        print(f"  {name:8s} {df*1e3:8.3f} {db*1e3:8.3f} {dbwd*1e3:8.3f} "
              f"{eff:12.1f} {eff/PEAK_BF16_TFLOPS*100:6.1f}%")


if __name__ == "__main__":
    main()
