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

import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.bench_train import make_batches, time_train_chain  # noqa: E402
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
    _, state = time_train_chain(train_step, state, pool, 2)  # compile + warm
    t_s, state = time_train_chain(train_step, state, pool, 4)
    t_l, state = time_train_chain(train_step, state, pool, 16)
    full = max((t_l - t_s) / 12, 1e-9)
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

    # ---- optimizer-only: real chain, state threads through ----------------
    grads = jax.jit(lambda p: jax.tree_util.tree_map(
        lambda x: jnp.full_like(x, 1e-4), p))(params)

    @jax.jit
    def opt_step(s, g):
        return s.apply_gradients(g)

    @jax.jit
    def probe(s):
        return jnp.sum(jax.tree_util.tree_leaves(s.params)[0].astype(jnp.float32))

    def opt_chain(s, n):
        t0 = time.perf_counter()
        for _ in range(n):
            s = opt_step(s, grads)
        float(probe(s))
        return time.perf_counter() - t0, s

    _, st2 = opt_chain(state, 2)  # compile + warm
    t_s, st2 = opt_chain(st2, 4)
    t_l, st2 = opt_chain(st2, 16)
    t_opt = max((t_l - t_s) / 12, 1e-9)
    opt_bytes = 7 * n_params * 4  # read p,m,v,g + write p,m,v (f32)
    print(f"optimizer: {t_opt*1e3:7.2f} ms  (clip+AdamW; {opt_bytes/1e6:.0f} MB "
          f"roofline {opt_bytes/HBM_GBPS/1e6:.2f} ms @ {HBM_GBPS:.0f} GB/s -> "
          f"{opt_bytes/t_opt/1e9:.0f} GB/s effective)")
    print(f"sum check: fwd+bwd+opt = {(t_vg+t_opt)*1e3:.2f} ms vs full "
          f"{full*1e3:.2f} ms (residual = metrics/gnorm/nonfinite mask: "
          f"{(full-t_vg-t_opt)*1e3:+.2f} ms)")

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

    names = [n for n, _ in unit_flops(E)[:5]]
    cum_f, cum_b = [], []
    for u in range(5):
        cum_f.append(slope_time(lambda x, p, s, u=u: prefix_fwd(x, p, s, u), imgs, bparams, bstats))
        cum_b.append(slope_time(lambda x, p, s, u=u: prefix_vg(x, p, s, u), imgs, bparams, bstats))
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
