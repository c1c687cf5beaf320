"""Per-stage profile of the serving embedder (bf16 ResNet18 @ 160x160).

VERDICT round-2 weak #8 asked where the embedder's missing MXU efficiency
goes and what causes the batch-64 serve regression. This tool answers with a
per-macro-unit table: slope-timed PREFIX runs of the backbone (stem,
layer1..layer4 via ResNet18's ``upto`` hook, global pool, embedding head) —
consecutive differences give per-unit time; analytic conv FLOPs give per-unit
MXU efficiency. Methodology is the repo-standard slope chain (distinct
device-resident inputs, in-jit reduction, one final float() barrier) — see
CLAUDE.md measurement traps.

Also A/Bs the BN-folded serve form (models/fold.py) against the unfolded
eval path at the same shapes.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_embedder.py [batch...]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.profile_stages import slope_time  # noqa: E402

PEAK_BF16_TFLOPS = 197.0  # v5e


def conv_flops(h, w, cin, cout, k, stride):
    oh, ow = h // stride, w // stride
    return 2 * oh * ow * cin * cout * k * k, oh, ow


def unit_flops(size: int) -> list[tuple[str, float]]:
    """Analytic MACs*2 per macro-unit for ResNet18 at ``size``x``size``."""
    units = []
    f, h, w = conv_flops(size, size, 3, 64, 7, 2)
    units.append(("stem", f))
    h, w = h // 2, w // 2  # maxpool/2
    cin = 64
    for i, cout in enumerate((64, 128, 256, 512)):
        total = 0.0
        for b in range(2):
            stride = 2 if (i > 0 and b == 0) else 1
            f1, oh, ow = conv_flops(h, w, cin if b == 0 else cout, cout, 3, stride)
            f2, _, _ = conv_flops(oh, ow, cout, cout, 3, 1)
            total += f1 + f2
            if stride != 1 or (b == 0 and cin != cout):
                fd, _, _ = conv_flops(h, w, cin, cout, 1, stride)
                total += fd
            h, w = oh, ow
        cin = cout
        units.append((f"layer{i + 1}", total))
    units.append(("pool", 0.0))
    units.append(("head", 2 * 512 * 512))  # embedding dense (per sample)
    return units


def main():
    import jax
    import jax.numpy as jnp

    from facerec_tpu.models import get_model
    from facerec_tpu.models.fold import folded_arcface
    from facerec_tpu.models.resnet import ResNet18

    E = 160
    batches = [int(a) for a in sys.argv[1:]] or [256, 512]
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} embedder=arcface/ResNet18 bf16 {E}x{E}")

    init_model = get_model("arcface", num_classes=8, compute_dtype="bfloat16")
    ex = jnp.zeros((1, E, E, 3), jnp.float32)
    ev = init_model.init({"params": jax.random.key(1), "dropout": jax.random.key(2)},
                         ex, labels=jnp.zeros(1, jnp.int32), train=True)
    ev = {"params": ev["params"], "batch_stats": ev.get("batch_stats", {})}
    folded, folded_vars = folded_arcface(8, ev)
    folded_vars = jax.device_put(folded_vars)
    ev = jax.device_put(ev)
    backbone = ResNet18(dtype=jnp.bfloat16, folded=True)
    bvars = {"params": folded_vars["params"]["backbone"]}

    flops = unit_flops(E)
    for B in batches:
        crops = [jnp.asarray(rng.uniform(0, 255, (B, E, E, 3)).astype(np.float32))
                 for _ in range(13)]
        # cumulative prefix times: stem .. layer4, then full embed
        cum = []
        for upto in range(5):
            dt = slope_time(lambda c, u=upto: backbone.apply(bvars, c, upto=u), crops)
            cum.append(dt)
        full = slope_time(lambda c: folded.apply(folded_vars, c, method="embed"), crops)
        unfolded = slope_time(
            lambda c: init_model.apply(ev, c, method="embed"), crops)
        print(f"\nbatch {B}: full embed {full*1e3:.3f} ms "
              f"({sum(f for _, f in flops)*B/full/1e12:.1f} TFLOP/s, "
              f"{sum(f for _, f in flops)*B/full/1e12/PEAK_BF16_TFLOPS*100:.0f}% peak) | "
              f"unfolded {unfolded*1e3:.3f} ms (fold saves "
              f"{(unfolded-full)/unfolded*100:+.1f}%)")
        prev = 0.0
        for j, (name, f) in enumerate(flops[:5]):
            dt_u = cum[j] - prev
            prev = cum[j]
            eff = f * B / max(dt_u, 1e-9) / 1e12
            print(f"  {name:7s} {dt_u*1e3:7.3f} ms  {f*B/1e9:8.2f} GFLOP  "
                  f"{eff:6.1f} TFLOP/s  {eff/PEAK_BF16_TFLOPS*100:5.1f}% peak")
        tail = full - cum[4]
        print(f"  pool+head {tail*1e3:5.3f} ms")


if __name__ == "__main__":
    main()
