"""Probe: int8 vs bf16 conv/matmul throughput on this TPU.

v5e's MXU doubles peak at int8 (394 vs 197 T). If XLA emits the int8 path
for conv_general_dilated / dot_general, a quantized serve embedder is worth
building; if not, drop the idea. Shapes mirror ResNet18 layer2/3 at serve
batch (384 crops).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_int8.py
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

    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()}")

    B = 384
    for (hw, cin, cout) in [((20, 20), 128, 128), ((10, 10), 256, 256)]:
        h, w = hw
        k_bf = jnp.asarray(rng.normal(0, 0.1, (3, 3, cin, cout)), jnp.bfloat16)
        k_i8 = jnp.asarray(rng.integers(-127, 127, (3, 3, cin, cout)), jnp.int8)
        xs_bf = [jnp.asarray(rng.normal(0, 1, (B, h, w, cin)), jnp.bfloat16)
                 for _ in range(13)]
        xs_i8 = [jnp.asarray(rng.integers(-127, 127, (B, h, w, cin)), jnp.int8)
                 for _ in range(13)]
        dn = jax.lax.conv_dimension_numbers((B, h, w, cin), (3, 3, cin, cout),
                                            ("NHWC", "HWIO", "NHWC"))
        flops = 2 * B * h * w * cin * cout * 9

        def conv_bf(x):
            return jax.lax.conv_general_dilated(
                x, k_bf, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.float32).sum()

        def conv_i8(x):
            return jax.lax.conv_general_dilated(
                x, k_i8, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32).sum()

        t_bf = slope_time(conv_bf, xs_bf)
        t_i8 = slope_time(conv_i8, xs_i8)
        print(f"conv {h}x{w}x{cin}->{cout}: bf16 {t_bf*1e3:6.3f} ms "
              f"({flops/t_bf/1e12:5.1f} T) | int8 {t_i8*1e3:6.3f} ms "
              f"({flops/t_i8/1e12:5.1f} T) | speedup {t_bf/t_i8:4.2f}x")

    # plain matmul check
    M = 4096
    a_bf = [jnp.asarray(rng.normal(0, 1, (M, M)), jnp.bfloat16) for _ in range(13)]
    a_i8 = [jnp.asarray(rng.integers(-127, 127, (M, M)), jnp.int8) for _ in range(13)]
    b_bf = jnp.asarray(rng.normal(0, 1, (M, M)), jnp.bfloat16)
    b_i8 = jnp.asarray(rng.integers(-127, 127, (M, M)), jnp.int8)
    fl = 2 * M**3
    t_bf = slope_time(lambda a: jnp.dot(a, b_bf,
                                        preferred_element_type=jnp.float32).sum(), a_bf)
    t_i8 = slope_time(lambda a: jnp.dot(a, b_i8,
                                        preferred_element_type=jnp.int32).sum(), a_i8)
    print(f"matmul {M}^3: bf16 {t_bf*1e3:6.3f} ms ({fl/t_bf/1e12:5.1f} T) | "
          f"int8 {t_i8*1e3:6.3f} ms ({fl/t_i8/1e12:5.1f} T) | "
          f"speedup {t_bf/t_i8:4.2f}x")


if __name__ == "__main__":
    main()
