"""Kernel-vs-oracle exactness fuzz for the packed Pallas top-k at 1M rows.

The unit tests check the packed single-max merge kernel (ops/gallery.py) in
interpreter mode at 1,024 rows; this tool runs the REAL compiled kernel on
TPU at the production shape — a 1,048,576 x 512 bf16 gallery — and compares
against the XLA matmul+top_k oracle on the SAME bf16-rounded values, across
several valid-prefix counts (full, ragged mid-prefix, tiny prefix).

Comparison contract (from the kernel's packing design):
  * scores match within 2^-18 quantization (~4e-6) + f32 reduction-order
    noise between the tiled kernel matmul and XLA's — tolerance 1e-5;
  * indices match EXACTLY wherever the oracle's score gap to the adjacent
    ranks (including the UNRETURNED rank k+1 — the kernel may legitimately
    promote it over a rank-k entry that ties within noise) exceeds the
    quantization bound plus the f32 reduction-order band between the tiled
    kernel matmul and XLA's (candidates ~1e-6 apart can order either way);
    with 1M Gaussian rows, order-statistic gaps are ~1e-2, so genuine ties
    are rare and counted, not hidden.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/fuzz_topk_1m.py
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from facerec_tpu.ops.gallery import gallery_topk_pallas, gallery_topk_xla

QUANT = 2.0 ** -18


def main() -> None:
    G, D, B, K = 1 << 20, 512, 256, 5
    print(f"backend={jax.default_backend()} G={G} D={D} B={B} k={K}")

    @jax.jit
    def make(key):
        kg, kq = jax.random.split(key)
        g = jax.random.normal(kg, (G, D), jnp.float32)
        g = g / jnp.linalg.norm(g, axis=1, keepdims=True)
        q = jax.random.normal(kq, (B, D), jnp.float32)
        q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
        return g.astype(jnp.bfloat16), q.astype(jnp.bfloat16)

    # decisiveness margin: quantization (2^-18) + f32 reduction-order noise
    # between the kernel's tiled matmul and XLA's (bf16 x bf16 products are
    # exact but the 512-term f32 accumulation order differs, ~1e-6 on unit
    # cosines — observed: two entries 1e-6 apart swapped ranks)
    DEC = 2 * QUANT + 5e-6

    failures = 0
    tie_skips = 0
    for trial, count in enumerate([G, 777_777, 131_072, 4_099, 7]):
        gb, qb = make(jax.random.key(trial))
        v_k, i_k = gallery_topk_pallas(qb, gb, count, k=K)
        # oracle fetches K+1 ranks: rank K's decisiveness depends on its gap
        # to the unreturned rank K+1 (the kernel may promote a within-noise tie)
        v_o1, i_o1 = gallery_topk_xla(qb, gb, count, k=K + 1)
        v_k, i_k, v_o1, i_o1 = map(np.asarray, jax.device_get((v_k, i_k, v_o1, i_o1)))
        v_o, i_o = v_o1[:, :K], i_o1[:, :K]

        dv = np.abs(v_k - v_o).max()
        if dv > 1e-5:
            print(f"count={count}: FAIL score diff {dv:.2e} > 1e-5")
            failures += 1
            continue
        # index agreement where the oracle's inter-rank gap is decisive
        gaps = v_o1[:, :-1] - v_o1[:, 1:]  # [B, K], descending so >= 0
        decisive = gaps[:, :K] > DEC  # gap to the NEXT rank
        decisive[:, 1:] &= gaps[:, : K - 1] > DEC  # and to the previous one
        mism = (i_k != i_o) & decisive
        ties = int(((i_k != i_o) & ~decisive).sum())
        tie_skips += ties
        if mism.any():
            b, r = np.argwhere(mism)[0]
            print(f"count={count}: FAIL {mism.sum()} decisive index mismatches, "
                  f"e.g. q{b} rank{r}: kernel {i_k[b, r]} (v={v_k[b, r]:.6f}) "
                  f"vs oracle {i_o[b, r]} (v={v_o[b, r]:.6f})")
            failures += 1
            continue
        assert int(i_k.max()) < count
        print(f"count={count}: ok  max|dv|={dv:.2e}  ties-in-quantum={ties}")

    print(f"{'PASS' if failures == 0 else 'FAIL'}: 5 counts at 1M rows, "
          f"{tie_skips} within-quantum ties total")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
