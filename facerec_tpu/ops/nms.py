"""Masked, static-shape non-maximum suppression (XLA-fused).

Replaces the data-dependent NMS inside facenet-pytorch's MTCNN (the
reference's detector dependency, data_prep.py:119-127) with a fixed-shape
formulation XLA can compile once: boxes are a padded [N, 4] buffer with a
validity mask; suppression runs as a fori_loop over the score-sorted IoU
matrix (SURVEY.md section 7 hard-part #1 mitigation: "padded top-k boxes per
stage, masked NMS").

Supports the two overlap modes MTCNN uses: 'union' (IoU) and 'min'
(intersection over smaller area, used by the O-Net stage).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(boxes[..., 2] - boxes[..., 0], 0) * jnp.maximum(boxes[..., 3] - boxes[..., 1], 0)


def overlap_matrix(boxes: jnp.ndarray, mode: str = "union") -> jnp.ndarray:
    """[N, N] pairwise overlap. mode='union' -> IoU; 'min' -> inter/min(area);
    'dupmin' -> inter/min(area) for SIMILAR-SIZE pairs (area ratio <= 2.5)
    and IoU otherwise. 'dupmin' is the stage-1 cross-scale merge criterion: a
    face's concentric candidates from adjacent pyramid levels (area ratio
    1.41^2 = 2 per step) have IoU ~0.5 (never merged by 'union', so an F-face
    frame burns ~3F-4F candidate slots) but min-overlap ~1; meanwhile a
    facial-PART box nested in a whole-face box falls back to IoU and is NOT
    merged — plain 'min' mode merged those too and let a higher-scoring part
    candidate eat the whole face (measured: the hardest reference-gallery
    photo lost full-face coverage, tools/detector_eval.py). The 2.5 bound
    separates the measured populations: one-step duplicates sit at 2.0, the
    pathological part-vs-whole pair on that photo at 2.6."""
    x1 = jnp.maximum(boxes[:, None, 0], boxes[None, :, 0])
    y1 = jnp.maximum(boxes[:, None, 1], boxes[None, :, 1])
    x2 = jnp.minimum(boxes[:, None, 2], boxes[None, :, 2])
    y2 = jnp.minimum(boxes[:, None, 3], boxes[None, :, 3])
    inter = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    a = box_area(boxes)
    if mode == "min":
        denom = jnp.minimum(a[:, None], a[None, :])
    elif mode == "dupmin":
        a_min = jnp.minimum(a[:, None], a[None, :])
        a_max = jnp.maximum(a[:, None], a[None, :])
        similar = a_max <= 2.5 * jnp.maximum(a_min, 1e-12)
        denom = jnp.where(similar, a_min, a[:, None] + a[None, :] - inter)
    else:
        denom = a[:, None] + a[None, :] - inter
    return inter / jnp.maximum(denom, 1e-12)


@functools.partial(jax.jit,
                   static_argnames=("threshold", "mode", "max_out", "unroll"))
def nms(
    boxes: jnp.ndarray,  # [N, 4] x1y1x2y2
    scores: jnp.ndarray,  # [N]
    valid: jnp.ndarray,  # [N] bool
    threshold: float = 0.5,
    mode: str = "union",
    max_out: int | None = None,
    unroll: int = 4,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Greedy NMS. Returns (boxes, scores, valid, gather_idx) sorted by score
    with suppressed/invalid entries masked out (and, if max_out, truncated to
    the top max_out slots)."""
    n = boxes.shape[0]
    neg = jnp.asarray(-jnp.inf, jnp.float32)
    s0 = jnp.where(valid, scores.astype(jnp.float32), neg)
    ov = overlap_matrix(boxes, mode)
    m = max_out if max_out is not None else n
    m = min(m, n)

    # Greedy NMS as a DAG fixed point: box i survives iff NO surviving
    # higher-scored box overlaps it past the threshold. Dependencies point
    # strictly up the score order (ties broken by lower index, matching
    # argmax), so synchronous iteration converges to exactly the classic
    # greedy result in (suppression-chain depth + 1) rounds — 2-4 in
    # practice for detection boxes, vs one sequential argmax+mask step per
    # OUTPUT SLOT in the selection-loop form (the detect stage's latency was
    # dominated by those ~80 sequential steps across the cascade's four NMS
    # rounds). Each round is one [N, N] elementwise pass; the while_loop
    # exits as soon as the survivor mask stops changing.
    idx_r = jnp.arange(n)
    dominates = (s0[None, :] > s0[:, None]) | (
        (s0[None, :] == s0[:, None]) & (idx_r[None, :] < idx_r[:, None]))
    sup = (ov > threshold) & dominates & valid[None, :]  # sup[i, j]: j can kill i

    # ``unroll`` rounds per while iteration: rounds past the fixed point are
    # IDEMPOTENT (new == keep once converged), so running a block of rounds
    # and checking convergence once per block returns the exact same mask
    # while cutting the serialized cond evaluations 4x — the stage-1 NMS
    # stack was latency-bound on those tiny sequential steps, not on the
    # [N, N] elementwise compute (round-5 tools/profile_detect.py: 1.70 ms
    # of the 5.83 ms detect stage at batch 48).
    def one_round(keep):
        return valid & (s0 > neg) & ~jnp.any(sup & keep[None, :], axis=1)

    def cond(carry):
        keep, prev, it = carry
        return (it < 1) | ((it < n) & jnp.any(keep != prev))

    def body(carry):
        keep, _, it = carry
        for _ in range(max(unroll - 1, 0)):
            keep = one_round(keep)
        new = one_round(keep)
        return new, keep, it + unroll

    keep0 = valid & (s0 > neg)
    keep_fp, _, _ = jax.lax.while_loop(cond, body, (keep0, jnp.zeros_like(keep0), 0))

    top_s, idx = jax.lax.top_k(jnp.where(keep_fp, s0, neg), m)
    keep = top_s > neg
    b = boxes[idx]
    s = jnp.where(keep, scores.astype(jnp.float32)[idx], 0.0)
    return b, s, keep, jnp.where(keep, idx, 0)
