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
    """[N, N] pairwise overlap. mode='union' -> IoU; 'min' -> inter/min(area)."""
    x1 = jnp.maximum(boxes[:, None, 0], boxes[None, :, 0])
    y1 = jnp.maximum(boxes[:, None, 1], boxes[None, :, 1])
    x2 = jnp.minimum(boxes[:, None, 2], boxes[None, :, 2])
    y2 = jnp.minimum(boxes[:, None, 3], boxes[None, :, 3])
    inter = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    a = box_area(boxes)
    if mode == "min":
        denom = jnp.minimum(a[:, None], a[None, :])
    else:
        denom = a[:, None] + a[None, :] - inter
    return inter / jnp.maximum(denom, 1e-12)


@functools.partial(jax.jit, static_argnames=("threshold", "mode", "max_out"))
def nms(
    boxes: jnp.ndarray,  # [N, 4] x1y1x2y2
    scores: jnp.ndarray,  # [N]
    valid: jnp.ndarray,  # [N] bool
    threshold: float = 0.5,
    mode: str = "union",
    max_out: int | None = None,
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

    # Selection loop over OUTPUT slots (m << n sequential steps, vs the
    # classic loop over all n candidates): each round takes the best
    # remaining candidate and suppresses its overlaps in one vector op.
    def body(_, carry):
        remaining, out_idx, out_keep, t = carry
        i = jnp.argmax(remaining)
        ok = remaining[i] > neg
        out_idx = out_idx.at[t].set(jnp.where(ok, i, 0))
        out_keep = out_keep.at[t].set(ok)
        sup = (ov[i] > threshold) | (jnp.arange(n) == i)
        remaining = jnp.where(ok & sup, neg, remaining)
        return remaining, out_idx, out_keep, t + 1

    init = (s0, jnp.zeros(m, jnp.int32), jnp.zeros(m, bool), 0)
    _, idx, keep, _ = jax.lax.fori_loop(0, m, body, init)
    b = boxes[idx]
    s = jnp.where(keep, scores.astype(jnp.float32)[idx], 0.0)
    return b, s, keep, idx
