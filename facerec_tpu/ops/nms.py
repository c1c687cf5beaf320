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
    neg = jnp.asarray(-jnp.inf, scores.dtype)
    masked_scores = jnp.where(valid, scores, neg)
    order = jnp.argsort(-masked_scores)
    b = boxes[order]
    s = masked_scores[order]
    v = valid[order]
    ov = overlap_matrix(b, mode)

    def body(i, keep):
        sup = (ov[i] > threshold) & (jnp.arange(n) > i) & keep[i]
        return keep & ~sup

    keep = jax.lax.fori_loop(0, n, body, v)
    s = jnp.where(keep, s, neg)
    # compact survivors to the front (stable by score)
    order2 = jnp.argsort(-s)
    b, s, keep = b[order2], s[order2], keep[order2]
    idx = order[order2]
    if max_out is not None and max_out < n:
        b, s, keep, idx = b[:max_out], s[:max_out], keep[:max_out], idx[:max_out]
    return b, jnp.where(keep, s, 0.0), keep, idx
