"""Loss functions (reference face_models.py:725-830 get_criterion / ContrastiveLoss).

All losses take an optional ``mask`` ([B] in {0,1}) so padded tail batches
(static-shape requirement under jit) contribute zero — replacing the
reference's drop-last/variable-batch handling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from facerec_tpu.ops.arcface import l2_normalize


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray | None) -> jnp.ndarray:
    if mask is None:
        return jnp.mean(x)
    mask = mask.astype(x.dtype)
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray, label_smoothing: float = 0.0,
                  mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """CE with label smoothing (reference uses 0.1 for classifiers, 0.05 for
    arcface — face_models.py:815-830)."""
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    if label_smoothing > 0:
        onehot = onehot * (1.0 - label_smoothing) + label_smoothing / num_classes
    losses = -jnp.sum(onehot * jax.nn.log_softmax(logits, axis=-1), axis=-1)
    return _masked_mean(losses, mask)


def contrastive_loss(emb_a: jnp.ndarray, emb_b: jnp.ndarray, same_label: jnp.ndarray,
                     margin: float = 2.0, pos_weight: float = 1.2, neg_weight: float = 0.8,
                     mask: jnp.ndarray | None = None, eps: float = 1e-8) -> jnp.ndarray:
    """Contrastive loss with the *consistent* label convention: 1 = same
    identity (matches SiamesePairBatcher and reference data_utils.py:120).

    The reference's loss module inverted the convention (face_models.py:757-760
    treats label 1 as "push apart"), silently fighting its own dataset — a
    documented defect we fix (SURVEY.md section 7 hard-part #4): same pairs
    (label 1) minimize distance^2, different pairs (label 0) are pushed to at
    least ``margin``. The pos/neg weights keep the reference's emphasis
    (pos_weight on positive=same pairs).
    """
    a = l2_normalize(emb_a.astype(jnp.float32))
    b = l2_normalize(emb_b.astype(jnp.float32))
    dist = jnp.sqrt(jnp.maximum(jnp.sum((a - b) ** 2, axis=-1), eps**2))
    same = same_label.astype(jnp.float32)
    loss_same = same * dist**2 * pos_weight
    loss_diff = (1.0 - same) * jnp.maximum(margin - dist, 0.0) ** 2 * neg_weight
    return _masked_mean(loss_same + loss_diff, mask)


def pairwise_distance(emb_a: jnp.ndarray, emb_b: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return jnp.sqrt(jnp.maximum(jnp.sum((emb_a - emb_b) ** 2, axis=-1), eps))


LOSS_CONFIG = {
    # model_type -> (loss name, kwargs)  (reference get_criterion face_models.py:815-830)
    "baseline": ("cross_entropy", {"label_smoothing": 0.1}),
    "cnn": ("cross_entropy", {"label_smoothing": 0.1}),
    "attention": ("cross_entropy", {"label_smoothing": 0.1}),
    "hybrid": ("cross_entropy", {"label_smoothing": 0.1}),
    "ensemble": ("cross_entropy", {"label_smoothing": 0.1}),
    "siamese": ("contrastive", {"margin": 2.0, "pos_weight": 1.2, "neg_weight": 0.8}),
    "arcface": ("cross_entropy", {"label_smoothing": 0.05}),
}
