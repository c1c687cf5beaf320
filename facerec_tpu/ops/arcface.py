"""ArcFace angular-margin logits — fused, jit-friendly, TPU-native.

Re-implements the *behavior* of the reference's ``ArcMarginProduct``
(reference face_models.py:297-445) as a pure function: one normalized matmul
(MXU) plus elementwise margin math (VPU), which XLA fuses into a single
kernel. The reference's progressive-margin/scale warmup is load-bearing for
training stability (SURVEY.md section 7 hard-part #3) and is reproduced
exactly, but as traced functions of an ``epoch`` scalar carried in train
state — no Python-side module mutation.

Semantics reproduced (reference face_models.py):
  * warmup (:336-348): progress = epoch/warmup_epochs;
    margin_factor = min(0.9, progress^2); scale_factor = min(0.8, 0.3+0.5*progress);
    post-warmup fixed at 0.9 / 0.8.
  * cosine logits from L2-normalized features x weights (:351-355).
  * clamp to +-(1-1e-7), theta = acos (:363-366).
  * easy margin: phi = where(cos>0, cos(theta+m_eff), cos) applied to the
    target class only (:372-384); standard: theta+m_eff capped at pi-1e-4 (:386-397).
  * scale caps: s capped at 24; training scale = min(s,24)*min(0.8, scale_factor);
    extra (0.8 - 0.5*margin_factor) reduction when m > 0.4 (:399-418).
  * non-finite scrubbing to zeros (:423-427).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class ArcFaceStats(NamedTuple):
    """Monitoring values (reference face_models.py:431-445 get_margin_stats)."""

    margin_factor: jnp.ndarray
    scale_factor: jnp.ndarray
    effective_margin: jnp.ndarray
    effective_scale: jnp.ndarray
    max_cos_theta: jnp.ndarray
    min_cos_theta: jnp.ndarray


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def progressive_factors(epoch: jnp.ndarray, warmup_epochs: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Quadratic margin ramp + linear scale ramp (face_models.py:336-348)."""
    progress = jnp.clip(epoch / max(warmup_epochs, 1), 0.0, 1.0).astype(jnp.float32)
    margin_factor = jnp.minimum(0.9, progress * progress)
    scale_factor = jnp.minimum(0.8, 0.3 + 0.5 * progress)
    in_warmup = epoch < warmup_epochs
    margin_factor = jnp.where(in_warmup, margin_factor, 0.9)
    scale_factor = jnp.where(in_warmup, scale_factor, 0.8)
    return margin_factor, scale_factor


@partial(jax.jit, static_argnames=("margin", "scale", "easy_margin", "progressive", "warmup_epochs", "training"))
def arc_margin_logits(
    embeddings: jnp.ndarray,  # [B, D] (need not be pre-normalized)
    weight: jnp.ndarray,  # [C, D] class-center weights
    labels: jnp.ndarray | None,  # [B] int; required when training
    epoch: jnp.ndarray | float = 0.0,
    *,
    margin: float = 0.5,
    scale: float = 32.0,
    easy_margin: bool = False,
    progressive: bool = True,
    warmup_epochs: int = 10,
    training: bool = True,
) -> tuple[jnp.ndarray, ArcFaceStats]:
    """Return (scaled margin logits [B, C], monitoring stats)."""
    f32 = jnp.float32
    x = l2_normalize(embeddings.astype(f32))
    w = l2_normalize(weight.astype(f32))
    cos_theta = jnp.dot(x, w.T, preferred_element_type=f32,
                        precision=jax.lax.Precision.HIGHEST)  # MXU, full fp32

    epoch = jnp.asarray(epoch, f32)
    if training and progressive:
        margin_factor, scale_factor = progressive_factors(epoch, warmup_epochs)
    else:
        margin_factor = jnp.asarray(1.0 if not training else 0.9, f32)
        scale_factor = jnp.asarray(0.8, f32)

    cos_safe = jnp.clip(cos_theta, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_safe)
    eff_margin = margin * margin_factor if training else jnp.asarray(margin, f32)

    if labels is not None:
        one_hot = jax.nn.one_hot(labels, weight.shape[0], dtype=bool)
        if easy_margin:
            phi = jnp.where(cos_safe > 0, jnp.cos(theta + eff_margin), cos_safe)
        else:
            phi = jnp.cos(jnp.minimum(math.pi - 1e-4, theta + eff_margin))
        output = jnp.where(one_hot, phi, cos_safe)
    else:
        output = cos_safe

    eff_s = min(scale, 24.0)
    if training:
        eff_scale = eff_s * jnp.minimum(0.8, scale_factor)
        if margin > 0.4:
            eff_scale = eff_scale * (0.8 - 0.5 * margin_factor)
    else:
        eff_scale = jnp.asarray(eff_s, f32)

    output = output * eff_scale
    output = jnp.where(jnp.isfinite(output), output, 0.0)

    stats = ArcFaceStats(
        margin_factor=margin_factor,
        scale_factor=scale_factor,
        effective_margin=jnp.asarray(eff_margin, f32),
        effective_scale=jnp.asarray(eff_scale, f32),
        max_cos_theta=jnp.max(cos_theta),
        min_cos_theta=jnp.min(cos_theta),
    )
    return output, stats


def cosine_logits(embeddings: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """Plain cosine-similarity logits vs class centers — the ArcFace eval path
    (the reference's *correct* variant, hyperparameter_tuning.py:1036-1065;
    we deliberately do not replicate the randomly-initialized eval classifier
    defect at testing.py:136,263)."""
    x = l2_normalize(embeddings.astype(jnp.float32))
    w = l2_normalize(weight.astype(jnp.float32))
    return jnp.dot(x, w.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
