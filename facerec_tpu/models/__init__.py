"""Model zoo registry (reference face_models.py:785-830 get_model/get_criterion)."""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp

from facerec_tpu.models.arcface import ArcFaceNet
from facerec_tpu.models.attention import AttentionModule, AttentionNet, SpatialAttention
from facerec_tpu.models.baseline import BaselineNet
from facerec_tpu.models.ensemble import EnsembleModel
from facerec_tpu.models.hybrid import HybridNet, TransformerBlock
from facerec_tpu.models.losses import LOSS_CONFIG, contrastive_loss, cross_entropy, pairwise_distance
from facerec_tpu.models.resnet import ResNet18
from facerec_tpu.models.siamese import SiameseNet
from facerec_tpu.models.transfer import ResNetTransfer

MODEL_TYPES = ["baseline", "cnn", "siamese", "attention", "arcface", "hybrid", "ensemble"]

DEFAULT_ENSEMBLE_MEMBERS = ["cnn", "attention", "arcface"]  # reference face_models.py:806-808


def _dtypes(compute_dtype: str = "float32", param_dtype: str = "float32") -> dict:
    return {"dtype": jnp.dtype(compute_dtype), "param_dtype": jnp.dtype(param_dtype)}


def get_model(
    model_type: str | Sequence[str],
    num_classes: int = 18,
    compute_dtype: str = "float32",
    param_dtype: str = "float32",
    dropout_rate: float | None = None,
    arcface_kwargs: dict[str, Any] | None = None,
    ensemble_method: str = "average",
):
    """Model factory (reference face_models.py:785-813)."""
    kw = _dtypes(compute_dtype, param_dtype)
    if isinstance(model_type, (list, tuple)):
        return create_ensemble(list(model_type), num_classes, ensemble_method, compute_dtype, param_dtype)
    if model_type == "baseline":
        return BaselineNet(num_classes=num_classes, dropout_rate=dropout_rate or 0.5, **kw)
    if model_type == "cnn":
        return ResNetTransfer(num_classes=num_classes, dropout_rate=dropout_rate or 0.1, **kw)
    if model_type == "siamese":
        return SiameseNet(**kw)
    if model_type == "attention":
        return AttentionNet(num_classes=num_classes, dropout_rate=dropout_rate or 0.25, **kw)
    if model_type == "arcface":
        akw = dict(arcface_kwargs or {})
        return ArcFaceNet(num_classes=num_classes, dropout_rate=dropout_rate or 0.2, **akw, **kw)
    if model_type == "hybrid":
        return HybridNet(num_classes=num_classes, **kw)
    if model_type == "ensemble":
        return create_ensemble(DEFAULT_ENSEMBLE_MEMBERS, num_classes, ensemble_method, compute_dtype, param_dtype)
    raise ValueError(f"Invalid model type: {model_type}")


def create_ensemble(
    model_types: list[str],
    num_classes: int,
    ensemble_method: str = "average",
    compute_dtype: str = "float32",
    param_dtype: str = "float32",
) -> EnsembleModel:
    """reference face_models.py:942-957."""
    members = [
        get_model(t, num_classes=num_classes, compute_dtype=compute_dtype, param_dtype=param_dtype)
        for t in model_types
    ]
    return EnsembleModel(members=tuple(members), member_types=tuple(model_types),
                         ensemble_method=ensemble_method, **_dtypes(compute_dtype, param_dtype))


def get_criterion(model_type: str):
    """Return ``loss_fn(outputs, batch, mask) -> scalar`` for a model type
    (reference face_models.py:815-830)."""
    if model_type not in LOSS_CONFIG:
        raise ValueError(f"Invalid model type: {model_type}")
    name, kwargs = LOSS_CONFIG[model_type]
    if name == "contrastive":
        def loss_fn(outputs, batch, mask=None):
            emb_a, emb_b = outputs
            return contrastive_loss(emb_a, emb_b, batch["pair_label"], mask=mask, **kwargs)
    else:
        def loss_fn(outputs, batch, mask=None):
            return cross_entropy(outputs, batch["label"], mask=mask, **kwargs)
    return loss_fn


__all__ = [
    "MODEL_TYPES", "DEFAULT_ENSEMBLE_MEMBERS", "get_model", "get_criterion", "create_ensemble",
    "BaselineNet", "ResNetTransfer", "SiameseNet", "AttentionNet", "AttentionModule",
    "SpatialAttention", "ArcFaceNet", "HybridNet", "TransformerBlock", "EnsembleModel",
    "ResNet18", "cross_entropy", "contrastive_loss", "pairwise_distance",
]
