"""ArcFaceNet — angular-margin embedding network (reference face_models.py:447-613).

ResNet-18 trunk ([:-1] cut, GAP 512) -> Dense(512, no bias) -> BatchNorm ->
dropout(0.2, train only) -> L2 normalize = the embedding. Training routes
through the fused arc-margin op (ops/arcface.py) with the class-center weight
held as a module parameter; evaluation returns cosine logits against those
same (normalized) class centers — the corrected eval path (the reference's
randomly-initialized ``val_classifier`` at testing.py:136,263 is a documented
defect; its hyperopt path does the cosine-center version at
hyperparameter_tuning.py:1036-1065, which we adopt).

Progressive margin state: the ``epoch`` scalar is passed in (carried in train
state), never mutated on the module. Two-phase freeze/unfreeze and the
ArcFace-specific adaptive gradient clipping live in the training engine.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from facerec_tpu.models.resnet import ResNet18
from facerec_tpu.ops.arcface import arc_margin_logits, cosine_logits, l2_normalize


class ArcFaceNet(nn.Module):
    num_classes: int = 18
    embedding_dim: int = 512
    dropout_rate: float = 0.2
    margin: float = 0.5
    scale: float = 32.0
    easy_margin: bool = False
    progressive_margin: bool = True
    warmup_epochs: int = 10
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    # Serve-time BN-folded variant (models/fold.py): every BatchNorm becomes
    # a bias-add with its affine baked into the producer kernel. Eval-only.
    folded: bool = False

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.backbone = ResNet18(name="backbone", folded=self.folded, **kw)
        self.embedding = nn.Dense(self.embedding_dim, use_bias=False, name="embedding", **kw)
        if self.folded:
            from facerec_tpu.models.fold import FoldedBias

            self.bn = FoldedBias(self.embedding_dim, name="bn", **kw)
        else:
            self.bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5, name="bn", **kw)
        self.dropout = nn.Dropout(self.dropout_rate)
        # Class-center weight [C, D], xavier-normal with gain sqrt(2)
        # (reference face_models.py:326-327).
        self.arc_weight = self.param(
            "arc_weight",
            nn.initializers.variance_scaling(2.0, "fan_avg", "truncated_normal"),
            (self.num_classes, self.embedding_dim),
            self.param_dtype,
        )

    def embed(self, x, train: bool = False):
        if self.folded and train:
            raise ValueError("folded models are eval-only (BN stats are baked in)")
        x = self.backbone.pooled(x, train=train)  # [B, 512]
        x = (self.bn(self.embedding(x)) if self.folded
             else self.bn(self.embedding(x), use_running_average=not train))
        if train:
            x = self.dropout(x, deterministic=False)
        return l2_normalize(x.astype(jnp.float32))

    def __call__(self, x, labels=None, epoch=0.0, train: bool = False, return_stats: bool = False):
        emb = self.embed(x, train=train)
        if train:
            if labels is None:
                raise ValueError("labels required during ArcFace training")
            logits, stats = arc_margin_logits(
                emb, self.arc_weight, labels, epoch,
                margin=self.margin, scale=self.scale, easy_margin=self.easy_margin,
                progressive=self.progressive_margin, warmup_epochs=self.warmup_epochs,
                training=True,
            )
            return (logits, stats) if return_stats else logits
        if labels is not None:  # eval logits for accuracy metrics
            return cosine_logits(emb, self.arc_weight)
        return emb

    def eval_logits(self, x):
        """Cosine logits vs class centers (eval classification path)."""
        return cosine_logits(self.embed(x, train=False), self.arc_weight)

    @staticmethod
    def xavier_gain() -> float:
        return math.sqrt(2)
