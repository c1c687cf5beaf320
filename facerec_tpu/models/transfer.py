"""ResNetTransfer — ResNet-18 transfer classifier (reference face_models.py:62-102).

ResNet-18 trunk -> GAP -> dropout(0.1) -> Dense(num_classes). Embedding is the
pre-FC pooled vector (:98). Backbone freeze/unfreeze for two-stage training is
handled functionally by the trainer via an ``optax.masked`` zero-update on
``backbone`` params (no requires_grad mutation — see train/engine.py), so the
module itself is stateless about phase.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from facerec_tpu.models.resnet import ResNet18


class ResNetTransfer(nn.Module):
    num_classes: int = 18
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        self.backbone = ResNet18(dtype=self.dtype, param_dtype=self.param_dtype, name="backbone")
        self.dropout = nn.Dropout(self.dropout_rate)
        self.fc = nn.Dense(self.num_classes, dtype=self.dtype, param_dtype=self.param_dtype, name="fc")

    def embed(self, x, train: bool = False):
        return self.backbone.pooled(x, train=train)  # [B, 512]

    def __call__(self, x, train: bool = False):
        e = self.embed(x, train)
        return self.fc(self.dropout(e, deterministic=not train))
