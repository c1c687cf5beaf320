"""BaselineNet — 3-block CNN classifier (reference face_models.py:16-60).

conv3x3-BN-ReLU-maxpool x3 (32/64/128 ch) -> global avg pool -> FC512
(ReLU, the embedding) -> dropout(0.5) -> FC num_classes. NHWC.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class BaselineNet(nn.Module):
    num_classes: int = 18
    dropout_rate: float = 0.5
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.convs = [nn.Conv(ch, (3, 3), padding=1, name=f"conv{i + 1}", **kw)
                      for i, ch in enumerate((32, 64, 128))]
        self.bns = [nn.BatchNorm(momentum=0.9, epsilon=1e-5, name=f"bn{i + 1}", **kw)
                    for i in range(3)]
        self.fc1 = nn.Dense(512, name="fc1", **kw)
        self.fc2 = nn.Dense(self.num_classes, name="fc2", **kw)
        self.dropout = nn.Dropout(self.dropout_rate)

    def embed(self, x, train: bool = False):
        """512-d pre-classifier features (reference face_models.py:51-60)."""
        for conv, bn in zip(self.convs, self.bns):
            x = nn.relu(bn(conv(x), use_running_average=not train))
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> [B, 128]
        return nn.relu(self.fc1(x))

    def __call__(self, x, train: bool = False):
        e = self.embed(x, train)
        e = self.dropout(e, deterministic=not train)
        return self.fc2(e)
