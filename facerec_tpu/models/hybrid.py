"""HybridNet — CNN + Transformer classifier (reference face_models.py:618-721).

ResNet-18 trunk ([:-2] cut) -> 49 tokens of dim 512 + learned positional
encoding (init normal(0, 0.02)) -> one pre-LN transformer block (MHA 4 heads,
GELU FFN 2048, dropout 0.1) -> mean pool over tokens -> LayerNorm ->
dropout(0.1) -> Dense(num_classes).

TPU note: tokens are batch-major [B, 49, 512] (the reference uses torch's
seq-major [49, B, 512]); at seq=49 the attention is a pair of small matmuls
that XLA fuses — no SP/CP needed (SURVEY.md section 5.7).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from facerec_tpu.models.resnet import ResNet18


class TransformerBlock(nn.Module):
    embed_dim: int = 512
    num_heads: int = 4
    ff_dim: int = 2048
    dropout: float = 0.1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):  # x: [B, S, D]
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        y = nn.LayerNorm(name="norm1", **kw)(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dropout_rate=self.dropout,
            deterministic=not train, name="attention", **kw)(y, y)
        x = x + y
        y = nn.LayerNorm(name="norm2", **kw)(x)
        y = nn.Dense(self.ff_dim, name="ff1", **kw)(y)
        y = nn.gelu(y, approximate=False)  # torch nn.GELU default is exact erf
        y = nn.Dropout(self.dropout)(y, deterministic=not train)
        y = nn.Dense(self.embed_dim, name="ff2", **kw)(y)
        y = nn.Dropout(self.dropout)(y, deterministic=not train)
        return x + y


class HybridNet(nn.Module):
    num_classes: int = 18
    fdim: int = 512
    seq_len: int = 49
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.backbone = ResNet18(name="backbone", **kw)
        self.pos_encoding = self.param(
            "pos_encoding", nn.initializers.normal(0.02), (self.seq_len, self.fdim), self.param_dtype
        )
        self.transformer = TransformerBlock(self.fdim, name="transformer", **kw)
        self.norm = nn.LayerNorm(name="norm", **kw)
        self.dropout = nn.Dropout(self.dropout_rate)
        self.fc = nn.Dense(self.num_classes, name="fc", **kw)

    def embed(self, x, train: bool = False):
        f = self.backbone(x, train=train)  # [B, 7, 7, 512] at 224 input
        b = f.shape[0]
        tokens = f.reshape(b, -1, self.fdim)
        pos = self.pos_encoding
        if tokens.shape[1] != pos.shape[0]:  # non-224 inputs: resize pos table
            import jax
            pos = jax.image.resize(pos, (tokens.shape[1], self.fdim), method="linear")
        tokens = tokens + pos  # [B, S, 512]
        tokens = self.transformer(tokens, train=train)
        return self.norm(jnp.mean(tokens, axis=1))  # [B, 512]

    def __call__(self, x, train: bool = False):
        e = self.embed(x, train)
        return self.fc(self.dropout(e, deterministic=not train))
