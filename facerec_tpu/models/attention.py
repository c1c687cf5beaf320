"""AttentionNet — ResNet-18 + self-attention + spatial attention
(reference face_models.py:194-295).

AttentionModule: 1x1-conv Q/K/V self-attention over the 7x7=49 spatial
positions with a learned residual scalar ``gamma`` (init 0), followed by
spatial attention (channel-avg + channel-max -> 7x7 conv -> sigmoid mask).
AttentionNet: ResNet-18 trunk ([:-2] cut, 7x7x512) -> AttentionModule -> GAP
-> Dense(num_classes).

TPU notes: the 49x49 energy matrix is tiny; everything here is pure
matmul/elementwise and fuses under jit — no custom kernel needed
(SURVEY.md section 2.3 item 6 analog).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from facerec_tpu.models.resnet import ResNet18


class SpatialAttention(nn.Module):
    kernel_size: int = 7
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # x: [B, H, W, C]
        avg_pool = jnp.mean(x, axis=-1, keepdims=True)
        max_pool = jnp.max(x, axis=-1, keepdims=True)
        pooled = jnp.concatenate([avg_pool, max_pool], axis=-1)
        attn = nn.Conv(1, (self.kernel_size, self.kernel_size), padding=self.kernel_size // 2,
                       dtype=self.dtype, param_dtype=self.param_dtype, name="conv")(pooled)
        return x * nn.sigmoid(attn)


class AttentionModule(nn.Module):
    in_channels: int = 512
    reduction_ratio: int = 8
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # x: [B, H, W, C]
        b, h, w, c = x.shape
        red = self.in_channels // self.reduction_ratio
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        q = nn.Conv(red, (1, 1), name="query", **kw)(x).reshape(b, h * w, red)
        k = nn.Conv(red, (1, 1), name="key", **kw)(x).reshape(b, h * w, red)
        v = nn.Conv(c, (1, 1), name="value", **kw)(x).reshape(b, h * w, c)
        energy = jnp.einsum("bqd,bkd->bqk", q, k)  # [B, HW, HW]
        attn = nn.softmax(energy, axis=-1)
        out = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(b, h, w, c)
        gamma = self.param("gamma", nn.initializers.zeros, (1,), self.param_dtype)
        out = gamma * out + x  # learned residual (face_models.py:250)
        return SpatialAttention(dtype=self.dtype, param_dtype=self.param_dtype,
                                name="spatial_attention")(out)


class AttentionNet(nn.Module):
    num_classes: int = 18
    dropout_rate: float = 0.25
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        self.backbone = ResNet18(dtype=self.dtype, param_dtype=self.param_dtype, name="backbone")
        self.attention = AttentionModule(512, dtype=self.dtype, param_dtype=self.param_dtype,
                                         name="attention")
        self.fc = nn.Dense(self.num_classes, dtype=self.dtype, param_dtype=self.param_dtype, name="fc")

    def embed(self, x, train: bool = False):
        x = self.backbone(x, train=train)  # [B, 7, 7, 512]
        x = self.attention(x)
        return jnp.mean(x, axis=(1, 2))  # [B, 512]

    def __call__(self, x, train: bool = False):
        return self.fc(self.embed(x, train))
