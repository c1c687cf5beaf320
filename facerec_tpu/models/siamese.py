"""SiameseNet — twin metric-learning network (reference face_models.py:104-192).

Backbone: conv7x7/2(64)-BN-ReLU-maxpool; [conv3x3(128)]x2-maxpool;
[conv3x3(256)]x2-maxpool; conv3x3(512) -> adaptive avg pool to 6x6.
Head: dropout(0.3) -> Dense(1024)-BN-ReLU -> dropout(0.2) -> Dense(512)-BN-ReLU
-> Dense(256) -> L2 normalize. Twin forward shares parameters.

TPU note: the twin pass is computed as ONE batched forward over
``concat([xa, xb])`` so the MXU sees a 2B batch instead of two B-sized
launches.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from facerec_tpu.ops.arcface import l2_normalize


def _adaptive_avg_pool(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """NHWC adaptive average pool to a fixed output grid (torch
    AdaptiveAvgPool2d semantics: bin i spans [floor(i*H/O), ceil((i+1)*H/O)))."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    if h == oh and w == ow:
        return x
    if h % oh == 0 and w % ow == 0:
        return jnp.mean(x.reshape(b, oh, h // oh, ow, w // ow, c), axis=(2, 4))
    # General case: per-bin masked means, computed as two small matmuls.
    def _pool_mat(in_size, out_size):
        starts = (jnp.arange(out_size) * in_size) // out_size
        ends = -(-(jnp.arange(1, out_size + 1) * in_size) // out_size)
        idx = jnp.arange(in_size)
        m = ((idx[None, :] >= starts[:, None]) & (idx[None, :] < ends[:, None])).astype(x.dtype)
        return m / jnp.sum(m, axis=1, keepdims=True)
    mh = _pool_mat(h, oh)  # [oh, h]
    mw = _pool_mat(w, ow)  # [ow, w]
    x = jnp.einsum("oh,bhwc->bowc", mh, x)
    return jnp.einsum("pw,bowc->bopc", mw, x)


class SiameseNet(nn.Module):
    embedding_dim: int = 256
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.conv_specs = ((64, 7, 2), (128, 3, 1), (128, 3, 1), (256, 3, 1), (256, 3, 1), (512, 3, 1))
        self.convs = [
            nn.Conv(ch, (k, k), strides=s, padding=k // 2, name=f"conv{i}", **kw)
            for i, (ch, k, s) in enumerate(self.conv_specs)
        ]
        self.conv_bns = [nn.BatchNorm(momentum=0.9, epsilon=1e-5, name=f"conv_bn{i}", **kw) for i in range(6)]
        self.fc1 = nn.Dense(1024, name="fc1", **kw)
        self.fc_bn1 = nn.BatchNorm(momentum=0.9, epsilon=1e-5, name="fc_bn1", **kw)
        self.fc2 = nn.Dense(512, name="fc2", **kw)
        self.fc_bn2 = nn.BatchNorm(momentum=0.9, epsilon=1e-5, name="fc_bn2", **kw)
        self.fc3 = nn.Dense(self.embedding_dim, name="fc3", **kw)
        self.drop1 = nn.Dropout(0.3)
        self.drop2 = nn.Dropout(0.2)

    def embed(self, x, train: bool = False):
        # maxpool after blocks 0, 2, 4 (reference conv stack face_models.py:111-141)
        pool_after = {0, 2, 4}
        for i, (conv, bn) in enumerate(zip(self.convs, self.conv_bns)):
            x = nn.relu(bn(conv(x), use_running_average=not train))
            if i in pool_after:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = _adaptive_avg_pool(x, (6, 6))
        x = x.reshape(x.shape[0], -1)  # [B, 6*6*512]
        x = self.drop1(x, deterministic=not train)
        x = nn.relu(self.fc_bn1(self.fc1(x), use_running_average=not train))
        x = self.drop2(x, deterministic=not train)
        x = nn.relu(self.fc_bn2(self.fc2(x), use_running_average=not train))
        return l2_normalize(self.fc3(x))

    def __call__(self, xa, xb, train: bool = False):
        both = self.embed(jnp.concatenate([xa, xb], axis=0), train=train)
        return jnp.split(both, 2, axis=0)
