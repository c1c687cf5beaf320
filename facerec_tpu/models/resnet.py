"""ResNet-18 backbone in Flax (NHWC, TPU-native).

First-party replacement for the torchvision ``resnet18`` the reference uses as
the trunk of four of its seven architectures (reference face_models.py:67,
274, 462, 663). Layout is NHWC (XLA's preferred TPU conv layout); parameters
are importable from a torchvision ``.pth`` via
:mod:`facerec_tpu.models.convert` (OIHW->HWIO transpose + BN stat mapping).

Stage map (224x224 input):
  stem conv7x7/2 + maxpool/2 -> 56x56x64
  layer1 (2 blocks, 64)      -> 56x56x64
  layer2 (2 blocks, 128, /2) -> 28x28x128
  layer3 (2 blocks, 256, /2) -> 14x14x256
  layer4 (2 blocks, 512, /2) -> 7x7x512     ("features[:-2]" cut point)
  global avg pool            -> 512          ("features[:-1]" cut point)
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


def _make_norm(folded: bool, train: bool, features: int, dtype, param_dtype, name: str):
    """Eval BatchNorm, or its serve-time folded form (models/fold.py): a
    single bias-add under the same module name (BN affine pre-multiplied into
    the producer conv's kernel)."""
    if folded:
        if train:
            raise ValueError("folded models are eval-only (BN stats are baked in)")
        from facerec_tpu.models.fold import FoldedBias

        return FoldedBias(features, dtype=dtype, param_dtype=param_dtype, name=name)
    return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                        dtype=dtype, param_dtype=param_dtype, name=name)


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    folded: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: _make_norm(self.folded, train, self.features,
                                       self.dtype, self.param_dtype, name)
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=self.strides, padding=1, use_bias=False,
                    dtype=self.dtype, param_dtype=self.param_dtype, name="conv1")(x)
        y = norm("bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=1, padding=1, use_bias=False,
                    dtype=self.dtype, param_dtype=self.param_dtype, name="conv2")(y)
        y = norm("bn2")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1), strides=self.strides, use_bias=False,
                               dtype=self.dtype, param_dtype=self.param_dtype, name="downsample_conv")(residual)
            residual = norm("downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet18(nn.Module):
    """ResNet-18 feature extractor. ``__call__`` returns the 7x7x512 feature
    map (the "[:-2]" cut used by AttentionNet/HybridNet); ``pooled`` returns
    the 512-d GAP vector (the "[:-1]" cut used by ResNetTransfer/ArcFaceNet)."""

    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    width: int = 64
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    folded: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, upto: int | None = None):
        """``upto`` (profiling hook, tools/profile_embedder.py): return after
        macro-unit k — 0 = stem, 1..4 = after layer1..layer4. Later layers
        are never instantiated; flax ignores their unread variable entries."""
        y = nn.Conv(self.width, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=self.dtype, param_dtype=self.param_dtype, name="conv1")(x)
        y = _make_norm(self.folded, train, self.width, self.dtype, self.param_dtype, "bn1")(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        if upto == 0:
            return y
        for i, n_blocks in enumerate(self.stage_sizes):
            feats = self.width * (2**i)
            for b in range(n_blocks):
                strides = 2 if (i > 0 and b == 0) else 1
                y = BasicBlock(feats, strides=strides, dtype=self.dtype,
                               param_dtype=self.param_dtype, folded=self.folded,
                               name=f"layer{i + 1}_{b}")(y, train=train)
            if upto == i + 1:
                return y
        return y  # [B, 7, 7, 512] at 224 input

    def pooled(self, x, train: bool = False):
        y = self(x, train=train)
        return jnp.mean(y, axis=(1, 2))  # [B, 512]
