"""InceptionResnetV1 (FaceNet) in Flax — the live demo's embedding network
(reference app.py:274-286 loads facenet-pytorch InceptionResnetV1
pretrained on VGGFace2; embeddings at app.py:32-48).

Architecture per Szegedy et al. Inception-ResNet and the public
facenet-pytorch implementation: stem -> 5x Block35 -> Mixed_6a -> 10x Block17
-> Mixed_7a -> 5x Block8 -> Block8(no ReLU) -> GAP -> Linear(512, no bias)
-> BatchNorm. Module names mirror facenet-pytorch so its ``.pt`` state dicts
convert mechanically (:func:`convert_inception_resnet_v1`).

Input: 160x160 RGB, fixed standardization (x - 127.5) / 128.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from facerec_tpu.ops.arcface import l2_normalize


class BasicConv2d(nn.Module):
    features: int
    kernel: tuple[int, int]
    strides: int = 1
    padding: Any = 0
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    # serve-time BN-folded form (models/fold.py, eps=1e-3): BN becomes a
    # bias-add, its affine pre-multiplied into the conv kernel. Eval-only.
    folded: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, self.kernel, strides=self.strides, padding=self.padding,
                    use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype, name="conv")(x)
        if self.folded:
            if train:
                raise ValueError("folded models are eval-only (BN stats are baked in)")
            from facerec_tpu.models.fold import FoldedBias

            x = FoldedBias(self.features, dtype=self.dtype, param_dtype=self.param_dtype,
                           name="bn")(x)
        else:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-3,
                             dtype=self.dtype, param_dtype=self.param_dtype, name="bn")(x)
        return nn.relu(x)


class Block35(nn.Module):
    scale: float = 0.17
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    folded: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        bkw = dict(folded=self.folded, **kw)
        b0 = BasicConv2d(32, (1, 1), name="branch0", **bkw)(x, train)
        b1 = BasicConv2d(32, (1, 1), name="branch1_0", **bkw)(x, train)
        b1 = BasicConv2d(32, (3, 3), padding=1, name="branch1_1", **bkw)(b1, train)
        b2 = BasicConv2d(32, (1, 1), name="branch2_0", **bkw)(x, train)
        b2 = BasicConv2d(32, (3, 3), padding=1, name="branch2_1", **bkw)(b2, train)
        b2 = BasicConv2d(32, (3, 3), padding=1, name="branch2_2", **bkw)(b2, train)
        out = jnp.concatenate([b0, b1, b2], axis=-1)
        out = nn.Conv(256, (1, 1), name="conv2d", **kw)(out)
        return nn.relu(x + self.scale * out)


class Block17(nn.Module):
    scale: float = 0.10
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    folded: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        bkw = dict(folded=self.folded, **kw)
        b0 = BasicConv2d(128, (1, 1), name="branch0", **bkw)(x, train)
        b1 = BasicConv2d(128, (1, 1), name="branch1_0", **bkw)(x, train)
        b1 = BasicConv2d(128, (1, 7), padding=((0, 0), (3, 3)), name="branch1_1", **bkw)(b1, train)
        b1 = BasicConv2d(128, (7, 1), padding=((3, 3), (0, 0)), name="branch1_2", **bkw)(b1, train)
        out = jnp.concatenate([b0, b1], axis=-1)
        out = nn.Conv(896, (1, 1), name="conv2d", **kw)(out)
        return nn.relu(x + self.scale * out)


class Block8(nn.Module):
    scale: float = 0.20
    no_relu: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    folded: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        bkw = dict(folded=self.folded, **kw)
        b0 = BasicConv2d(192, (1, 1), name="branch0", **bkw)(x, train)
        b1 = BasicConv2d(192, (1, 1), name="branch1_0", **bkw)(x, train)
        b1 = BasicConv2d(192, (1, 3), padding=((0, 0), (1, 1)), name="branch1_1", **bkw)(b1, train)
        b1 = BasicConv2d(192, (3, 1), padding=((1, 1), (0, 0)), name="branch1_2", **bkw)(b1, train)
        out = jnp.concatenate([b0, b1], axis=-1)
        out = nn.Conv(1792, (1, 1), name="conv2d", **kw)(out)
        out = x + self.scale * out
        return out if self.no_relu else nn.relu(out)


class Mixed6a(nn.Module):
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    folded: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        bkw = dict(folded=self.folded, **kw)
        b0 = BasicConv2d(384, (3, 3), strides=2, name="branch0", **bkw)(x, train)
        b1 = BasicConv2d(192, (1, 1), name="branch1_0", **bkw)(x, train)
        b1 = BasicConv2d(192, (3, 3), padding=1, name="branch1_1", **bkw)(b1, train)
        b1 = BasicConv2d(256, (3, 3), strides=2, name="branch1_2", **bkw)(b1, train)
        b2 = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b0, b1, b2], axis=-1)


class Mixed7a(nn.Module):
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    folded: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        bkw = dict(folded=self.folded, **kw)
        b0 = BasicConv2d(256, (1, 1), name="branch0_0", **bkw)(x, train)
        b0 = BasicConv2d(384, (3, 3), strides=2, name="branch0_1", **bkw)(b0, train)
        b1 = BasicConv2d(256, (1, 1), name="branch1_0", **bkw)(x, train)
        b1 = BasicConv2d(256, (3, 3), strides=2, name="branch1_1", **bkw)(b1, train)
        b2 = BasicConv2d(256, (1, 1), name="branch2_0", **bkw)(x, train)
        b2 = BasicConv2d(256, (3, 3), padding=1, name="branch2_1", **bkw)(b2, train)
        b2 = BasicConv2d(256, (3, 3), strides=2, name="branch2_2", **bkw)(b2, train)
        b3 = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionResnetV1(nn.Module):
    """512-d face embedder. ``__call__`` returns L2-normalized embeddings;
    ``logits`` adds the classification head when num_classes > 0."""

    num_classes: int = 0
    dropout_rate: float = 0.6
    repeats: tuple[int, int, int] = (5, 10, 5)  # reduce for fast parity tests
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    # serve-time BN-folded form: apply with fold_batchnorm(vars, eps=1e-3)
    # output (facenet-pytorch BNs use eps=1e-3, unlike the resnet zoo's 1e-5)
    folded: bool = False

    def setup(self):
        base = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        kw = dict(folded=self.folded, **base)
        self.conv2d_1a = BasicConv2d(32, (3, 3), strides=2, name="conv2d_1a", **kw)
        self.conv2d_2a = BasicConv2d(32, (3, 3), name="conv2d_2a", **kw)
        self.conv2d_2b = BasicConv2d(64, (3, 3), padding=1, name="conv2d_2b", **kw)
        self.conv2d_3b = BasicConv2d(80, (1, 1), name="conv2d_3b", **kw)
        self.conv2d_4a = BasicConv2d(192, (3, 3), name="conv2d_4a", **kw)
        self.conv2d_4b = BasicConv2d(256, (3, 3), strides=2, name="conv2d_4b", **kw)
        self.repeat_1 = [Block35(name=f"repeat_1_{i}", **kw) for i in range(self.repeats[0])]
        self.mixed_6a = Mixed6a(name="mixed_6a", **kw)
        self.repeat_2 = [Block17(name=f"repeat_2_{i}", **kw) for i in range(self.repeats[1])]
        self.mixed_7a = Mixed7a(name="mixed_7a", **kw)
        self.repeat_3 = [Block8(name=f"repeat_3_{i}", **kw) for i in range(self.repeats[2])]
        self.block8 = Block8(no_relu=True, name="block8", **kw)
        self.dropout = nn.Dropout(self.dropout_rate)
        self.last_linear = nn.Dense(512, use_bias=False, name="last_linear", **base)
        if self.folded:
            from facerec_tpu.models.fold import FoldedBias

            self.last_bn = FoldedBias(512, name="last_bn", **base)
        else:
            self.last_bn = nn.BatchNorm(momentum=0.9, epsilon=1e-3, name="last_bn", **base)
        if self.num_classes > 0:
            self.classify = nn.Dense(self.num_classes, name="logits", **base)

    def features(self, x, train: bool = False):
        x = self.conv2d_1a(x, train)
        x = self.conv2d_2a(x, train)
        x = self.conv2d_2b(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = self.conv2d_3b(x, train)
        x = self.conv2d_4a(x, train)
        x = self.conv2d_4b(x, train)
        for blk in self.repeat_1:
            x = blk(x, train)
        x = self.mixed_6a(x, train)
        for blk in self.repeat_2:
            x = blk(x, train)
        x = self.mixed_7a(x, train)
        for blk in self.repeat_3:
            x = blk(x, train)
        x = self.block8(x, train)
        x = jnp.mean(x, axis=(1, 2))  # adaptive avg pool
        x = self.dropout(x, deterministic=not train)
        x = self.last_linear(x)
        if self.folded:
            return self.last_bn(x)
        return self.last_bn(x, use_running_average=not train)

    def embed(self, x, train: bool = False):
        return l2_normalize(self.features(x, train).astype(jnp.float32))

    def __call__(self, x, train: bool = False):
        return self.embed(x, train)

    def logits(self, x, train: bool = False):
        return self.classify(self.features(x, train))


def fixed_standardize(x: jnp.ndarray) -> jnp.ndarray:
    """facenet-pytorch fixed_image_standardization (reference app.py:40)."""
    return (x.astype(jnp.float32) - 127.5) / 128.0


def convert_inception_resnet_v1(sd, repeats: tuple[int, int, int] = (5, 10, 5)) -> dict:
    """facenet-pytorch InceptionResnetV1 state dict -> flax trees."""
    from facerec_tpu.models.convert import _TreeBuilder

    b = _TreeBuilder(sd)

    def basic(tkey: str, fpath: str):
        b.conv(f"{tkey}.conv", f"{fpath}/conv", bias=False)
        b.bn(f"{tkey}.bn", f"{fpath}/bn")

    for name in ("conv2d_1a", "conv2d_2a", "conv2d_2b", "conv2d_3b", "conv2d_4a", "conv2d_4b"):
        basic(name, name)

    def block(tprefix: str, fprefix: str, branches: dict[str, str], has_conv2d: bool = True):
        for t, f in branches.items():
            basic(f"{tprefix}.{t}", f"{fprefix}/{f}")
        if has_conv2d:
            b.conv(f"{tprefix}.conv2d", f"{fprefix}/conv2d")

    b35 = {"branch0": "branch0", "branch1.0": "branch1_0", "branch1.1": "branch1_1",
           "branch2.0": "branch2_0", "branch2.1": "branch2_1", "branch2.2": "branch2_2"}
    for i in range(repeats[0]):
        block(f"repeat_1.{i}", f"repeat_1_{i}", b35)
    block("mixed_6a", "mixed_6a",
          {"branch0": "branch0", "branch1.0": "branch1_0", "branch1.1": "branch1_1",
           "branch1.2": "branch1_2"}, has_conv2d=False)
    b17 = {"branch0": "branch0", "branch1.0": "branch1_0", "branch1.1": "branch1_1",
           "branch1.2": "branch1_2"}
    for i in range(repeats[1]):
        block(f"repeat_2.{i}", f"repeat_2_{i}", b17)
    block("mixed_7a", "mixed_7a",
          {"branch0.0": "branch0_0", "branch0.1": "branch0_1", "branch1.0": "branch1_0",
           "branch1.1": "branch1_1", "branch2.0": "branch2_0", "branch2.1": "branch2_1",
           "branch2.2": "branch2_2"}, has_conv2d=False)
    for i in range(repeats[2]):
        block(f"repeat_3.{i}", f"repeat_3_{i}", b17)
    block("block8", "block8", b17)
    b.linear("last_linear", "last_linear")
    b.bn("last_bn", "last_bn")
    if "logits.weight" in sd:
        b.linear("logits", "logits")
    return b.done()
