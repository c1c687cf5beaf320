"""PyTorch replicas of the reference architectures, state-dict-compatible
with the reference's key layout (reference face_models.py; facenet-pytorch
InceptionResnetV1 / torchvision resnet18 key names).

Purpose: end-to-end conversion-parity testing. No real reference ``.pth``
checkpoints exist in this environment (the reference's ``outputs/`` is
gitignored) and torchvision is absent, so these replicas stand in for the
torch side: they emit state dicts with exactly the key names the converters
in ``facerec_tpu/models/convert.py`` consume, and their eval forward passes
define the numbers the converted Flax models must reproduce (<1e-3 embedding
cosine error — BASELINE.md). Used by ``tests/test_convert.py`` and by
``tools/parity_check.py`` when the reference source cannot be imported.

Everything here is written from the architecture documentation in SURVEY.md
section 2.1 item 7 (layer sizes, orderings, cut points); it is NOT copied
reference code. Only eval-mode forward semantics matter.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# torchvision-style resnet18 trunk (keys: conv1, bn1, layer{1-4}.{0,1}.*)
# ---------------------------------------------------------------------------
class TorchBasicBlock(nn.Module):
    def __init__(self, cin: int, cout: int, stride: int = 1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride=stride, bias=False), nn.BatchNorm2d(cout))

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + idn)


class TorchResNet18(nn.Module):
    """Feature trunk: ``forward`` -> [B, 8w, H/32, W/32] (the "[:-2]" cut);
    ``pooled`` -> [B, 8w] (the "[:-1]" cut)."""

    def __init__(self, width: int = 64):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.maxpool = nn.MaxPool2d(3, 2, padding=1)
        chans = [width, width * 2, width * 4, width * 8]
        for li, c in enumerate(chans, start=1):
            cin = width if li == 1 else chans[li - 2]
            stride = 1 if li == 1 else 2
            setattr(self, f"layer{li}", nn.Sequential(
                TorchBasicBlock(cin, c, stride), TorchBasicBlock(c, c)))

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        for li in range(1, 5):
            x = getattr(self, f"layer{li}")(x)
        return x

    def pooled(self, x):
        return self.forward(x).mean(dim=(2, 3))


def randomize_bn_stats(model: nn.Module, seed: int = 0) -> None:
    """Non-trivial running stats so tests catch BN stat mapping errors."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, (nn.BatchNorm1d, nn.BatchNorm2d)):
            m.running_mean.uniform_(-0.4, 0.4, generator=g)
            m.running_var.uniform_(0.6, 1.4, generator=g)


# ---------------------------------------------------------------------------
# ArcFaceNet (keys: backbone.*, embedding, bn, arcface.weight)
# ---------------------------------------------------------------------------
class TorchArcFaceNet(nn.Module):
    def __init__(self, num_classes: int = 18, embedding_dim: int = 512, width: int = 64):
        super().__init__()
        self.backbone = TorchResNet18(width)
        self.embedding = nn.Linear(width * 8, embedding_dim, bias=False)
        self.bn = nn.BatchNorm1d(embedding_dim)

        class _Arc(nn.Module):
            def __init__(self):
                super().__init__()
                self.weight = nn.Parameter(torch.randn(num_classes, embedding_dim))

        self.arcface = _Arc()

    def forward(self, x):
        """Eval path: L2-normalized embeddings (dropout is identity in eval)."""
        e = self.bn(self.embedding(self.backbone.pooled(x)))
        return F.normalize(e, dim=-1)

    def eval_logits(self, x):
        """Cosine logits vs normalized class centers (the corrected eval)."""
        return F.linear(self.forward(x), F.normalize(self.arcface.weight, dim=-1))


# ---------------------------------------------------------------------------
# HybridNet (keys: cnn.*, pos_encoding, transformer.*, norm, fc)
# ---------------------------------------------------------------------------
class TorchTransformerBlock(nn.Module):
    def __init__(self, d: int = 512, heads: int = 4, ff: int = 2048):
        super().__init__()
        self.attention = nn.MultiheadAttention(d, heads, dropout=0.1)
        self.norm1 = nn.LayerNorm(d)
        self.norm2 = nn.LayerNorm(d)
        self.ff = nn.Sequential(nn.Linear(d, ff), nn.GELU(), nn.Dropout(0.1), nn.Linear(ff, d))

    def forward(self, x):  # x: [S, B, D] seq-major (torch MHA default)
        y = self.norm1(x)
        a, _ = self.attention(y, y, y, need_weights=False)
        x = x + a
        return x + self.ff(self.norm2(x))


class TorchHybridNet(nn.Module):
    def __init__(self, num_classes: int = 18, d: int = 512, seq: int = 49, width: int = 64):
        super().__init__()
        self.cnn = TorchResNet18(width)
        self.pos_encoding = nn.Parameter(torch.randn(seq, 1, d) * 0.02)
        self.transformer = TorchTransformerBlock(d)
        self.norm = nn.LayerNorm(d)
        self.fc = nn.Linear(d, num_classes)

    def embed(self, x):
        f = self.cnn(x)  # [B, D, H, W]
        tokens = f.flatten(2).permute(2, 0, 1)  # [S, B, D]
        tokens = tokens + self.pos_encoding[: tokens.shape[0]]
        tokens = self.transformer(tokens)
        return self.norm(tokens.mean(dim=0))

    def forward(self, x):
        return self.fc(self.embed(x))


# ---------------------------------------------------------------------------
# SiameseNet (keys: conv.{0,4,7,11,14,18} convs / +1 BNs; fc.{1,5,8} / {2,6})
# ---------------------------------------------------------------------------
class TorchSiameseNet(nn.Module):
    def __init__(self, embedding_dim: int = 256):
        super().__init__()
        self.conv = nn.Sequential(
            nn.Conv2d(3, 64, 7, stride=2, padding=3), nn.BatchNorm2d(64), nn.ReLU(), nn.MaxPool2d(2, 2),
            nn.Conv2d(64, 128, 3, padding=1), nn.BatchNorm2d(128), nn.ReLU(),
            nn.Conv2d(128, 128, 3, padding=1), nn.BatchNorm2d(128), nn.ReLU(), nn.MaxPool2d(2, 2),
            nn.Conv2d(128, 256, 3, padding=1), nn.BatchNorm2d(256), nn.ReLU(),
            nn.Conv2d(256, 256, 3, padding=1), nn.BatchNorm2d(256), nn.ReLU(), nn.MaxPool2d(2, 2),
            nn.Conv2d(256, 512, 3, padding=1), nn.BatchNorm2d(512), nn.ReLU(),
        )
        self.pool = nn.AdaptiveAvgPool2d((6, 6))
        self.fc = nn.Sequential(
            nn.Dropout(0.3), nn.Linear(512 * 6 * 6, 1024), nn.BatchNorm1d(1024), nn.ReLU(),
            nn.Dropout(0.2), nn.Linear(1024, 512), nn.BatchNorm1d(512), nn.ReLU(),
            nn.Linear(512, embedding_dim),
        )

    def embed(self, x):
        x = self.pool(self.conv(x)).flatten(1)
        return F.normalize(self.fc(x), dim=-1)

    def forward(self, xa, xb):
        return self.embed(xa), self.embed(xb)


# ---------------------------------------------------------------------------
# AttentionNet (keys: backbone.*, attention.{query,key,value,gamma,
# spatial_attention.conv}, fc)
# ---------------------------------------------------------------------------
class TorchAttentionNet(nn.Module):
    def __init__(self, num_classes: int = 18, width: int = 64, reduction: int = 8):
        super().__init__()
        self.backbone = TorchResNet18(width)
        c = width * 8
        red = c // reduction

        class _Attn(nn.Module):
            def __init__(self):
                super().__init__()
                self.query = nn.Conv2d(c, red, 1)
                self.key = nn.Conv2d(c, red, 1)
                self.value = nn.Conv2d(c, c, 1)
                self.gamma = nn.Parameter(torch.zeros(1))

                class _Spatial(nn.Module):
                    def __init__(self):
                        super().__init__()
                        self.conv = nn.Conv2d(2, 1, 7, padding=3)

                    def forward(self, x):
                        pooled = torch.cat([x.mean(dim=1, keepdim=True),
                                            x.max(dim=1, keepdim=True).values], dim=1)
                        return x * torch.sigmoid(self.conv(pooled))

                self.spatial_attention = _Spatial()

            def forward(self, x):
                b, cc, h, w = x.shape
                q = self.query(x).flatten(2).permute(0, 2, 1)  # [B, HW, red]
                k = self.key(x).flatten(2).permute(0, 2, 1)
                v = self.value(x).flatten(2).permute(0, 2, 1)  # [B, HW, C]
                attn = torch.softmax(q @ k.transpose(1, 2), dim=-1)  # [B, HW, HW]
                out = (attn @ v).permute(0, 2, 1).reshape(b, cc, h, w)
                return self.spatial_attention(self.gamma * out + x)

        self.attention = _Attn()
        self.fc = nn.Linear(c, num_classes)

    def embed(self, x):
        return self.attention(self.backbone(x)).mean(dim=(2, 3))

    def forward(self, x):
        return self.fc(self.embed(x))


# ---------------------------------------------------------------------------
# BaselineNet (keys: conv{1-3}, bn{1-3}, fc1, fc2 — reference
# face_models.py:16-60: 3x[conv-BN-ReLU-maxpool] + adaptive avgpool + FC512)
# ---------------------------------------------------------------------------
class TorchBaselineNet(nn.Module):
    def __init__(self, num_classes: int = 18):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 32, 3, padding=1)
        self.bn1 = nn.BatchNorm2d(32)
        self.conv2 = nn.Conv2d(32, 64, 3, padding=1)
        self.bn2 = nn.BatchNorm2d(64)
        self.conv3 = nn.Conv2d(64, 128, 3, padding=1)
        self.bn3 = nn.BatchNorm2d(128)
        self.fc1 = nn.Linear(128, 512)
        self.fc2 = nn.Linear(512, num_classes)

    def embed(self, x):
        for i in (1, 2, 3):
            x = F.max_pool2d(F.relu(getattr(self, f"bn{i}")(getattr(self, f"conv{i}")(x))), 2)
        return F.relu(self.fc1(x.mean(dim=(2, 3))))

    def forward(self, x):
        return self.fc2(self.embed(x))


# ---------------------------------------------------------------------------
# ResNetTransfer (keys: resnet.conv1..., resnet.fc.1 — reference
# face_models.py:62-102: torchvision resnet18 with fc -> Sequential(drop, fc))
# ---------------------------------------------------------------------------
class TorchResNetTransfer(nn.Module):
    def __init__(self, num_classes: int = 18, width: int = 64):
        super().__init__()
        self.resnet = TorchResNet18(width)
        # attach fc onto the trunk so the key is resnet.fc.1.* like the
        # reference's self.resnet.fc = Sequential(Dropout, Linear)
        self.resnet.fc = nn.Sequential(nn.Dropout(0.1), nn.Linear(width * 8, num_classes))

    def embed(self, x):
        return self.resnet.pooled(x)

    def forward(self, x):
        return self.resnet.fc(self.resnet.pooled(x))


# ---------------------------------------------------------------------------
# EnsembleModel (keys: models.{i}.<member keys>, weights — reference
# face_models.py:843-940; arcface members contribute cosine logits :889-893,
# siamese members are skipped :894-897)
# ---------------------------------------------------------------------------
class TorchEnsembleModel(nn.Module):
    def __init__(self, members: list, ensemble_method: str = "average"):
        super().__init__()
        self.models = nn.ModuleList(members)
        self.ensemble_method = ensemble_method
        self.weights = nn.Parameter(torch.ones(len(members)) / len(members))
        if ensemble_method == "attention":
            self.attention_net = nn.Sequential(
                nn.Linear(len(members), 64), nn.ReLU(), nn.Linear(64, len(members)),
                nn.Softmax(dim=0))

    def forward(self, x):
        outs = []
        for m in self.models:
            if isinstance(m, TorchArcFaceNet):
                outs.append(m.eval_logits(x))
            elif isinstance(m, TorchSiameseNet):
                continue
            else:
                outs.append(m(x))
        if len(outs) == 1:
            return outs[0]
        stacked = torch.stack(outs)
        if self.ensemble_method == "average":
            return stacked.mean(dim=0)
        if self.ensemble_method == "weighted":
            w = F.softmax(self.weights, dim=0)
            return (w[:, None, None] * stacked).sum(dim=0)
        if self.ensemble_method == "max":
            return torch.log(F.softmax(stacked, dim=-1).max(dim=0).values + 1e-12)
        raise ValueError(f"Unknown ensemble method: {self.ensemble_method}")

    def embed(self, x):
        return torch.cat([m.embed(x) for m in self.models], dim=1)


def make_default_ensemble(num_classes: int = 18,
                          ensemble_method: str = "average") -> TorchEnsembleModel:
    """The reference's default member set (face_models.py:806-808):
    cnn + attention + arcface."""
    return TorchEnsembleModel(
        [TorchResNetTransfer(num_classes), TorchAttentionNet(num_classes),
         TorchArcFaceNet(num_classes)], ensemble_method)


# ---------------------------------------------------------------------------
# InceptionResnetV1 (facenet-pytorch key layout; depth-configurable)
# ---------------------------------------------------------------------------
class TorchBasicConv2d(nn.Module):
    def __init__(self, cin, cout, kernel, stride=1, padding=0):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, kernel, stride=stride, padding=padding, bias=False)
        self.bn = nn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TorchBlock35(nn.Module):
    def __init__(self, scale=0.17):
        super().__init__()
        self.scale = scale
        self.branch0 = TorchBasicConv2d(256, 32, 1)
        self.branch1 = nn.Sequential(TorchBasicConv2d(256, 32, 1), TorchBasicConv2d(32, 32, 3, padding=1))
        self.branch2 = nn.Sequential(TorchBasicConv2d(256, 32, 1), TorchBasicConv2d(32, 32, 3, padding=1),
                                     TorchBasicConv2d(32, 32, 3, padding=1))
        self.conv2d = nn.Conv2d(96, 256, 1)

    def forward(self, x):
        out = torch.cat([self.branch0(x), self.branch1(x), self.branch2(x)], dim=1)
        return F.relu(x + self.scale * self.conv2d(out))


class TorchBlock17(nn.Module):
    def __init__(self, scale=0.10):
        super().__init__()
        self.scale = scale
        self.branch0 = TorchBasicConv2d(896, 128, 1)
        self.branch1 = nn.Sequential(
            TorchBasicConv2d(896, 128, 1),
            TorchBasicConv2d(128, 128, (1, 7), padding=(0, 3)),
            TorchBasicConv2d(128, 128, (7, 1), padding=(3, 0)),
        )
        self.conv2d = nn.Conv2d(256, 896, 1)

    def forward(self, x):
        out = torch.cat([self.branch0(x), self.branch1(x)], dim=1)
        return F.relu(x + self.scale * self.conv2d(out))


class TorchBlock8(nn.Module):
    def __init__(self, scale=0.20, no_relu=False):
        super().__init__()
        self.scale = scale
        self.no_relu = no_relu
        self.branch0 = TorchBasicConv2d(1792, 192, 1)
        self.branch1 = nn.Sequential(
            TorchBasicConv2d(1792, 192, 1),
            TorchBasicConv2d(192, 192, (1, 3), padding=(0, 1)),
            TorchBasicConv2d(192, 192, (3, 1), padding=(1, 0)),
        )
        self.conv2d = nn.Conv2d(384, 1792, 1)

    def forward(self, x):
        out = torch.cat([self.branch0(x), self.branch1(x)], dim=1)
        out = x + self.scale * self.conv2d(out)
        return out if self.no_relu else F.relu(out)


class TorchMixed6a(nn.Module):
    def __init__(self):
        super().__init__()
        self.branch0 = TorchBasicConv2d(256, 384, 3, stride=2)
        self.branch1 = nn.Sequential(TorchBasicConv2d(256, 192, 1), TorchBasicConv2d(192, 192, 3, padding=1),
                                     TorchBasicConv2d(192, 256, 3, stride=2))
        self.pool = nn.MaxPool2d(3, 2)

    def forward(self, x):
        return torch.cat([self.branch0(x), self.branch1(x), self.pool(x)], dim=1)


class TorchMixed7a(nn.Module):
    def __init__(self):
        super().__init__()
        self.branch0 = nn.Sequential(TorchBasicConv2d(896, 256, 1), TorchBasicConv2d(256, 384, 3, stride=2))
        self.branch1 = nn.Sequential(TorchBasicConv2d(896, 256, 1), TorchBasicConv2d(256, 256, 3, stride=2))
        self.branch2 = nn.Sequential(TorchBasicConv2d(896, 256, 1), TorchBasicConv2d(256, 256, 3, padding=1),
                                     TorchBasicConv2d(256, 256, 3, stride=2))
        self.pool = nn.MaxPool2d(3, 2)

    def forward(self, x):
        return torch.cat([self.branch0(x), self.branch1(x), self.branch2(x), self.pool(x)], dim=1)


class TorchInceptionResnetV1(nn.Module):
    def __init__(self, repeats: tuple[int, int, int] = (5, 10, 5)):
        super().__init__()
        self.conv2d_1a = TorchBasicConv2d(3, 32, 3, stride=2)
        self.conv2d_2a = TorchBasicConv2d(32, 32, 3)
        self.conv2d_2b = TorchBasicConv2d(32, 64, 3, padding=1)
        self.maxpool_3a = nn.MaxPool2d(3, 2)
        self.conv2d_3b = TorchBasicConv2d(64, 80, 1)
        self.conv2d_4a = TorchBasicConv2d(80, 192, 3)
        self.conv2d_4b = TorchBasicConv2d(192, 256, 3, stride=2)
        self.repeat_1 = nn.Sequential(*[TorchBlock35() for _ in range(repeats[0])])
        self.mixed_6a = TorchMixed6a()
        self.repeat_2 = nn.Sequential(*[TorchBlock17() for _ in range(repeats[1])])
        self.mixed_7a = TorchMixed7a()
        self.repeat_3 = nn.Sequential(*[TorchBlock8() for _ in range(repeats[2])])
        self.block8 = TorchBlock8(no_relu=True)
        self.last_linear = nn.Linear(1792, 512, bias=False)
        self.last_bn = nn.BatchNorm1d(512, eps=1e-3)

    def forward(self, x):
        x = self.conv2d_2b(self.conv2d_2a(self.conv2d_1a(x)))
        x = self.maxpool_3a(x)
        x = self.conv2d_4b(self.conv2d_4a(self.conv2d_3b(x)))
        x = self.repeat_1(x)
        x = self.mixed_6a(x)
        x = self.repeat_2(x)
        x = self.mixed_7a(x)
        x = self.repeat_3(x)
        x = self.block8(x)
        x = x.mean(dim=(2, 3))
        x = self.last_bn(self.last_linear(x))
        return F.normalize(x, dim=-1)


REPLICAS = {
    "arcface": TorchArcFaceNet,
    "hybrid": TorchHybridNet,
    "siamese": TorchSiameseNet,
    "attention": TorchAttentionNet,
    "baseline": TorchBaselineNet,
    "cnn": TorchResNetTransfer,
    "ensemble": make_default_ensemble,
}
