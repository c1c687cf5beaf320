"""PyTorch -> Flax checkpoint conversion (SURVEY.md section 7 hard-part #2;
BASELINE.json requires loading the reference's .pth checkpoints with <1e-3
embedding cosine error).

Handles every reference architecture's state dict (reference face_models.py)
plus torchvision resnet18 and facenet-pytorch's MTCNN nets. Conventions:
  * Conv: torch OIHW -> flax HWIO transpose.
  * Linear: torch [out, in] -> flax kernel [in, out].
  * BatchNorm: weight/bias -> params scale/bias; running stats -> batch_stats.
  * Flatten seams (conv HWC-vs-CHW ordering before a Dense layer) are
    corrected by permuting the Dense kernel's input rows (``_chw_to_hwc_rows``)
    so converted networks reproduce torch outputs exactly in NHWC.

Only numpy is required here; torch is needed just to unpickle .pth files
(torch CPU is available in the image).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Mapping, Sequence

import numpy as np


def load_torch_state_dict(path: str | Path) -> dict[str, np.ndarray]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]
    return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v) for k, v in obj.items()}


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def _linear(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _chw_to_hwc_rows(w_t: np.ndarray, c: int, h: int, w: int) -> np.ndarray:
    """Permute a transposed Dense kernel's input rows from torch's flattened
    CHW order to our flattened HWC order. w_t: [c*h*w, out]."""
    idx = np.arange(c * h * w).reshape(c, h, w).transpose(1, 2, 0).reshape(-1)
    return w_t[idx]


class _TreeBuilder:
    def __init__(self, sd: Mapping[str, np.ndarray]):
        self.sd = sd
        self.params: dict[str, Any] = {}
        self.stats: dict[str, Any] = {}

    def _set(self, tree: dict, path: str, value: np.ndarray) -> None:
        keys = path.split("/")
        d = tree
        for k in keys[:-1]:
            d = d.setdefault(k, {})
        d[keys[-1]] = np.asarray(value)

    def conv(self, tkey: str, fpath: str, bias: bool = True) -> None:
        self._set(self.params, f"{fpath}/kernel", _conv(self.sd[f"{tkey}.weight"]))
        if bias and f"{tkey}.bias" in self.sd:
            self._set(self.params, f"{fpath}/bias", self.sd[f"{tkey}.bias"])

    def linear(self, tkey: str, fpath: str, chw: tuple[int, int, int] | None = None) -> None:
        w = _linear(self.sd[f"{tkey}.weight"])
        if chw is not None:
            w = _chw_to_hwc_rows(w, *chw)
        self._set(self.params, f"{fpath}/kernel", w)
        if f"{tkey}.bias" in self.sd:
            self._set(self.params, f"{fpath}/bias", self.sd[f"{tkey}.bias"])

    def bn(self, tkey: str, fpath: str) -> None:
        self._set(self.params, f"{fpath}/scale", self.sd[f"{tkey}.weight"])
        self._set(self.params, f"{fpath}/bias", self.sd[f"{tkey}.bias"])
        self._set(self.stats, f"{fpath}/mean", self.sd[f"{tkey}.running_mean"])
        self._set(self.stats, f"{fpath}/var", self.sd[f"{tkey}.running_var"])

    def raw(self, tkey: str, fpath: str, transform=None) -> None:
        v = self.sd[tkey]
        self._set(self.params, fpath, transform(v) if transform else v)

    def done(self) -> dict[str, Any]:
        return {"params": self.params, "batch_stats": self.stats}


def convert_resnet18(sd: Mapping[str, np.ndarray], prefix: str = "", out_prefix: str = "") -> _TreeBuilder:
    """torchvision resnet18 trunk -> models/resnet.py naming."""
    b = _TreeBuilder(sd)
    p, o = prefix, out_prefix
    b.conv(f"{p}conv1", f"{o}conv1", bias=False)
    b.bn(f"{p}bn1", f"{o}bn1")
    for li in range(1, 5):
        for bi in range(2):
            t = f"{p}layer{li}.{bi}"
            f = f"{o}layer{li}_{bi}"
            b.conv(f"{t}.conv1", f"{f}/conv1", bias=False)
            b.bn(f"{t}.bn1", f"{f}/bn1")
            b.conv(f"{t}.conv2", f"{f}/conv2", bias=False)
            b.bn(f"{t}.bn2", f"{f}/bn2")
            if f"{t}.downsample.0.weight" in sd:
                b.conv(f"{t}.downsample.0", f"{f}/downsample_conv", bias=False)
                b.bn(f"{t}.downsample.1", f"{f}/downsample_bn")
    return b


def convert_baseline(sd: Mapping[str, np.ndarray]) -> dict:
    """Reference BaselineNet (face_models.py:16-60)."""
    b = _TreeBuilder(sd)
    for i in range(1, 4):
        b.conv(f"conv{i}", f"conv{i}")
        b.bn(f"bn{i}", f"bn{i}")
    b.linear("fc1", "fc1")  # after global-avg-pool: flat order is channel-only
    b.linear("fc2", "fc2")
    return b.done()


def convert_resnet_transfer(sd: Mapping[str, np.ndarray]) -> dict:
    """Reference ResNetTransfer (face_models.py:62-102): resnet.* trunk +
    Sequential(dropout, linear) head at resnet.fc.1."""
    b = convert_resnet18(sd, prefix="resnet.", out_prefix="backbone/")
    b.linear("resnet.fc.1", "fc")
    return b.done()


def convert_attention(sd: Mapping[str, np.ndarray]) -> dict:
    """Reference AttentionNet (face_models.py:260-295)."""
    b = convert_resnet18(sd, prefix="backbone.", out_prefix="backbone/")
    b.conv("attention.query", "attention/query")
    b.conv("attention.key", "attention/key")
    b.conv("attention.value", "attention/value")
    b.raw("attention.gamma", "attention/gamma")
    b.conv("attention.spatial_attention.conv", "attention/spatial_attention/conv")
    b.linear("fc", "fc")
    return b.done()


def convert_arcface(sd: Mapping[str, np.ndarray]) -> dict:
    """Reference ArcFaceNet (face_models.py:447-613). val_classifier is the
    documented random-init defect and is dropped."""
    b = convert_resnet18(sd, prefix="backbone.", out_prefix="backbone/")
    b.linear("embedding", "embedding")
    b.bn("bn", "bn")
    b.raw("arcface.weight", "arc_weight")  # [C, D] kept as-is
    return b.done()


def convert_hybrid(sd: Mapping[str, np.ndarray], num_heads: int = 4) -> dict:
    """Reference HybridNet (face_models.py:650-721): resnet trunk, learned
    pos-encoding [S, 1, D] -> [S, D], one pre-LN transformer block with torch
    nn.MultiheadAttention (packed in_proj)."""
    b = convert_resnet18(sd, prefix="cnn.", out_prefix="backbone/")
    b.raw("pos_encoding", "pos_encoding", lambda v: v[:, 0, :])
    d = sd["transformer.attention.in_proj_weight"].shape[1]
    hd = d // num_heads
    in_w = sd["transformer.attention.in_proj_weight"]  # [3D, D]
    in_b = sd["transformer.attention.in_proj_bias"]
    for i, name in enumerate(("query", "key", "value")):
        w = in_w[i * d : (i + 1) * d]  # [D, D], torch y = x @ w.T
        b._set(b.params, f"transformer/attention/{name}/kernel", w.T.reshape(d, num_heads, hd))
        b._set(b.params, f"transformer/attention/{name}/bias", in_b[i * d : (i + 1) * d].reshape(num_heads, hd))
    out_w = sd["transformer.attention.out_proj.weight"]  # [D, D]
    b._set(b.params, "transformer/attention/out/kernel", out_w.T.reshape(num_heads, hd, d))
    b._set(b.params, "transformer/attention/out/bias", sd["transformer.attention.out_proj.bias"])
    for t, f in (("transformer.norm1", "transformer/norm1"), ("transformer.norm2", "transformer/norm2"),
                 ("norm", "norm")):
        b._set(b.params, f"{f}/scale", sd[f"{t}.weight"])
        b._set(b.params, f"{f}/bias", sd[f"{t}.bias"])
    b.linear("transformer.ff.0", "transformer/ff1")
    b.linear("transformer.ff.3", "transformer/ff2")
    b.linear("fc", "fc")
    return b.done()


def convert_siamese(sd: Mapping[str, np.ndarray]) -> dict:
    """Reference SiameseNet (face_models.py:104-192): Sequential indices
    conv.{0,4,7,11,14,18} convs, +1 BNs; fc.{1,5,8} linears, fc.{2,6} BNs.
    The first Dense sits after a 6x6x512 CHW flatten -> row permutation."""
    b = _TreeBuilder(sd)
    conv_idx = [0, 4, 7, 11, 14, 18]
    for i, ci in enumerate(conv_idx):
        b.conv(f"conv.{ci}", f"conv{i}")
        b.bn(f"conv.{ci + 1}", f"conv_bn{i}")
    b.linear("fc.1", "fc1", chw=(512, 6, 6))
    b.bn("fc.2", "fc_bn1")
    b.linear("fc.5", "fc2")
    b.bn("fc.6", "fc_bn2")
    b.linear("fc.8", "fc3")
    return b.done()


def convert_mtcnn_net(sd: Mapping[str, np.ndarray], which: str) -> dict:
    """facenet-pytorch pnet/rnet/onet state dicts -> detect/mtcnn.py naming."""
    b = _TreeBuilder(sd)
    convs = {"pnet": ["conv1", "conv2", "conv3", "conv4_1", "conv4_2"],
             "rnet": ["conv1", "conv2", "conv3"],
             "onet": ["conv1", "conv2", "conv3", "conv4"]}[which]
    for c in convs:
        b.conv(c, c)
    prelus = {"pnet": 3, "rnet": 4, "onet": 5}[which]
    for i in range(1, prelus + 1):
        b.raw(f"prelu{i}.weight", f"prelu{i}/alpha")
    if which == "rnet":
        b.linear("dense4", "dense4", chw=(64, 3, 3))
        b.linear("dense5_1", "dense5_1")
        b.linear("dense5_2", "dense5_2")
    elif which == "onet":
        b.linear("dense5", "dense5", chw=(128, 2, 2))
        for h in ("dense6_1", "dense6_2", "dense6_3"):
            b.linear(h, h)
    return b.done()


CONVERTERS = {
    "baseline": convert_baseline,
    "cnn": convert_resnet_transfer,
    "attention": convert_attention,
    "arcface": convert_arcface,
    "hybrid": convert_hybrid,
    "siamese": convert_siamese,
}


def convert_checkpoint(path: str | Path, model_type: str) -> dict:
    """Load a reference .pth and return flax {params, batch_stats} trees."""
    sd = load_torch_state_dict(path)
    if model_type not in CONVERTERS:
        raise ValueError(f"no converter for {model_type}")
    return CONVERTERS[model_type](sd)


# ---------------------------------------------------------------------------
# Reverse direction: Flax {params, batch_stats} -> reference-layout torch
# state dict. Exact inverse of the forward converters (tested by tree->sd->
# tree round trips in tests/test_convert.py); enables running OUR trained
# checkpoints through the reference's eval semantics for the end-to-end
# ROC-AUC parity measurement (BASELINE.md; reference testing.py:258-312).
# ---------------------------------------------------------------------------


# shared '/'-joined tree flattener (one implementation, detect/weights.py)
from facerec_tpu.detect.weights import flatten_tree as _flatten_tree  # noqa: E402


def _hwc_to_chw_rows(w: np.ndarray, c: int, h: int, w_: int) -> np.ndarray:
    """Inverse of _chw_to_hwc_rows: w rows are in flattened HWC order;
    return them in torch's flattened CHW order."""
    idx = np.arange(c * h * w_).reshape(c, h, w_).transpose(1, 2, 0).reshape(-1)
    return w[np.argsort(idx)]


class _SDBuilder:
    """Mirror of _TreeBuilder for the reverse direction."""

    def __init__(self, tree: Mapping[str, Any]):
        self.p = _flatten_tree(tree.get("params", tree))
        self.s = _flatten_tree(tree.get("batch_stats") or {})
        self.sd: dict[str, np.ndarray] = {}

    def conv(self, tkey: str, fpath: str, bias: bool = True) -> None:
        self.sd[f"{tkey}.weight"] = np.transpose(self.p[f"{fpath}/kernel"], (3, 2, 0, 1))
        if bias and f"{fpath}/bias" in self.p:
            self.sd[f"{tkey}.bias"] = self.p[f"{fpath}/bias"]

    def linear(self, tkey: str, fpath: str, chw: tuple[int, int, int] | None = None) -> None:
        w = self.p[f"{fpath}/kernel"]  # [in, out], rows in HWC order
        if chw is not None:
            w = _hwc_to_chw_rows(w, *chw)
        self.sd[f"{tkey}.weight"] = np.ascontiguousarray(w.T)
        if f"{fpath}/bias" in self.p:
            self.sd[f"{tkey}.bias"] = self.p[f"{fpath}/bias"]

    def bn(self, tkey: str, fpath: str) -> None:
        self.sd[f"{tkey}.weight"] = self.p[f"{fpath}/scale"]
        self.sd[f"{tkey}.bias"] = self.p[f"{fpath}/bias"]
        self.sd[f"{tkey}.running_mean"] = self.s[f"{fpath}/mean"]
        self.sd[f"{tkey}.running_var"] = self.s[f"{fpath}/var"]
        self.sd[f"{tkey}.num_batches_tracked"] = np.asarray(1, np.int64)

    def raw(self, tkey: str, fpath: str, transform=None) -> None:
        v = self.p[fpath]
        self.sd[tkey] = transform(v) if transform else v


def _reverse_resnet18(b: _SDBuilder, prefix: str = "", out_prefix: str = "") -> None:
    p, o = prefix, out_prefix
    b.conv(f"{p}conv1", f"{o}conv1", bias=False)
    b.bn(f"{p}bn1", f"{o}bn1")
    for li in range(1, 5):
        for bi in range(2):
            t = f"{p}layer{li}.{bi}"
            f = f"{o}layer{li}_{bi}"
            b.conv(f"{t}.conv1", f"{f}/conv1", bias=False)
            b.bn(f"{t}.bn1", f"{f}/bn1")
            b.conv(f"{t}.conv2", f"{f}/conv2", bias=False)
            b.bn(f"{t}.bn2", f"{f}/bn2")
            if f"{f}/downsample_conv/kernel" in b.p:
                b.conv(f"{t}.downsample.0", f"{f}/downsample_conv", bias=False)
                b.bn(f"{t}.downsample.1", f"{f}/downsample_bn")


def reverse_baseline(tree: Mapping[str, Any]) -> dict[str, np.ndarray]:
    b = _SDBuilder(tree)
    for i in range(1, 4):
        b.conv(f"conv{i}", f"conv{i}")
        b.bn(f"bn{i}", f"bn{i}")
    b.linear("fc1", "fc1")
    b.linear("fc2", "fc2")
    return b.sd


def reverse_resnet_transfer(tree: Mapping[str, Any]) -> dict[str, np.ndarray]:
    b = _SDBuilder(tree)
    _reverse_resnet18(b, prefix="resnet.", out_prefix="backbone/")
    b.linear("resnet.fc.1", "fc")
    return b.sd


def reverse_attention(tree: Mapping[str, Any]) -> dict[str, np.ndarray]:
    b = _SDBuilder(tree)
    _reverse_resnet18(b, prefix="backbone.", out_prefix="backbone/")
    b.conv("attention.query", "attention/query")
    b.conv("attention.key", "attention/key")
    b.conv("attention.value", "attention/value")
    b.raw("attention.gamma", "attention/gamma")
    b.conv("attention.spatial_attention.conv", "attention/spatial_attention/conv")
    b.linear("fc", "fc")
    return b.sd


def reverse_arcface(tree: Mapping[str, Any]) -> dict[str, np.ndarray]:
    b = _SDBuilder(tree)
    _reverse_resnet18(b, prefix="backbone.", out_prefix="backbone/")
    b.linear("embedding", "embedding")
    b.bn("bn", "bn")
    b.raw("arcface.weight", "arc_weight")
    return b.sd


def reverse_hybrid(tree: Mapping[str, Any], num_heads: int = 4) -> dict[str, np.ndarray]:
    b = _SDBuilder(tree)
    _reverse_resnet18(b, prefix="cnn.", out_prefix="backbone/")
    b.raw("pos_encoding", "pos_encoding", lambda v: v[:, None, :])
    qkv_w, qkv_b = [], []
    for name in ("query", "key", "value"):
        k = b.p[f"transformer/attention/{name}/kernel"]  # [D, H, hd]
        d = k.shape[0]
        qkv_w.append(np.ascontiguousarray(k.reshape(d, d).T))  # torch w: y = x @ w.T
        qkv_b.append(b.p[f"transformer/attention/{name}/bias"].reshape(d))
    b.sd["transformer.attention.in_proj_weight"] = np.concatenate(qkv_w, axis=0)
    b.sd["transformer.attention.in_proj_bias"] = np.concatenate(qkv_b, axis=0)
    out_k = b.p["transformer/attention/out/kernel"]  # [H, hd, D]
    d = out_k.shape[-1]
    b.sd["transformer.attention.out_proj.weight"] = np.ascontiguousarray(out_k.reshape(d, d).T)
    b.sd["transformer.attention.out_proj.bias"] = b.p["transformer/attention/out/bias"]
    for t, f in (("transformer.norm1", "transformer/norm1"), ("transformer.norm2", "transformer/norm2"),
                 ("norm", "norm")):
        b.sd[f"{t}.weight"] = b.p[f"{f}/scale"]
        b.sd[f"{t}.bias"] = b.p[f"{f}/bias"]
    b.linear("transformer.ff.0", "transformer/ff1")
    b.linear("transformer.ff.3", "transformer/ff2")
    b.linear("fc", "fc")
    return b.sd


def reverse_siamese(tree: Mapping[str, Any]) -> dict[str, np.ndarray]:
    b = _SDBuilder(tree)
    conv_idx = [0, 4, 7, 11, 14, 18]
    for i, ci in enumerate(conv_idx):
        b.conv(f"conv.{ci}", f"conv{i}")
        b.bn(f"conv.{ci + 1}", f"conv_bn{i}")
    b.linear("fc.1", "fc1", chw=(512, 6, 6))
    b.bn("fc.2", "fc_bn1")
    b.linear("fc.5", "fc2")
    b.bn("fc.6", "fc_bn2")
    b.linear("fc.8", "fc3")
    return b.sd


def reverse_ensemble(tree: Mapping[str, Any],
                     member_types: Sequence[str] | None = None) -> dict[str, np.ndarray]:
    """Flax EnsembleModel tree -> reference EnsembleModel state dict
    (keys ``models.{i}.<member keys>`` + ``weights`` — reference
    face_models.py:862-878). The reference registers ``weights`` for every
    method; our 'average' ensembles carry none, so uniform weights are
    emitted (they are unused by 'average' in both frameworks)."""
    from facerec_tpu.models import DEFAULT_ENSEMBLE_MEMBERS

    member_types = list(member_types or DEFAULT_ENSEMBLE_MEMBERS)
    params = tree.get("params", tree)
    stats = tree.get("batch_stats") or {}
    sd: dict[str, np.ndarray] = {}
    for i, mt in enumerate(member_types):
        sub = {"params": params[f"members_{i}"],
               "batch_stats": stats.get(f"members_{i}") or {}}
        for k, v in REVERSE_CONVERTERS[mt](sub).items():
            sd[f"models.{i}.{k}"] = v
    n = len(member_types)
    sd["weights"] = np.asarray(params.get(
        "weights", np.full((n,), 1.0 / n, np.float32)))
    if "attn1" in params:  # 'attention' combiner -> attention_net.{0,2}
        for t, f in (("attention_net.0", "attn1"), ("attention_net.2", "attn2")):
            sd[f"{t}.weight"] = np.ascontiguousarray(np.asarray(params[f]["kernel"]).T)
            sd[f"{t}.bias"] = np.asarray(params[f]["bias"])
    return sd


REVERSE_CONVERTERS = {
    "baseline": reverse_baseline,
    "cnn": reverse_resnet_transfer,
    "attention": reverse_attention,
    "arcface": reverse_arcface,
    "hybrid": reverse_hybrid,
    "siamese": reverse_siamese,
}
REVERSE_CONVERTERS["ensemble"] = reverse_ensemble


def flax_to_torch_state_dict(tree: Mapping[str, Any], model_type: str) -> dict[str, np.ndarray]:
    """Convert a Flax {params, batch_stats} tree into a reference-key-layout
    torch state dict (numpy values; wrap with torch.from_numpy to load)."""
    if model_type not in REVERSE_CONVERTERS:
        raise ValueError(f"no reverse converter for {model_type}")
    return REVERSE_CONVERTERS[model_type](tree)
