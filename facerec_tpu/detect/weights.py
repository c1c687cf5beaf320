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
from collections.abc import Mapping
from pathlib import Path

import numpy as np

from facerec_tpu.config import (
    CALIBRATED_DETECTION_THRESHOLDS,
    CLASSIC_DETECTION_THRESHOLDS,
    OUTPUTS_DIR,
)

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


def flatten_tree(tree: Mapping, prefix: str = "") -> dict:
    """'/'-joined flat {path: np.ndarray} view of a nested param tree (the
    shared helper — models/convert.py reverse conversion uses it too)."""
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, Mapping):
            out.update(flatten_tree(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def save_detector_params(params: dict, directory: str | Path = DEFAULT_DIR,
                         source: str = "self-trained") -> Path:
    """Save MTCNN params as npz trees plus a ``source.txt`` provenance marker
    so converted-pretrained weights re-saved through this path keep their
    CLASSIC operating point (the npz extension alone would mislabel them
    self-trained — thresholds_for_source would then loosen them)."""
    d = Path(directory)
    d.mkdir(parents=True, exist_ok=True)
    for net in ("pnet", "rnet", "onet"):
        np.savez(d / f"{net}.npz", **flatten_tree(params[net]))
    (d / "source.txt").write_text(source)
    return d


def load_detector_params_with_source(
    directory: str | Path | None = None,
) -> tuple[dict, str]:
    """Load MTCNN params; returns (params, source) with source in
    {"self-trained", "pretrained"} — "pretrained" for on-the-fly-converted
    facenet-pytorch ``.pt`` state dicts, which must run at the CLASSIC
    thresholds they were tuned with, not our self-trained calibration."""
    candidates = []
    if directory is not None:
        candidates.append(Path(directory))
    if os.environ.get("FACEREC_MTCNN_WEIGHTS"):
        candidates.append(Path(os.environ["FACEREC_MTCNN_WEIGHTS"]))
    candidates.append(DEFAULT_DIR)
    for d in candidates:
        if all((d / f"{n}.npz").exists() for n in ("pnet", "rnet", "onet")):
            params = {n: _unflatten(dict(np.load(d / f"{n}.npz")))
                      for n in ("pnet", "rnet", "onet")}
            # provenance marker written by save_detector_params; extension
            # heuristic (npz == self-trained) is the fallback for older dirs
            marker = d / "source.txt"
            source = marker.read_text().strip() if marker.exists() else "self-trained"
            return params, source
        if all((d / f"{n}.pt").exists() for n in ("pnet", "rnet", "onet")):
            from facerec_tpu.models.convert import convert_mtcnn_net, load_torch_state_dict

            params = {n: convert_mtcnn_net(load_torch_state_dict(d / f"{n}.pt"), n)["params"]
                      for n in ("pnet", "rnet", "onet")}
            return params, "pretrained"
    raise FileNotFoundError(f"no MTCNN weights found in {[str(c) for c in candidates]}")


def load_detector_params(directory: str | Path | None = None) -> dict:
    return load_detector_params_with_source(directory)[0]


# Single source of truth lives in config.py (PreprocessingConfig shares it);
# re-exported here under the established names. See the calibration story in
# config.py and tests/test_real_photos.py.
CALIBRATED_THRESHOLDS = CALIBRATED_DETECTION_THRESHOLDS
CLASSIC_THRESHOLDS = CLASSIC_DETECTION_THRESHOLDS


def thresholds_for_source(source: str) -> tuple[float, float, float]:
    return CLASSIC_THRESHOLDS if source == "pretrained" else CALIBRATED_THRESHOLDS


def load_default_detector(image_hw: tuple[int, int], min_face_size: int = 20,
                          thresholds: tuple[float, float, float] | None = None,
                          max_faces: int = 16):
    """Build an MTCNN for ``image_hw`` with the best available weights.
    ``thresholds=None`` picks the operating point matching the resolved
    weight source (calibrated for self-trained, classic for pretrained)."""
    from facerec_tpu.detect.mtcnn import MTCNN

    params, source = load_detector_params_with_source()
    if thresholds is None:
        thresholds = thresholds_for_source(source)
    det = MTCNN(image_hw, min_face_size=min_face_size, thresholds=thresholds, max_faces=max_faces)
    return det, params
