"""Deterministic synthetic face-like dataset generator.

The reference ships no test suite and its data path depends on Kaggle
downloads (reference download_dataset.py:198-296). For hermetic tests and
benchmarks we synthesize identity-consistent "faces": each identity is a
procedural template (skin tone, face ellipse, eye/mouth geometry) and each
sample is the template plus pose/lighting jitter. Images land in the same
ImageFolder layout the reference uses
(``<root>/<split>/<person>/<img>.jpg`` — reference data_prep.py:329-350).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _identity_params(rng: np.random.Generator) -> dict:
    return {
        "skin": rng.uniform(0.35, 0.85, size=3),
        "face_ax": rng.uniform(0.28, 0.38),
        "face_ay": rng.uniform(0.34, 0.45),
        "eye_dx": rng.uniform(0.10, 0.16),
        "eye_y": rng.uniform(-0.12, -0.05),
        "eye_r": rng.uniform(0.025, 0.05),
        "eye_col": rng.uniform(0.0, 0.45, size=3),
        "mouth_y": rng.uniform(0.12, 0.22),
        "mouth_w": rng.uniform(0.08, 0.18),
        "mouth_h": rng.uniform(0.015, 0.04),
        "hair_col": rng.uniform(0.0, 0.6, size=3),
        "hair_top": rng.uniform(-0.42, -0.3),
    }


def render_face(params: dict, size: int, jitter_rng: np.random.Generator | None = None) -> np.ndarray:
    """Render one uint8 HWC image for an identity with optional jitter."""
    shift = np.zeros(2)
    light = 1.0
    if jitter_rng is not None:
        shift = jitter_rng.uniform(-0.05, 0.05, size=2)
        light = jitter_rng.uniform(0.8, 1.2)
    ys, xs = np.mgrid[0:size, 0:size].astype(np.float32)
    # normalized coords in [-0.5, 0.5]
    u = xs / size - 0.5 - shift[0]
    v = ys / size - 0.5 - shift[1]

    img = np.full((size, size, 3), 0.12, np.float32)
    # hair block
    img[v < params["hair_top"]] = params["hair_col"]
    # face ellipse
    face = (u / params["face_ax"]) ** 2 + (v / params["face_ay"]) ** 2 <= 1.0
    img[face] = params["skin"]
    # eyes
    for sx in (-1.0, 1.0):
        eye = (u - sx * params["eye_dx"]) ** 2 + (v - params["eye_y"]) ** 2 <= params["eye_r"] ** 2
        img[eye] = params["eye_col"]
    # mouth
    mouth = ((u / params["mouth_w"]) ** 2 + ((v - params["mouth_y"]) / params["mouth_h"]) ** 2) <= 1.0
    img[mouth] = np.array([0.55, 0.2, 0.2], np.float32)
    img = np.clip(img * light, 0.0, 1.0)
    if jitter_rng is not None:
        img = np.clip(img + jitter_rng.normal(0, 0.02, img.shape).astype(np.float32), 0.0, 1.0)
    return (img * 255).astype(np.uint8)


def face_landmarks(params: dict, size: int, shift=(0.0, 0.0)) -> np.ndarray:
    """5-point landmarks (x, y) in pixel coords for a rendered face:
    left eye, right eye, nose (eye-mouth midpoint), mouth-left, mouth-right."""
    sx, sy = shift
    def pt(u, v):
        return [(u + 0.5 + sx) * size, (v + 0.5 + sy) * size]
    le = pt(-params["eye_dx"], params["eye_y"])
    re = pt(params["eye_dx"], params["eye_y"])
    ml = pt(-params["mouth_w"], params["mouth_y"])
    mr = pt(params["mouth_w"], params["mouth_y"])
    nose = [(le[0] + re[0] + ml[0] + mr[0]) / 4, (le[1] + re[1] + ml[1] + mr[1]) / 4]
    return np.asarray([le, re, nose, ml, mr], np.float32)


def face_bbox(params: dict, size: int, shift=(0.0, 0.0)) -> np.ndarray:
    """Tight face box (x1, y1, x2, y2) in pixel coords (hair top to chin)."""
    sx, sy = shift
    x1 = (0.5 + sx - params["face_ax"]) * size
    x2 = (0.5 + sx + params["face_ax"]) * size
    y1 = (0.5 + sy + params["hair_top"]) * size
    y2 = (0.5 + sy + params["face_ay"]) * size
    return np.asarray([x1, y1, x2, y2], np.float32)


def render_scene(
    rng: np.random.Generator,
    canvas: int = 128,
    face_size_range: tuple[int, int] = (32, 96),
    params: dict | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """A detection-training scene: one synthetic face pasted on a cluttered
    background. Returns (uint8 image [canvas,canvas,3], box [4], lmk [5,2])."""
    p = params or _identity_params(rng)
    fsize = int(rng.integers(face_size_range[0], face_size_range[1] + 1))
    # render un-shifted so the box/landmark ground truth is exact; apply
    # photometric jitter separately
    face = render_face(p, fsize, None)
    light = rng.uniform(0.8, 1.2)
    face = np.clip(face.astype(np.float32) * light + rng.normal(0, 4, face.shape), 0, 255).astype(np.uint8)
    # background: blurred noise + random rectangles (clutter)
    bg = rng.uniform(0, 0.6, (canvas // 8, canvas // 8, 3))
    bg = np.kron(bg, np.ones((8, 8, 1)))[:canvas, :canvas]
    for _ in range(rng.integers(0, 6)):
        x, y = rng.integers(0, canvas, 2)
        w, h = rng.integers(4, canvas // 3, 2)
        bg[y : y + h, x : x + w] = rng.uniform(0, 0.8, 3)
    img = (np.clip(bg, 0, 1) * 255).astype(np.uint8)
    ox = int(rng.integers(0, canvas - fsize + 1))
    oy = int(rng.integers(0, canvas - fsize + 1))
    img[oy : oy + fsize, ox : ox + fsize] = face
    off = np.asarray([ox, oy], np.float32)
    box = face_bbox(p, fsize) + np.concatenate([off, off])
    lmk = face_landmarks(p, fsize) + off
    return img, box, lmk


def make_synthetic_arrays(
    num_classes: int = 4, per_class: int = 8, size: int = 64, seed: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """In-memory dataset: (images [N,H,W,3] uint8, labels [N] int32)."""
    rng = np.random.default_rng(seed)
    ids = [_identity_params(rng) for _ in range(num_classes)]
    imgs, labels = [], []
    for c, p in enumerate(ids):
        for i in range(per_class):
            jr = np.random.default_rng(seed * 10_000 + c * 100 + i)
            imgs.append(render_face(p, size, jr))
            labels.append(c)
    return np.stack(imgs), np.asarray(labels, np.int32)


def write_synthetic_imagefolder(
    root: str | Path,
    num_classes: int = 4,
    per_class: int = 9,
    size: int = 64,
    seed: int = 0,
    splits: tuple[tuple[str, float], ...] = (("train", 0.7), ("val", 0.15), ("test", 0.15)),
) -> Path:
    """Write a synthetic dataset in the reference's processed-data layout
    (70/15/15 per-person split — reference data_prep.py:309-328)."""
    from PIL import Image

    root = Path(root)
    rng = np.random.default_rng(seed)
    ids = [_identity_params(rng) for _ in range(num_classes)]
    for c, p in enumerate(ids):
        person = f"person_{c:03d}"
        counts = [max(1, int(round(per_class * frac))) for _, frac in splits]
        counts[0] = per_class - sum(counts[1:])
        i = 0
        for (split, _), n in zip(splits, counts):
            d = root / split / person
            d.mkdir(parents=True, exist_ok=True)
            for _ in range(n):
                jr = np.random.default_rng(seed * 10_000 + c * 100 + i)
                Image.fromarray(render_face(p, size, jr)).save(d / f"{person}_{i:04d}.jpg", quality=92)
                i += 1
    return root
