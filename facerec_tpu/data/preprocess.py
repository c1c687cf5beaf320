"""Preprocessing pipeline: raw photos -> detected/aligned/cropped face crops
(reference src/data_prep.py:203-403 process_raw_data + preprocess_image).

TPU-first redesign: instead of the reference's per-image Python loop that
re-instantiates MTCNN for every image (data_prep.py:119 — a documented perf
defect), images are letterboxed to one working resolution on host, DETECTED
IN BATCHES by the jit-compiled cascade, aligned+cropped by the fused affine
op, and augmented in batch by the PRNG-keyed JAX augmentations. Faithful
behaviors: per-person 70/15/15 split (:309-328), margin bbox (:89-106),
low-data augmentation of 5 variants when a class has <20 train images
(:353-396), ``max_samples_per_class`` cap and ``test_mode`` 3-person/10-image
truncation (:284,317), no-face fallback to a plain resize.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import numpy as np

from facerec_tpu.config import PROC_DATA_DIR, RAW_DATA_DIR, PreprocessingConfig, logger

WORK_SIZE = 512  # letterbox resolution the detector runs at


def _letterbox(img: np.ndarray, size: int) -> tuple[np.ndarray, float]:
    """Resize keeping aspect to fit in (size, size), pad bottom/right."""
    from PIL import Image

    h, w = img.shape[:2]
    scale = size / max(h, w)
    nh, nw = max(int(round(h * scale)), 1), max(int(round(w * scale)), 1)
    im = Image.fromarray(img).resize((nw, nh), Image.BILINEAR)
    out = np.zeros((size, size, 3), np.uint8)
    out[:nh, :nw] = np.asarray(im)
    return out, scale


class BatchPreprocessor:
    """Batched detect->align->crop. Holds the jitted cascade + warp."""

    def __init__(self, config: PreprocessingConfig, detector=None, detector_params=None,
                 batch_size: int = 32):
        self.config = config
        self.batch_size = batch_size
        self.detector = detector
        self.detector_params = detector_params
        if config.use_mtcnn and detector is None:
            try:
                from facerec_tpu.detect.weights import load_default_detector

                self.detector, self.detector_params = load_default_detector(
                    (WORK_SIZE, WORK_SIZE), min_face_size=config.min_face_size,
                    thresholds=config.detection_thresholds)
            except Exception as e:  # no weights available -> resize-only fallback
                logger.warning("no detector weights available (%s); falling back to resize-only", e)
                self.detector = None

    def process_batch(self, images: list[np.ndarray]) -> list[np.ndarray]:
        """uint8 RGB images (any sizes) -> final_size aligned crops (uint8)."""
        import jax
        import jax.numpy as jnp

        from facerec_tpu.ops.image import align_and_crop_from, bbox_with_margin, resize_bilinear

        out_size = self.config.final_size[0]
        if self.detector is None:
            from PIL import Image

            return [np.asarray(Image.fromarray(im).resize((out_size, out_size), Image.BILINEAR))
                    for im in images]

        boxed = [_letterbox(im, WORK_SIZE) for im in images]
        batch = np.stack([b[0] for b in boxed]).astype(np.float32)
        pad = (-len(batch)) % self.batch_size
        if pad:
            batch = np.concatenate([batch, np.zeros((pad, *batch.shape[1:]), np.float32)])
        crops_all = []
        for s in range(0, len(batch), self.batch_size):
            chunk = jnp.asarray(batch[s : s + self.batch_size])
            det = self.detector.detect(self.detector_params, chunk)
            # take the top-probability face per image (reference
            # data_prep.py:131-136), with margin + eye alignment
            best = jnp.argmax(jnp.where(det.valid, det.probs, -1.0), axis=1)
            bsel = jnp.take_along_axis(det.boxes, best[:, None, None], axis=1)[:, 0]
            lsel = jnp.take_along_axis(det.landmarks, best[:, None, None, None], axis=1)[:, 0]
            vsel = jnp.take_along_axis(det.valid, best[:, None], axis=1)[:, 0]
            bsel = bbox_with_margin(bsel, self.config.face_margin, (WORK_SIZE, WORK_SIZE))
            crops = jax.vmap(lambda i, b, l: align_and_crop_from(i, b[None], l[None], out_size)[0])(
                chunk, bsel, lsel)
            fallback = resize_bilinear(chunk, (out_size, out_size))
            crops = jnp.where(vsel[:, None, None, None], crops, fallback)
            crops_all.append(np.asarray(jax.device_get(crops)))
        crops = np.concatenate(crops_all)[: len(images)]
        return [np.clip(c, 0, 255).astype(np.uint8) for c in crops]


def process_raw_data(
    raw_dir: str | Path | None = None,
    out_dir: str | Path | None = None,
    config: PreprocessingConfig = PreprocessingConfig(),
    max_samples_per_class: int | None = None,
    test_mode: bool = False,
    detector=None,
    detector_params=None,
    seed: int = 42,
) -> Path:
    """Process raw datasets into the ImageFolder train/val/test layout.

    Returns the base output directory (the reference documents the same
    return for its deleted tests, data_prep.py:402-403).
    """
    import jax

    from PIL import Image

    from facerec_tpu.ops.augment import AugmentParams, augment_batch, low_data_variants

    raw_dir = Path(raw_dir or RAW_DATA_DIR)
    out_base = Path(out_dir or (PROC_DATA_DIR / config.name))
    rng = np.random.default_rng(seed)
    pre = BatchPreprocessor(config, detector, detector_params)
    aug_params = AugmentParams(
        rotation_degrees=config.rotation_degrees, brightness=config.brightness,
        contrast=config.contrast, scale=config.scale, horizontal_flip=config.horizontal_flip)

    datasets = [d for d in sorted(raw_dir.iterdir()) if d.is_dir()] if raw_dir.exists() else []
    if not datasets:
        raise FileNotFoundError(f"no raw datasets under {raw_dir}")
    stats: dict[str, Any] = {"config": config.to_dict(), "datasets": {}}
    for ds in datasets:
        persons = [p for p in sorted(ds.iterdir()) if p.is_dir()]
        if test_mode:
            persons = persons[:3]
        ds_stats = {}
        for pi, person in enumerate(persons):
            imgs = sorted(q for q in person.iterdir() if q.suffix.lower() in
                          {".jpg", ".jpeg", ".png", ".bmp", ".webp"})
            if test_mode:
                imgs = imgs[:10]
            if max_samples_per_class:
                imgs = imgs[:max_samples_per_class]
            if not imgs:
                continue
            order = rng.permutation(len(imgs))
            n_train = max(int(0.7 * len(imgs)), 1)
            n_val = max(int(0.15 * len(imgs)), 1) if len(imgs) > 2 else 0
            splits = {"train": order[:n_train],
                      "val": order[n_train : n_train + n_val],
                      "test": order[n_train + n_val :]}
            loaded = []
            for q in imgs:
                with Image.open(q) as im:
                    loaded.append(np.asarray(im.convert("RGB"), np.uint8))
            crops = pre.process_batch(loaded)
            for split, idxs in splits.items():
                d = out_base / ds.name / split / person.name
                if len(idxs):
                    d.mkdir(parents=True, exist_ok=True)
                for j, i in enumerate(idxs):
                    Image.fromarray(crops[i]).save(d / f"{person.name}_{j:04d}.jpg", quality=95)
            # low-data augmentation (reference data_prep.py:353-396)
            train_idx = splits["train"]
            if config.augment and len(train_idx) < config.low_data_threshold:
                d = out_base / ds.name / "train" / person.name
                src = train_idx[: min(len(train_idx), 10)]
                for j, i in enumerate(src):
                    key = jax.random.key(seed * 100_000 + pi * 100 + j)
                    var = low_data_variants(key, np.asarray(crops[i], np.float32) / 255.0,
                                            config.low_data_variants, aug_params)
                    var = np.asarray(jax.device_get(var))
                    for v in range(var.shape[0]):
                        Image.fromarray((var[v] * 255).astype(np.uint8)).save(
                            d / f"{person.name}_aug{j:02d}_{v}.jpg", quality=95)
            ds_stats[person.name] = {"images": len(imgs), "train": len(splits["train"]),
                                     "val": len(splits["val"]), "test": len(splits["test"])}
        stats["datasets"][ds.name] = ds_stats
        logger.info("processed %s: %d persons", ds.name, len(ds_stats))
    out_base.mkdir(parents=True, exist_ok=True)
    (out_base / "preprocess_stats.json").write_text(json.dumps(stats, indent=2))
    config.save_json(out_base / "config.json")
    return out_base
