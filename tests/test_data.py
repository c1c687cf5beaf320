"""Data layer tests: synthetic generator, ImageFolder index, batchers,
Siamese pair semantics (label 1 = same, reference data_utils.py:120), device
prefetch onto the 8-device mesh."""

import numpy as np

from facerec_tpu.data.datasets import ClassificationBatcher, ImageFolderIndex, SiamesePairBatcher
from facerec_tpu.data.pipeline import InMemoryBatcher, prefetch_to_device
from facerec_tpu.data.synthetic import make_synthetic_arrays
from facerec_tpu.parallel.mesh import build_mesh


def test_synthetic_arrays_identity_consistency():
    imgs, labels = make_synthetic_arrays(num_classes=3, per_class=4, size=32, seed=1)
    assert imgs.shape == (12, 32, 32, 3) and imgs.dtype == np.uint8
    # same identity renders more similar than different identities
    f = imgs.reshape(12, -1).astype(np.float32)
    same = np.linalg.norm(f[0] - f[1])
    diff = np.linalg.norm(f[0] - f[5])
    assert same < diff


def test_synthetic_wide_skin_draw():
    """The embedder dataset builders default to the WIDE skin-luminance draw
    (0.25-1.0, matching detector training and bench frames): render_face must
    honor skin_lum, identities must span dark-to-light, and identity
    separability must survive the widening (README representation item)."""
    from facerec_tpu.data.synthetic import _identity_params, render_face

    rng = np.random.default_rng(3)
    ids = [_identity_params(rng, skin_lum_range=(0.25, 1.0)) for _ in range(32)]
    lums = np.asarray([p["skin_lum"] for p in ids])
    assert lums.min() < 0.40 and lums.max() > 0.85  # spans the wide range
    # rendered face-region brightness tracks the drawn luminance
    dark = next(p for p in ids if p["skin_lum"] < 0.35)
    light = next(p for p in ids if p["skin_lum"] > 0.85)
    f_dark = render_face(dark, 48).astype(np.float32).mean()
    f_light = render_face(light, 48).astype(np.float32).mean()
    assert f_light > f_dark + 15  # clearly brighter in uint8 units
    # wide-draw arrays keep same-identity < cross-identity distance —
    # averaged over ALL pairs and several seeds, not one lucky pair (ADVICE
    # r3: a single-pair pin previously masked the chance-accuracy failure
    # mode this exists to guard)
    for seed in (11, 12, 13):
        imgs, labels = make_synthetic_arrays(num_classes=3, per_class=4, size=32,
                                             seed=seed)
        f = imgs.reshape(len(imgs), -1).astype(np.float32)
        d = np.linalg.norm(f[:, None] - f[None, :], axis=-1)
        same = labels[:, None] == labels[None, :]
        off = ~np.eye(len(imgs), dtype=bool)
        intra = d[same & off].mean()
        inter = d[~same].mean()
        assert intra < inter, (seed, intra, inter)


def test_wide_draw_preserves_hue_at_light_end():
    """ADVICE r3: the uncapped luminance scale clipped >=1 channel on ~24% of
    wide-draw identities, compressing the chroma (hue) identity cue. With the
    capped scale, the rendered skin must stay exactly proportional to the
    drawn per-channel color (hue preserved) for EVERY identity, including the
    light end."""
    from facerec_tpu.data.synthetic import _identity_params, render_face

    rng = np.random.default_rng(5)
    ids = [_identity_params(rng, skin_lum_range=(0.25, 1.0)) for _ in range(64)]
    for p in ids:
        img = render_face(p, 64).astype(np.float32) / 255.0
        # sample the cheek (off the eye/mouth features): u=+-0.2*ax, v=0
        cy, cx = 32, 32 + int(0.6 * p["face_ax"] * 64)
        skin_px = img[cy, cx]
        skin = np.asarray(p["skin"], np.float32)
        # proportional to the draw: ratio identical across channels (+-1 uint8
        # quantization step)
        ratio = skin_px / np.maximum(skin, 1e-6)
        # (the capped scale may land the max channel at exactly 1.0 — that is
        # the lossless boundary, not clipping; proportionality is the guard)
        assert ratio.max() - ratio.min() < 0.04, (p["skin_lum"], skin, skin_px)


def test_imagefolder_index_and_batcher(synthetic_imagefolder):
    idx = ImageFolderIndex.build(synthetic_imagefolder / "train")
    assert idx.num_classes == 4
    b = ClassificationBatcher(idx, batch_size=8, image_size=32, seed=0)
    batches = list(b.epoch(0))
    assert all(bt["image"].shape == (8, 32, 32, 3) for bt in batches)
    total = sum(int(bt["mask"].sum()) for bt in batches)
    assert total == len(idx)
    # determinism: same epoch seed -> same order
    b2 = ClassificationBatcher(idx, batch_size=8, image_size=32, seed=0)
    np.testing.assert_array_equal(next(b.epoch(3))["label"], next(b2.epoch(3))["label"])


def test_siamese_pairs(synthetic_imagefolder):
    idx = ImageFolderIndex.build(synthetic_imagefolder / "train")
    b = SiamesePairBatcher(idx, batch_size=16, image_size=32, seed=0, pairs_per_epoch=64)
    labels_seen = []
    for bt in b.epoch(0):
        m = bt["mask"].astype(bool)
        same = bt["pair_label"][m] == 1
        # label 1 pairs must share identity; label 0 must differ
        np.testing.assert_array_equal(same, (bt["label_a"][m] == bt["label_b"][m]))
        labels_seen.extend(bt["pair_label"][m].tolist())
    assert 0.2 < np.mean(labels_seen) < 0.8  # roughly balanced


def test_fixed_pairs_deterministic(synthetic_imagefolder):
    idx = ImageFolderIndex.build(synthetic_imagefolder / "test")
    b1 = SiamesePairBatcher(idx, 8, 32, fixed_pairs=True, seed=3)
    b2 = SiamesePairBatcher(idx, 8, 32, fixed_pairs=True, seed=3)
    for x, y in zip(b1.epoch(0), b2.epoch(1)):  # epoch must not matter for fixed
        np.testing.assert_array_equal(x["pair_label"], y["pair_label"])
        np.testing.assert_allclose(x["image_a"], y["image_a"])


def test_prefetch_shards_batch():
    import jax

    mesh = build_mesh()
    imgs, labels = make_synthetic_arrays(num_classes=2, per_class=8, size=16, seed=0)
    b = InMemoryBatcher({"image": imgs.astype(np.float32), "label": labels}, batch_size=8)
    out = list(prefetch_to_device(b.epoch(0), mesh))
    assert len(out) == 2
    x = out[0]["image"]
    assert x.shape == (8, 16, 16, 3)
    # sharded over 8 devices on the data axis
    assert len(x.sharding.device_set) == jax.device_count()


def test_native_loader_decodes_like_pil(tmp_path):
    """The C++ libjpeg batcher (data/native/loader.cpp) must yield the same
    pixels as a PIL decode, same label order with shuffle off, and a proper
    tail-batch mask. Skipped when g++/libjpeg aren't available."""
    from PIL import Image

    from facerec_tpu.data.datasets import ImageFolderIndex
    from facerec_tpu.data.native_loader import NativeClassificationBatcher, available

    if not available():
        import pytest

        pytest.skip("native loader unavailable (no g++/libjpeg)")
    rng = np.random.default_rng(0)
    size = 32
    refs = []
    for c in range(2):
        d = tmp_path / f"cls{c}"
        d.mkdir()
        for i in range(3):
            arr = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
            p = d / f"{i}.jpg"
            Image.fromarray(arr).save(p, quality=95)
            # ground truth = decode of the SAVED jpeg (lossy), not the array
            refs.append((f"cls{c}", np.asarray(Image.open(p), np.float32) / 255.0))
    index = ImageFolderIndex.build(tmp_path)
    b = NativeClassificationBatcher(index, batch_size=4, image_size=size,
                                    shuffle=False, normalize=False)
    batches = list(b.epoch(0))
    assert len(batches) == 2
    assert batches[0]["mask"].tolist() == [1, 1, 1, 1]
    assert batches[1]["mask"].tolist() == [1, 1, 0, 0]
    imgs = np.concatenate([batches[0]["image"], batches[1]["image"]])[:6]
    labels = np.concatenate([batches[0]["label"], batches[1]["label"]])[:6]
    assert labels.tolist() == index.labels.tolist()
    for j, p in enumerate(index.paths):
        ref = np.asarray(Image.open(p), np.float32) / 255.0
        diff = np.abs(imgs[j] - ref).mean()
        assert diff < 2.0 / 255.0, f"decode mismatch on {p}: mean abs {diff:.4f}"


def test_native_loader_imagenet_normalization(tmp_path):
    """normalize=True (the train-engine path) applies ImageNet mean/std."""
    from PIL import Image

    from facerec_tpu.data.datasets import ImageFolderIndex
    from facerec_tpu.data.native_loader import NativeClassificationBatcher, available

    if not available():
        import pytest

        pytest.skip("native loader unavailable")
    rng = np.random.default_rng(1)
    d = tmp_path / "cls0"
    d.mkdir()
    p = d / "0.jpg"
    Image.fromarray(rng.integers(0, 255, (24, 24, 3), dtype=np.uint8)).save(p, quality=95)
    index = ImageFolderIndex.build(tmp_path)
    b = NativeClassificationBatcher(index, batch_size=1, image_size=24,
                                    shuffle=False, normalize=True)
    img = next(iter(b.epoch(0)))["image"][0]
    ref = np.asarray(Image.open(p), np.float32) / 255.0
    expect = (ref - np.asarray([0.485, 0.456, 0.406], np.float32)) / np.asarray(
        [0.229, 0.224, 0.225], np.float32)
    assert np.abs(img - expect).mean() < 0.02
