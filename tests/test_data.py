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
