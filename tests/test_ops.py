"""Ops tests: affine warp vs scipy oracle, NMS vs naive numpy oracle, gallery
top-k Pallas kernel vs XLA oracle, augmentations, MTCNN cascade contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facerec_tpu.ops.augment import AugmentParams, augment_batch, low_data_variants
from facerec_tpu.ops.gallery import cosine_to_euclidean, gallery_topk_pallas, gallery_topk_xla
from facerec_tpu.ops.image import (
    affine_warp, align_and_crop, bbox_with_margin, crop_and_resize_from, invert_affine,
    rotation_matrix,
)
from facerec_tpu.ops.nms import nms, overlap_matrix


def test_affine_warp_identity():
    img = np.random.default_rng(0).uniform(size=(1, 16, 16, 3)).astype(np.float32)
    eye = jnp.asarray([[[1.0, 0, 0], [0, 1, 0]]])
    out = affine_warp(jnp.asarray(img), eye, (16, 16))
    np.testing.assert_allclose(np.asarray(out), img, atol=1e-6)


def test_affine_warp_vs_scipy_rotation():
    from scipy.ndimage import affine_transform

    rng = np.random.default_rng(1)
    img = rng.uniform(size=(32, 32, 1)).astype(np.float32)
    m = rotation_matrix(jnp.asarray([15.5, 15.5]), jnp.asarray(30.0))
    inv = invert_affine(m)  # out->in sampling map
    out = affine_warp(jnp.asarray(img[None]), inv[None], (32, 32))[0, ..., 0]
    # scipy affine_transform maps output->input with (row, col) matrix order
    mi = np.asarray(inv)
    mat = np.array([[mi[1, 1], mi[1, 0]], [mi[0, 1], mi[0, 0]]])
    off = np.array([mi[1, 2], mi[0, 2]])
    ref = affine_transform(img[..., 0], mat, offset=off, order=1, mode="constant")
    interior = (slice(9, 23), slice(9, 23))
    np.testing.assert_allclose(np.asarray(out)[interior], ref[interior], atol=2e-3)


def test_crop_and_resize_from():
    img = np.zeros((20, 20, 3), np.float32)
    img[5:15, 5:15] = 1.0
    boxes = jnp.asarray([[5.0, 5.0, 15.0, 15.0], [0.0, 0.0, 20.0, 20.0]])
    out = crop_and_resize_from(jnp.asarray(img), boxes, (8, 8))
    assert out.shape == (2, 8, 8, 3)
    assert float(out[0].mean()) > 0.9  # crop of the white square is all white
    assert 0.15 < float(out[1].mean()) < 0.45


def test_align_and_crop_levels_eyes():
    # a tilted "face": two bright eye dots; alignment should level them
    img = np.zeros((64, 64, 1), np.float32)
    img[20, 16] = 1.0  # left eye (x=16, y=20)
    img[28, 48] = 1.0  # right eye tilted down (x=48, y=28)
    lmk = np.zeros((1, 5, 2), np.float32)
    lmk[0, 0] = [16, 20]
    lmk[0, 1] = [48, 28]
    boxes = jnp.asarray([[8.0, 8.0, 56.0, 56.0]])
    out = align_and_crop(jnp.asarray(img[None]), boxes, jnp.asarray(lmk), 48)
    o = np.asarray(out[0, ..., 0])
    ys, xs = np.nonzero(o > 0.2)
    # the two eye blobs should now be at (approximately) the same row
    assert ys.max() - ys.min() <= 2


def test_bbox_with_margin():
    b = jnp.asarray([[10.0, 10.0, 20.0, 20.0]])
    out = np.asarray(bbox_with_margin(b, 0.4, (32, 32)))[0]
    np.testing.assert_allclose(out, [8, 8, 22, 22])
    out2 = np.asarray(bbox_with_margin(jnp.asarray([[0.0, 0.0, 31.0, 31.0]]), 1.0, (32, 32)))[0]
    assert out2[0] >= 0 and out2[3] <= 31


def _nms_oracle(boxes, scores, thresh, mode="union"):
    order = np.argsort(-scores)
    keep = []
    sup = np.zeros(len(boxes), bool)
    for i in order:
        if sup[i]:
            continue
        keep.append(i)
        for j in order:
            if j == i or sup[j]:
                continue
            x1 = max(boxes[i, 0], boxes[j, 0]); y1 = max(boxes[i, 1], boxes[j, 1])
            x2 = min(boxes[i, 2], boxes[j, 2]); y2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(x2 - x1, 0) * max(y2 - y1, 0)
            ai = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            aj = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            denom = min(ai, aj) if mode == "min" else ai + aj - inter
            if inter / max(denom, 1e-12) > thresh:
                sup[j] = True
    return sorted(keep, key=lambda i: -scores[i])


@pytest.mark.parametrize("mode", ["union", "min"])
def test_nms_vs_oracle(mode):
    rng = np.random.default_rng(3)
    n = 40
    centers = rng.uniform(10, 90, (n, 2))
    sizes = rng.uniform(5, 25, (n, 2))
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], 1).astype(np.float32)
    scores = rng.uniform(size=n).astype(np.float32)
    b, s, keep, idx = nms(jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool), 0.4, mode)
    got = np.asarray(idx)[np.asarray(keep)]
    expect = _nms_oracle(boxes, scores, 0.4, mode)
    np.testing.assert_array_equal(got, expect)


def test_nms_unroll_invariant():
    """The block-unrolled fixed point (cond checked every `unroll` rounds)
    must return bit-identical masks for any unroll — rounds past convergence
    are idempotent (ops/nms.py)."""
    rng = np.random.default_rng(11)
    n = 64
    centers = rng.uniform(10, 90, (n, 2))
    sizes = rng.uniform(5, 40, (n, 2))
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], 1).astype(np.float32)
    scores = rng.uniform(size=n).astype(np.float32)
    valid = rng.uniform(size=n) > 0.2
    ref = nms(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
              0.4, "union", 16, unroll=1)
    for u in (2, 4, 7):
        got = nms(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
                  0.4, "union", 16, unroll=u)
        for a, b in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_nms_respects_valid_mask():
    boxes = jnp.asarray([[0, 0, 10, 10], [100, 100, 110, 110]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8])
    valid = jnp.asarray([False, True])
    _, _, keep, idx = nms(boxes, scores, valid, 0.5)
    assert np.asarray(keep).sum() == 1
    assert int(np.asarray(idx)[0]) == 1


def test_gallery_topk_pallas_matches_xla():
    """Both merge variants (pair-reduced extraction — the serve default —
    and the flat r4 kernel) and both tile widths must match the XLA oracle
    exactly on indices. The pair variant's shadow-promotion path (two top-k
    members folded into one lane pair) is forced by planting near-duplicate
    rows at lane l and l + block_g/2."""
    rng = np.random.default_rng(0)
    q = rng.normal(size=(17, 256)).astype(np.float32)
    g = rng.normal(size=(1024, 256)).astype(np.float32)
    # force mutually-paired top hits for row 0: lanes 3 and 3+512 (pair
    # partners at block_g=1024) both near q[0]
    g[3] = q[0] + 0.01 * rng.normal(size=256)
    g[3 + 512] = q[0] + 0.01 * rng.normal(size=256)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    v0, i0 = gallery_topk_xla(jnp.asarray(q), jnp.asarray(g), 700, k=5)
    for merge in ("pair", "flat"):
        for bg in (512, 1024):
            v1, i1 = gallery_topk_pallas(jnp.asarray(q), jnp.asarray(g), 700,
                                         k=5, interpret=True, merge=merge,
                                         block_g=bg)
            np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), atol=1e-4)
            np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
            # indices never exceed the valid count
            assert int(np.asarray(i1).max()) < 700
    d = cosine_to_euclidean(v1)
    assert np.all(np.asarray(d) >= 0)


def test_gallery_topk_bf16_storage():
    """bf16-resident gallery (ServeConfig.gallery_dtype default): the Pallas
    sweep reads half the HBM bytes of f32. bf16 products are exact into the
    f32 accumulator, so the kernel must match the f32 XLA oracle run on the
    same bf16-rounded values, and the storage rounding must not change the
    top-1 identity decision vs a full-f32 sweep."""
    rng = np.random.default_rng(2)
    centers = rng.normal(size=(32, 256)).astype(np.float32)
    g = (np.repeat(centers, 32, axis=0)
         + 0.05 * rng.normal(size=(1024, 256)).astype(np.float32))
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    q = centers + 0.05 * rng.normal(size=centers.shape).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    gb = jnp.asarray(g, jnp.bfloat16)
    v0, _ = gallery_topk_xla(jnp.asarray(q), gb, 1000, k=5)
    v1, i1 = gallery_topk_pallas(jnp.asarray(q), gb, 1000, k=5, interpret=True)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), atol=2e-3)
    assert int(np.asarray(i1).max()) < 1000
    _, if32 = gallery_topk_xla(jnp.asarray(q), jnp.asarray(g), 1000, k=1)
    np.testing.assert_array_equal(
        np.asarray(i1)[:, 0] // 32, np.asarray(if32)[:, 0] // 32)


def test_augment_batch_shapes_and_determinism():
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(4, 32, 32, 3)).astype(np.float32)
    k = jax.random.key(7)
    a = augment_batch(k, jnp.asarray(x))
    b = augment_batch(k, jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = augment_batch(jax.random.key(8), jnp.asarray(x))
    assert not np.allclose(np.asarray(a), np.asarray(c))
    assert a.shape == x.shape
    assert float(jnp.min(a)) >= 0.0 and float(jnp.max(a)) <= 1.0
    v = low_data_variants(k, jnp.asarray(x[0]), 5)
    assert v.shape == (5, 32, 32, 3)


def test_mtcnn_cascade_contract():
    from facerec_tpu.detect.mtcnn import MTCNN

    det = MTCNN((96, 96), min_face_size=24, max_faces=4, k_pnet=16, k_rnet=8)
    params = det.init(jax.random.key(0))
    imgs = jnp.asarray(np.random.default_rng(0).uniform(0, 255, (2, 96, 96, 3)).astype(np.float32))
    out = det.detect(params, imgs)
    assert out.boxes.shape == (2, 4, 4)
    assert out.landmarks.shape == (2, 4, 5, 2)
    assert out.valid.dtype == jnp.bool_
    assert np.all(np.isfinite(np.asarray(out.boxes)))


def test_fast_warp_matches_exact():
    """Gather-free warp (ops/warp_fast.py) vs the exact gather warp: identical
    for unrotated faces (up to bf16 matmul noise), >=30dB PSNR with rotation."""
    from facerec_tpu.data.synthetic import _identity_params, render_face
    from facerec_tpu.ops.warp_fast import align_and_crop_fast, crop_resize_matmul

    rng = np.random.default_rng(0)
    frame = np.zeros((240, 320, 3), np.float32)
    face = render_face(_identity_params(rng), 120, None).astype(np.float32) / 255.0
    frame[60:180, 100:220] = face
    img = jnp.asarray(frame)
    boxes = jnp.asarray([[100.0, 60.0, 220.0, 180.0], [92.0, 52.0, 228.0, 188.0]])
    lmk = np.zeros((2, 5, 2), np.float32)
    lmk[:, 0] = [135, 105]
    lmk[:, 1] = [185, 105]
    lmk[:, 2] = [160, 130]
    lmk[:, 3] = [140, 150]
    lmk[:, 4] = [180, 150]

    from facerec_tpu.ops.image import align_and_crop_from, crop_and_resize_from

    exact = np.asarray(align_and_crop_from(img, boxes, jnp.asarray(lmk), 96))
    fast = np.asarray(align_and_crop_fast(img, boxes, jnp.asarray(lmk), 96))
    assert np.abs(exact - fast).mean() < 1e-3  # level eyes: near-exact

    lmk_t = lmk.copy()
    lmk_t[:, 1, 1] += 8.0  # tilted eyes
    exact = np.asarray(align_and_crop_from(img, boxes, jnp.asarray(lmk_t), 96))
    fast = np.asarray(align_and_crop_fast(img, boxes, jnp.asarray(lmk_t), 96))
    mse = float(((exact - fast) ** 2).mean())
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 30.0, f"psnr {psnr:.1f}"

    # matmul crop+resize vs gather crop+resize: bilinear-exact
    c1 = np.asarray(crop_resize_matmul(img, boxes, 48))
    c2 = np.asarray(crop_and_resize_from(img, boxes, (48, 48)))
    np.testing.assert_allclose(c1, c2, atol=2e-2)  # bf16 matmul tolerance


def test_fast_align_cosine_drift_envelope():
    """Map the fast-align operating envelope: embedding cosine(fast, precise)
    across face tilt angles. Inside the ±15° rotation clamp the drift must be
    negligible; beyond the clamp alignment is partial by design and only
    monotonic degradation is required (VERDICT round-1 weak 7)."""
    from facerec_tpu.data.synthetic import _identity_params, face_landmarks, render_face_photo
    from facerec_tpu.models import get_model
    from facerec_tpu.ops.image import align_and_crop_from
    from facerec_tpu.ops.warp_fast import align_and_crop_fast

    rng = np.random.default_rng(2)
    p = _identity_params(rng)
    model = get_model("baseline", num_classes=4)
    ex = jnp.zeros((1, 96, 96, 3), jnp.float32)
    v = model.init({"params": jax.random.key(5), "dropout": jax.random.key(6)}, ex, train=False)

    def embed(crops):
        e = np.asarray(model.apply(v, crops, method="embed"))
        return e / np.linalg.norm(e, axis=-1, keepdims=True)

    fsize = 120
    envelope = {}
    for ang in (0.0, 5.0, 10.0, 15.0, 20.0):
        face, alpha = render_face_photo(p, fsize, jitter_rng=np.random.default_rng(1), rot_deg=ang)
        frame = np.full((240, 320, 3), 0.2, np.float32)
        oy, ox = 60, 100
        region = frame[oy:oy + fsize, ox:ox + fsize]
        frame[oy:oy + fsize, ox:ox + fsize] = alpha[..., None] * face + (1 - alpha[..., None]) * region
        lmk = face_landmarks(p, fsize, rot_deg=ang) + np.asarray([ox, oy], np.float32)
        box = jnp.asarray([[ox, oy, ox + fsize, oy + fsize]], jnp.float32)
        img = jnp.asarray(frame)
        lmk_j = jnp.asarray(lmk[None])
        precise = np.asarray(align_and_crop_from(img, box, lmk_j, 96))
        fast = np.asarray(align_and_crop_fast(img, box, lmk_j, 96))
        cos = float(np.sum(embed(precise) * embed(fast), axis=-1)[0])
        envelope[ang] = cos
    # inside the clamp: tight agreement
    for ang in (0.0, 5.0, 10.0, 15.0):
        assert envelope[ang] > 0.98, f"cos drift at {ang} deg: {envelope}"
    # beyond the clamp: partial alignment, still recognizable features
    assert envelope[20.0] > 0.9, f"beyond-clamp cos: {envelope}"


def test_pallas_rotate_matches_xla_oracle():
    """The VMEM-resident pallas shear kernel (ops/pallas_warp.py) must
    reproduce the XLA shear chain (same 2-shear LDU two-level math, diagonal
    folded into the crop) to bf16 rounding — checked in interpreter mode on
    CPU."""
    from facerec_tpu.ops.pallas_warp import rotate_patches_pallas
    from facerec_tpu.ops.warp_fast import rotate_patches

    rng = np.random.default_rng(0)
    n, p, e = 4, 128, 96
    patches = jnp.asarray(rng.uniform(0, 255, (n, p, p, 3)).astype(np.float32))
    angles = jnp.asarray(np.array([0.0, 0.1, -0.2, 0.25], np.float32))
    centers = jnp.asarray(rng.uniform(p * 0.4, p * 0.6, (n, 2)).astype(np.float32))
    ref = np.asarray(rotate_patches(patches, angles, centers, e))
    out = np.asarray(rotate_patches_pallas(patches, angles, centers, e, interpret=True))
    assert out.shape == ref.shape
    # both paths accumulate in bf16; only last-ulp differences are allowed
    assert np.abs(ref - out).max() <= 1.0, np.abs(ref - out).max()
    assert np.abs(ref - out).mean() < 1e-3


def test_align_batched_matches_per_frame():
    """align_and_crop_fast_batched (flat rotation over B*F patches) must be
    numerically identical to the vmapped per-frame align on the XLA path."""
    from facerec_tpu.ops.warp_fast import (
        align_and_crop_fast,
        align_and_crop_fast_batched,
    )

    rng = np.random.default_rng(2)
    b, f, hw, e = 2, 3, (120, 160), 64
    frames = jnp.asarray(rng.uniform(0, 255, (b, *hw, 3)).astype(np.float32))
    boxes = np.zeros((b, f, 4), np.float32)
    lmk = np.zeros((b, f, 5, 2), np.float32)
    for i in range(b):
        for j in range(f):
            x1 = rng.uniform(0, 80); y1 = rng.uniform(0, 40); s = rng.uniform(40, 70)
            boxes[i, j] = [x1, y1, x1 + s, y1 + s]
            lmk[i, j] = [[x1 + s*.3, y1 + s*.42], [x1 + s*.7, y1 + s*.38],
                         [x1 + s*.5, y1 + s*.6], [x1 + s*.35, y1 + s*.8],
                         [x1 + s*.65, y1 + s*.8]]
    boxes_j, lmk_j = jnp.asarray(boxes), jnp.asarray(lmk)
    per_frame = np.stack([
        np.asarray(align_and_crop_fast(frames[i], boxes_j[i], lmk_j[i], e))
        for i in range(b)
    ])
    batched = np.asarray(align_and_crop_fast_batched(
        frames, boxes_j, lmk_j, e, use_pallas=False))
    np.testing.assert_allclose(batched, per_frame, rtol=0, atol=1e-5)
