"""MTCNN end-to-end quality: train tiny nets on synthetic scenes in-test and
require real detections (the full-size training run reaches IoU ~0.92;
this smoke-scale version must clear a lower bar)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from facerec_tpu.data.synthetic import face_bbox, face_landmarks, render_scene
from facerec_tpu.detect.mtcnn import MTCNN, ONet, PNet, RNet
from facerec_tpu.detect.train import _iou, make_training_samples, train_net


def test_scene_ground_truth():
    rng = np.random.default_rng(0)
    img, box, lmk = render_scene(rng, canvas=96)
    assert img.shape == (96, 96, 3)
    assert box[2] > box[0] and box[3] > box[1]
    # landmarks inside the box
    assert np.all(lmk[:, 0] >= box[0] - 2) and np.all(lmk[:, 0] <= box[2] + 2)
    # eyes above mouth
    assert lmk[0, 1] < lmk[3, 1] and lmk[1, 1] < lmk[4, 1]


def test_sample_mining_labels():
    d = make_training_samples(40, 12, seed=1)
    pos = d["cls_label"] == 1
    assert pos.any() and (~pos).any()
    # positives carry regression targets
    assert np.all(d["reg_mask"][pos & (d["cls_mask"] == 1)] == 1)
    # regression offsets are small fractions of the crop
    assert np.abs(d["reg_target"][d["reg_mask"] == 1]).max() < 1.0
    d2 = make_training_samples(10, 48, seed=2, with_landmarks=True)
    assert "lmk_target" in d2 and d2["lmk_mask"].sum() > 0


@pytest.mark.slow
def test_detector_trains_and_detects():
    pnet = train_net(PNet(), 12, 150, 120, seed=0)
    rnet = train_net(RNet(), 24, 150, 120, seed=1)
    onet = train_net(ONet(), 48, 150, 120, seed=2, with_landmarks=True)
    params = {"pnet": pnet, "rnet": rnet, "onet": onet}
    det = MTCNN((96, 96), min_face_size=24, thresholds=(0.6, 0.7, 0.7), max_faces=4,
                k_pnet=32, k_rnet=16)
    rng = np.random.default_rng(77)
    scenes, boxes = [], []
    for _ in range(16):
        img, box, _ = render_scene(rng, canvas=96, face_size_range=(32, 72))
        scenes.append(img)
        boxes.append(box)
    out = det.detect(params, jnp.asarray(np.stack(scenes), jnp.float32))
    found, ious = 0, []
    for i in range(16):
        v = np.asarray(out.valid[i])
        if not v.any():
            continue
        found += 1
        bi = int(np.argmax(np.asarray(out.probs[i]) * v))
        ious.append(_iou(np.asarray(out.boxes[i, bi]), boxes[i]))
    assert found >= 10, f"only detected {found}/16"
    assert np.mean(ious) > 0.4, f"mean IoU {np.mean(ious):.3f}"


def test_degenerate_nms_quotas_trace():
    """Partitions smaller than their NMS quota must pad, not fail at trace
    time (ADVICE r2: k_pnet < k_rnet with few pyramid levels). The coarse
    stratified quota must clamp to the per-level slot count k_keep
    (k_pnet=1, k_rnet=64 once crashed the static k_rnet concat)."""
    for kwargs in ({"k_pnet": 4, "k_rnet": 32, "max_faces": 8},
                   {"k_pnet": 4, "k_rnet": 8, "max_faces": 16}):
        det = MTCNN((64, 64), min_face_size=40, thresholds=(0.3, 0.3, 0.3), **kwargs)
        params = det.init(jax.random.key(0))
        out = det.detect(params, jnp.zeros((2, 64, 64, 3)))
        assert out.boxes.shape == (2, kwargs["max_faces"], 4)
        assert out.valid.shape == (2, kwargs["max_faces"])
    # coarse stratified-quota branch (0 < n_coarse < n_scales) with a quota
    # larger than the per-level slot count k_keep=min(k_pnet,k_rnet)=1: the
    # quota must clamp to k_keep or the static k_rnet concat breaks at trace
    # time. eval_shape is enough — the failure was a trace-time reshape.
    det = MTCNN((480, 640), min_face_size=40, k_pnet=1, k_rnet=64)
    params = det.init(jax.random.key(0))
    out = jax.eval_shape(det.detect, params, jnp.zeros((1, 480, 640, 3)))
    assert out.boxes.shape == (1, det.max_faces, 4)


def test_weight_provenance_marker(tmp_path):
    """save_detector_params records the weight source; loading honors it over
    the npz-extension heuristic (ADVICE r2: converted pretrained weights
    re-saved as npz must keep the CLASSIC operating point)."""
    from facerec_tpu.detect.weights import (
        load_detector_params_with_source, save_detector_params, thresholds_for_source)
    from facerec_tpu.config import CLASSIC_DETECTION_THRESHOLDS

    det = MTCNN((64, 64), min_face_size=40, max_faces=4, k_pnet=8, k_rnet=8)
    params = det.init(jax.random.key(0))
    d = save_detector_params(params, tmp_path / "w", source="pretrained")
    loaded, source = load_detector_params_with_source(d)
    assert source == "pretrained"
    assert thresholds_for_source(source) == CLASSIC_DETECTION_THRESHOLDS
    # default marker == self-trained; missing marker falls back to extension
    (d / "source.txt").unlink()
    _, source = load_detector_params_with_source(d)
    assert source == "self-trained"


def test_finetune_refiners_smoke(tmp_path, monkeypatch):
    """finetune_refiners warm-starts R/O-Net from the committed weights,
    keeps P-Net verbatim, and writes a CANDIDATE dir with provenance."""
    from facerec_tpu.detect import train as dtrain
    from facerec_tpu.detect.weights import load_detector_params_with_source

    det = MTCNN((64, 64), min_face_size=40, max_faces=4, k_pnet=8, k_rnet=8)
    base = det.init(jax.random.key(3))
    monkeypatch.setattr(
        "facerec_tpu.detect.weights.load_detector_params", lambda *a, **k: base)
    out = dtrain.finetune_refiners(tmp_path / "cand", n_scenes=6, steps=2, seed=5)
    params, source = load_detector_params_with_source(out)
    assert source == "self-trained"
    np.testing.assert_array_equal(
        np.asarray(params["pnet"]["conv1"]["kernel"]),
        np.asarray(base["pnet"]["conv1"]["kernel"]))
    # refiners actually moved
    assert not np.array_equal(np.asarray(params["onet"]["conv1"]["kernel"]),
                              np.asarray(base["onet"]["conv1"]["kernel"]))


def test_demote_nested_whole_over_part():
    """A facial-part box nested in a larger valid face box is demoted below
    it, so the covering box wins the final min-NMS; non-nested overlaps keep
    raw score order (detect/mtcnn.demote_nested)."""
    from facerec_tpu.detect.mtcnn import demote_nested
    from facerec_tpu.ops.nms import nms

    boxes = jnp.asarray([[
        [0.0, 0.0, 100.0, 100.0],   # whole face, lower score
        [30.0, 30.0, 62.0, 62.0],   # nested part, higher score -> demoted
        [90.0, 10.0, 150.0, 70.0],  # partial overlap, NOT nested
    ]])
    scores = jnp.asarray([[0.70, 0.95, 0.90]])
    valid = jnp.ones((1, 3), bool)
    eff = np.asarray(demote_nested(boxes, scores, valid))
    assert eff[0, 1] < 0.0 and eff[0, 0] == 0.70 and eff[0, 2] == 0.90
    b, s, v, idx = nms(boxes[0], jnp.asarray(eff[0]), valid[0], 0.7, "min", 3)
    kept = set(np.asarray(idx)[np.asarray(v)].tolist())
    assert 0 in kept and 1 not in kept  # whole survives, part merged away
    # the whole box must itself be valid for demotion to trigger
    valid2 = valid.at[0, 0].set(False)
    eff2 = np.asarray(demote_nested(boxes, scores, valid2))
    assert eff2[0, 1] == 0.95


def test_demote_nested_collage_guard():
    """An outer box containing TWO mutually disjoint valid detections is a
    collage (faces do not contain multiple faces), so it demotes nothing —
    without the guard, a junk frame-sized box that sneaks past O-Net on a
    crowded frame demotes every real face nested inside it and then
    suppresses them all in the min-mode NMS (measured 48/64 -> 52/64 bench
    slots; detect/mtcnn.demote_nested)."""
    from facerec_tpu.detect.mtcnn import demote_nested
    from facerec_tpu.ops.nms import nms

    boxes = jnp.asarray([[
        [0.0, 0.0, 400.0, 400.0],     # junk collage box over both faces
        [20.0, 20.0, 120.0, 120.0],   # real face A (disjoint from B)
        [250.0, 250.0, 350.0, 350.0],  # real face B
    ]])
    scores = jnp.asarray([[0.65, 0.99, 0.98]])
    valid = jnp.ones((1, 3), bool)
    eff = np.asarray(demote_nested(boxes, scores, valid))
    assert eff[0, 1] == 0.99 and eff[0, 2] == 0.98  # faces NOT demoted
    b, s, v, idx = nms(boxes[0], jnp.asarray(eff[0]), valid[0], 0.7, "min", 3)
    kept = set(np.asarray(idx)[np.asarray(v)].tolist())
    assert kept == {1, 2}  # faces win; the collage box dies in the NMS

    # one face's MUTUALLY OVERLAPPING part boxes do not make it a collage:
    # the whole face still demotes both parts (the real close-up pattern —
    # reference gallery part boxes overlap on the face region)
    boxes2 = jnp.asarray([[
        [0.0, 0.0, 160.0, 160.0],     # whole face
        [40.0, 60.0, 105.0, 125.0],   # part (cheek)
        [50.0, 70.0, 100.0, 120.0],   # part (nose), IoU with cheek >= 0.3
    ]])
    scores2 = jnp.asarray([[0.70, 0.95, 0.93]])
    eff2 = np.asarray(demote_nested(boxes2, scores2, valid))
    assert eff2[0, 0] == 0.70 and eff2[0, 1] < 0.0 and eff2[0, 2] < 0.0

    # DISJOINT part boxes at part scale (< 8x area ratio) must not flip the
    # guard either: Henry_00000001 at rnet_keep=16 produced 57-76 px
    # mutually disjoint parts inside the 127 px covering face — collage
    # evidence requires grid-of-faces scale (>= 8x smaller), so the whole
    # face still demotes them and keeps its portrait-covering box
    boxes3 = jnp.asarray([[
        [10.0, 10.0, 140.0, 140.0],   # whole face, 130 px
        [20.0, 30.0, 80.0, 90.0],     # eye region, 60 px, ratio ~4.7
        [75.0, 95.0, 135.0, 138.0],   # mouth region, disjoint from eye
    ]])
    scores3 = jnp.asarray([[0.80, 0.99, 0.97]])
    eff3 = np.asarray(demote_nested(boxes3, scores3, valid))
    assert eff3[0, 0] == 0.80 and eff3[0, 1] < 0.0 and eff3[0, 2] < 0.0


def test_large_quota_feeds_onet():
    """k_large reserves O-Net slots for large R-Net survivors; output stays
    [B, max_faces] and both k_large settings trace (static shapes)."""
    for k_large in (0, 4):
        det = MTCNN((64, 64), min_face_size=40, thresholds=(0.3, 0.3, 0.3),
                    max_faces=4, k_pnet=8, k_rnet=8, k_large=k_large)
        params = det.init(jax.random.key(0))
        out = det.detect(params, jnp.zeros((2, 64, 64, 3)))
        assert out.boxes.shape == (2, 4, 4) and out.valid.shape == (2, 4)


def test_input_range_modes_agree():
    """input_range='255' must equal 'auto' on 0..255 frames, and '1' must
    equal 'auto' on 0..1 frames (the static modes only skip the jnp.max
    range probe, never change values — detect/mtcnn.py input_range)."""
    rng = np.random.default_rng(5)
    frames = rng.uniform(0, 255, (2, 64, 64, 3)).astype(np.float32)
    kw = dict(min_face_size=40, thresholds=(0.3, 0.3, 0.3), max_faces=4,
              k_pnet=8, k_rnet=8)
    det_auto = MTCNN((64, 64), **kw)
    params = det_auto.init(jax.random.key(0))
    ref = det_auto.detect(params, jnp.asarray(frames))
    for mode, fr in (("255", frames), ("1", frames / 255.0)):
        det = MTCNN((64, 64), input_range=mode, **kw)
        out = det.detect(params, jnp.asarray(fr))
        # '255' is bit-identical; '1' round-trips /255 * 255 in f32, whose
        # rounding wiggles bf16 net outputs at the 1e-4 level
        np.testing.assert_allclose(np.asarray(out.probs), np.asarray(ref.probs),
                                   atol=2e-3)
        np.testing.assert_allclose(np.asarray(out.boxes), np.asarray(ref.boxes),
                                   atol=0.5)
    with pytest.raises(ValueError):
        MTCNN((64, 64), input_range="0-255", **kw)


def test_pyramid_source_base_traces_and_detects():
    """pyramid_source='base' (levels 1+ resample from level 0, cutting the
    pyramid's full-frame HBM re-reads) must trace with the same static
    output shapes and keep level-0 results identical — level 0 itself is
    always built from the frame, so the largest-scale proposals cannot
    change; deeper levels differ only by one bounded extra bilinear stage."""
    rng = np.random.default_rng(9)
    frames = rng.uniform(0, 255, (2, 96, 96, 3)).astype(np.float32)
    kw = dict(min_face_size=24, thresholds=(0.3, 0.3, 0.3), max_faces=4,
              k_pnet=8, k_rnet=8, input_range="255")
    det_f = MTCNN((96, 96), pyramid_source="frame", **kw)
    det_b = MTCNN((96, 96), pyramid_source="base", **kw)
    params = det_f.init(jax.random.key(0))
    of = det_f.detect(params, jnp.asarray(frames))
    ob = det_b.detect(params, jnp.asarray(frames))
    assert ob.boxes.shape == of.boxes.shape and ob.probs.shape == of.probs.shape
    # resampling semantics: level 0 is bit-identical (always built from the
    # frame); deeper levels carry one bounded extra bilinear stage, so they
    # must stay CLOSE to the from-frame levels on smooth content
    import math

    from facerec_tpu.ops.image import resize_bilinear

    xn = det_f.normalize(jnp.asarray(frames))
    h, w = 96, 96
    base = None
    for i, scale in enumerate(det_f.scales):
        sh = max(int(math.ceil(h * scale)), 12)
        sw = max(int(math.ceil(w * scale)), 12)
        lv_frame = resize_bilinear(xn, (sh, sw))
        lv_base = lv_frame if base is None else resize_bilinear(base, (sh, sw))
        if base is None:
            base = lv_frame  # identical by construction for level 0
        err = float(jnp.max(jnp.abs(lv_base.astype(jnp.float32)
                                    - lv_frame.astype(jnp.float32))))
        # normalized units span ~2.0; uniform-noise frames are the WORST case
        # for resample compounding and still stay bounded
        if i == 0:
            assert err == 0.0
        else:
            assert err < 0.7, (i, err)
    with pytest.raises(ValueError):
        MTCNN((96, 96), pyramid_source="chained", **kw)


def test_rnet_crop_scale_clamps_and_traces():
    """rnet_crop_scale clamps so min-size faces never upsample (min_face 24
    -> full res), and the scaled path traces with static shapes."""
    det = MTCNN((64, 64), min_face_size=24, max_faces=2, k_pnet=8, k_rnet=4,
                rnet_crop_scale=0.6)
    assert det.rnet_crop_scale == 1.0  # clamped: 24 * 0.6 < 24
    det = MTCNN((64, 64), min_face_size=48, max_faces=2, k_pnet=8, k_rnet=4,
                rnet_crop_scale=0.6)
    assert det.rnet_crop_scale == 0.6
    params = det.init(jax.random.key(0))
    out = det.detect(params, jnp.zeros((1, 64, 64, 3)))
    assert out.boxes.shape == (1, 2, 4)


def test_lowlight_norm_identity_on_normal_frames():
    """The low-light gate (per-frame std < 24) must leave
    well-exposed frames BIT-IDENTICAL — every normal frame measured (bench
    std 39-49, reference gallery std 42-55) is far above the threshold
    (detect/mtcnn.py lowlight_norm docstring)."""
    rng = np.random.default_rng(7)
    frames = rng.uniform(0, 255, (2, 64, 64, 3)).astype(np.float32)
    det_on = MTCNN((64, 64), min_face_size=40, max_faces=2, k_pnet=8, k_rnet=4)
    det_off = MTCNN((64, 64), min_face_size=40, max_faces=2, k_pnet=8, k_rnet=4,
                    lowlight_norm=False)
    a = np.asarray(det_on.normalize(jnp.asarray(frames)))
    b = np.asarray(det_off.normalize(jnp.asarray(frames)))
    np.testing.assert_array_equal(a, b)


def test_lowlight_norm_remaps_dark_frames():
    """A severely underexposed frame (the reference gallery's 33x42
    near-black JPEG has mean 37 / std 11.5) is remapped to the canonical
    exposure (std 48, mean 110) the synthetic-trained nets were trained at;
    a mixed batch gates per frame."""
    rng = np.random.default_rng(8)
    bright = rng.uniform(0, 255, (64, 64, 3)).astype(np.float32)
    dark = (bright * 0.12 + 10.0).astype(np.float32)  # std ~8.8, mean ~25
    det = MTCNN((64, 64), min_face_size=40, max_faces=2, k_pnet=8, k_rnet=4)
    out = np.asarray(det.normalize(jnp.stack([jnp.asarray(bright),
                                              jnp.asarray(dark)])),
                     np.float32)
    px = out * 128.0 + 127.5  # back to pixel units
    # bright frame untouched
    np.testing.assert_allclose(px[0], bright, atol=0.5)
    # dark frame sits at the canonical exposure
    assert abs(px[1].mean() - 110.0) < 6.0, px[1].mean()
    assert abs(px[1].std() - 48.0) < 8.0, px[1].std()
    # and the remap is monotone in the source pixel (an affine stretch,
    # not an inversion): brighter source pixels stay brighter
    flat_src, flat_out = dark.ravel(), px[1].ravel()
    order = np.argsort(flat_src)
    assert (np.diff(flat_out[order]) >= -1e-3).all()


def test_augment_crop_reexposes_dark_crops():
    """Trainer-side appearance match for the serve-time low-light remap
    (detect/mtcnn.py lowlight_norm): at serving, frames with std < 24 are
    affinely re-exposed BEFORE the cascade, so the refiners never see raw
    near-black crops — they see stretched ones with gain-amplified
    quantization banding. _augment_crop's final stage reproduces that
    appearance on dark training crops (detect/train.py)."""
    from facerec_tpu.detect.train import _augment_crop

    rng = np.random.default_rng(3)
    dark = np.clip(rng.normal(28.0, 6.0, (48, 48, 3)), 0, 255).astype(np.uint8)
    outs = [_augment_crop(dark, rng) for _ in range(80)]
    stds = np.array([o.astype(np.float32).std() for o in outs])
    assert all(o.dtype == np.uint8 for o in outs)
    # the 70%-gated remap re-exposes a healthy fraction of dark crops
    # (other augments run first, so not every draw stays below the gate)
    assert (stds > 30.0).mean() > 0.35, stds.round(1)
    # and nothing explodes out of pixel range
    assert max(o.max() for o in outs) <= 255 and min(o.min() for o in outs) >= 0
