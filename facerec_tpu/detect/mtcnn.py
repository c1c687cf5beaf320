"""MTCNN face-detection cascade in Flax — P-Net / R-Net / O-Net.

TPU-native rebuild of the reference's detector dependency
(facenet-pytorch ``MTCNN``, used at data_prep.py:119-127 and app.py:281):
batched image pyramid, fully-convolutional P-Net proposals, R-Net/O-Net
refinement, landmark regression — all with STATIC shapes (fixed pyramid
levels, padded top-k candidates per stage, masked NMS) so the whole cascade
jit-compiles once (SURVEY.md section 7 hard-part #1).

Architectures follow Zhang et al. 2016 ("Joint Face Detection and Alignment
using Multitask Cascaded Convolutional Networks"): P-Net 12x12 fully-conv,
R-Net 24x24, O-Net 48x48 with 5-point landmarks. Parameter names mirror the
public facenet-pytorch module names (conv1/prelu1/...) so its pretrained
``.pt`` state dicts convert mechanically (models/convert.py).

Input convention: uint8/float RGB NHWC; internal normalization is
(x - 127.5) / 128 like the original implementation.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from facerec_tpu.ops.image import crop_and_resize_from, resize_bilinear
from facerec_tpu.ops.warp_fast import crop_resize_matmul
from facerec_tpu.ops.nms import nms


class PReLU(nn.Module):
    """Per-channel PReLU (torch nn.PReLU(num_parameters=C) semantics)."""

    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.constant(0.25), (x.shape[-1],), self.param_dtype)
        return jnp.where(x >= 0, x, x * alpha.astype(x.dtype))


def max_pool_ceil(x, window: int, stride: int):
    """Max pool with torch ceil_mode=True: pad bottom/right with -inf so
    partial windows are kept."""
    b, h, w, c = x.shape
    ph = (-(h - window) % stride) if h > window else (window - h)
    pw = (-(w - window) % stride) if w > window else (window - w)
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), constant_values=-jnp.inf)
    return nn.max_pool(x, (window, window), strides=(stride, stride), padding="VALID")


class PNet(nn.Module):
    """Proposal net: fully convolutional, stride 2, 12x12 receptive field."""

    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype, padding="VALID")
        x = nn.Conv(10, (3, 3), name="conv1", **kw)(x)
        x = PReLU(name="prelu1", dtype=self.dtype, param_dtype=self.param_dtype)(x)
        x = max_pool_ceil(x, 2, 2)
        x = nn.Conv(16, (3, 3), name="conv2", **kw)(x)
        x = PReLU(name="prelu2", dtype=self.dtype, param_dtype=self.param_dtype)(x)
        x = nn.Conv(32, (3, 3), name="conv3", **kw)(x)
        x = PReLU(name="prelu3", dtype=self.dtype, param_dtype=self.param_dtype)(x)
        probs = nn.softmax(nn.Conv(2, (1, 1), name="conv4_1", **kw)(x), axis=-1)
        reg = nn.Conv(4, (1, 1), name="conv4_2", **kw)(x)
        return probs[..., 1], reg  # face prob map [B,h,w], reg [B,h,w,4]


class RNet(nn.Module):
    """Refine net: 24x24 -> (face prob, bbox regression)."""

    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype, padding="VALID")
        pkw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = PReLU(name="prelu1", **pkw)(nn.Conv(28, (3, 3), name="conv1", **kw)(x))
        x = max_pool_ceil(x, 3, 2)
        x = PReLU(name="prelu2", **pkw)(nn.Conv(48, (3, 3), name="conv2", **kw)(x))
        x = max_pool_ceil(x, 3, 2)
        x = PReLU(name="prelu3", **pkw)(nn.Conv(64, (2, 2), name="conv3", **kw)(x))
        x = x.reshape(x.shape[0], -1)
        x = PReLU(name="prelu4", **pkw)(nn.Dense(128, name="dense4", **pkw)(x))
        probs = nn.softmax(nn.Dense(2, name="dense5_1", **pkw)(x), axis=-1)
        reg = nn.Dense(4, name="dense5_2", **pkw)(x)
        return probs[:, 1], reg


class ONet(nn.Module):
    """Output net: 48x48 -> (face prob, bbox regression, 5-point landmarks)."""

    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype, padding="VALID")
        pkw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = PReLU(name="prelu1", **pkw)(nn.Conv(32, (3, 3), name="conv1", **kw)(x))
        x = max_pool_ceil(x, 3, 2)
        x = PReLU(name="prelu2", **pkw)(nn.Conv(64, (3, 3), name="conv2", **kw)(x))
        x = max_pool_ceil(x, 3, 2)
        x = PReLU(name="prelu3", **pkw)(nn.Conv(64, (3, 3), name="conv3", **kw)(x))
        x = max_pool_ceil(x, 2, 2)
        x = PReLU(name="prelu4", **pkw)(nn.Conv(128, (2, 2), name="conv4", **kw)(x))
        x = x.reshape(x.shape[0], -1)
        x = PReLU(name="prelu5", **pkw)(nn.Dense(256, name="dense5", **pkw)(x))
        probs = nn.softmax(nn.Dense(2, name="dense6_1", **pkw)(x), axis=-1)
        reg = nn.Dense(4, name="dense6_2", **pkw)(x)
        lmk = nn.Dense(10, name="dense6_3", **pkw)(x)
        return probs[:, 1], reg, lmk


class Detections(NamedTuple):
    boxes: jnp.ndarray  # [B, max_faces, 4] x1y1x2y2 (input pixels)
    probs: jnp.ndarray  # [B, max_faces]
    landmarks: jnp.ndarray  # [B, max_faces, 5, 2] (x, y)
    valid: jnp.ndarray  # [B, max_faces] bool


def pyramid_scales(h: int, w: int, min_face_size: int, factor: float = 0.709,
                   oversize_levels: int = 1) -> list[float]:
    """Static pyramid: scales of 12/min_face * factor^i until min side < 12.

    ``oversize_levels`` appends that many EXTRA coarser levels past the
    classic stop, so a single P-Net cell can propose boxes LARGER than the
    frame — close-up portraits (e.g. the reference's gallery JPEGs) crop the
    face at the frame boundary, and without these levels the largest
    proposable box is min(h, w), which never covers such faces."""
    m = 12.0 / min_face_size
    min_side = min(h, w) * m
    scales = []
    while min_side >= 12.0:
        scales.append(m)
        m *= factor
        min_side *= factor
    for _ in range(oversize_levels):
        scales.append(m)
        m *= factor
    return scales


def _apply_regression(boxes: jnp.ndarray, reg: jnp.ndarray) -> jnp.ndarray:
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    return jnp.stack([
        boxes[..., 0] + reg[..., 0] * w,
        boxes[..., 1] + reg[..., 1] * h,
        boxes[..., 2] + reg[..., 2] * w,
        boxes[..., 3] + reg[..., 3] * h,
    ], axis=-1)


def _pad_slots(bx: jnp.ndarray, sc: jnp.ndarray, vl: jnp.ndarray,
               n_slots: int) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pad batched NMS output [B, m, ...] to exactly ``n_slots`` slots.

    nms() truncates to min(max_out, n_candidates), so a partition with fewer
    candidates than its quota (e.g. k_pnet < k_rnet with a single fine-scale
    level) would otherwise break the static k_rnet concatenation downstream."""
    pad = n_slots - bx.shape[1]
    if pad > 0:
        bx = jnp.pad(bx, ((0, 0), (0, pad), (0, 0)))
        sc = jnp.pad(sc, ((0, 0), (0, pad)))
        vl = jnp.pad(vl, ((0, 0), (0, pad)))
    return bx, sc, vl


def demote_nested(boxes: jnp.ndarray, scores: jnp.ndarray,
                  valid: jnp.ndarray, part_ratio: float = 1.5) -> jnp.ndarray:
    """Whole-over-part score demotion for the final min-mode NMS.

    A detection nested inside a larger valid detection (containment >= 0.8,
    area ratio >= ``part_ratio``) gets its score dropped by 1.0 so the
    covering box wins the merge. Containment >= 0.8 implies min-overlap >= 0.8 > 0.7 —
    the pair merges either way; this only flips which one survives. Faces
    do not nest, so the outer box is the face and the inner one a facial
    part (eye/nose/cheek — which synthetic-trained R/O-Nets score HIGHER
    than the whole face on real close-up portraits; measured part 0.92 vs
    whole 0.70 on the reference gallery, tests/test_real_photos.py). The
    reference's pretrained O-Net gets the score order right by itself
    (reference app.py:274-286). Inputs are batched [B, N, 4] / [B, N].

    Collage guard: an outer box containing TWO OR MORE mutually disjoint
    (pairwise IoU < 0.3) valid detections, each FAR smaller than it (area
    ratio >= 8 — grid-of-faces scale), is not a face and demotes nothing.
    Without this, a junk frame-sized box that sneaks past O-Net (~0.65) on
    a crowded frame demotes every real face (~1.0) nested inside it, then
    suppresses them all in the min-mode NMS: measured 48/64 -> 52/64 bench
    slots with the ungated large quota (large_rnet_threshold=0.0). With
    the guard, such a box demotes nothing and dies in the NMS against the
    higher-scored faces it overlaps. The >= 8 size cut separates the two
    measured populations: faces inside a bench collage box are 12-60x
    smaller in area (a 498 px junk box over 64-144 px faces), while a real
    close-up face's part boxes are only 2.9-5x smaller (57-76 px parts in
    a 127 px face, which CAN be mutually disjoint — eye vs mouth — and
    must not flip the guard, or the covering box loses whole-over-part
    demotion exactly where it matters)."""
    ix1 = jnp.maximum(boxes[:, :, None, 0], boxes[:, None, :, 0])
    iy1 = jnp.maximum(boxes[:, :, None, 1], boxes[:, None, :, 1])
    ix2 = jnp.minimum(boxes[:, :, None, 2], boxes[:, None, :, 2])
    iy2 = jnp.minimum(boxes[:, :, None, 3], boxes[:, None, :, 3])
    inter = jnp.maximum(ix2 - ix1, 0) * jnp.maximum(iy2 - iy1, 0)
    area = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0) * \
        jnp.maximum(boxes[..., 3] - boxes[..., 1], 0)  # [B, N]
    cont = inter / jnp.maximum(area[:, :, None], 1e-12)  # frac of i inside j
    nested = ((cont >= 0.8) & (area[:, None, :] >= part_ratio * area[:, :, None])
              & valid[:, None, :])  # [B, i, j]: valid j covers i
    # collage[b, j]: some pair of valid detections nested in j is mutually
    # disjoint. N is a small static slot count (<= rnet_keep + k_large), so
    # the [B,N,N,N] mask is a few MB of VPU work, nothing at serve scale.
    iou = inter / jnp.maximum(area[:, :, None] + area[:, None, :] - inter, 1e-12)
    # collage evidence: nested, itself valid, and grid-of-faces small
    nv = (nested & valid[:, :, None]
          & (area[:, None, :] >= 8.0 * area[:, :, None]))
    disj = iou < 0.3  # [B, i, i']
    collage = jnp.any(
        nv[:, :, None, :] & nv[:, None, :, :] & disj[:, :, :, None],
        axis=(1, 2))  # [B, j]
    is_part = jnp.any(nested & ~collage[:, None, :], axis=2)
    return jnp.where(is_part, scores - 1.0, scores)


def _square(boxes: jnp.ndarray) -> jnp.ndarray:
    """rerec: expand to square around center (original MTCNN postprocess)."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    side = jnp.maximum(w, h)
    cx = (boxes[..., 0] + boxes[..., 2]) / 2
    cy = (boxes[..., 1] + boxes[..., 3]) / 2
    return jnp.stack([cx - side / 2, cy - side / 2, cx + side / 2, cy + side / 2], axis=-1)


class MTCNN:
    """Batched, jit-compiled detect(images) -> Detections.

    Candidate budgets are static: ``k_pnet`` cells per pyramid level,
    ``k_rnet`` proposals into R-Net, ``max_faces`` final detections.
    """

    def __init__(
        self,
        image_hw: tuple[int, int],
        min_face_size: int = 20,
        thresholds: tuple[float, float, float] = (0.6, 0.7, 0.7),
        factor: float = 0.709,
        max_faces: int = 16,
        k_pnet: int = 64,
        k_rnet: int = 64,
        dtype: Any = jnp.float32,
        coarse_pnet_threshold: float = 0.0,
        k_large: int = 4,
        large_rnet_threshold: float = 0.0,
        prefer_whole: bool = True,
        part_ratio: float = 2.5,
        approx_topk: bool = True,
        input_range: str = "auto",
        rnet_crop_scale: float = 0.6,
        rnet_keep: int | None = None,
        rnet_nms_iou: float = 0.7,
        lowlight_norm: bool = True,
        cross_scale_nms_mode: str = "dupmin",
        pyramid_source: str = "frame",
    ):
        """``coarse_pnet_threshold``: P-Net validity threshold for COARSE
        pyramid levels (proposal side >= half the frame — full-face
        hypotheses on close-up portraits). P-Net scores at these scales do
        not transfer to real photographs (measured 0.28/0.004 on reference
        gallery close-ups whose crops then score 0.9+ at R-Net AND O-Net),
        so coarse candidates ride their reserved NMS quota on top-k rank
        alone and R-Net/O-Net arbitrate. Costs nothing: static shapes
        process all k_rnet crops regardless of validity. Set to
        ``thresholds[0]`` to restore uniform gating.

        ``k_large``: reserved O-Net slots for LARGE R-Net survivors (box side
        >= half the frame after R-Net regression). The stage-2 NMS keeps only
        ``max_faces`` slots and R-Net ranks facial-part crops above the whole
        face on real close-up portraits (measured 0.98 for a cheek crop vs
        0.94 for the face on the reference gallery), so the covering box was
        rank-starved out of O-Net's input entirely. The extra slots make
        O-Net's batch ``max_faces + k_large`` (static); the final NMS still
        returns ``max_faces``. Set 0 to disable.

        ``large_rnet_threshold``: R-Net validity gate for the LARGE quota
        (default 0.0 — same design as ``coarse_pnet_threshold``: reserved-
        quota candidates ride on top-k rank alone and the NEXT stage
        arbitrates). The quota exists because synthetic-trained R-Net
        systematically under-scores whole-face crops on real photographs;
        gating it at ``thresholds[1]`` partially defeats that purpose — the
        hardest reference gallery photo (random3_00000003.jpg, a 33x42
        near-black JPEG upsampled 4.8x at serving) has its full-face
        hypothesis scored 0.007-0.05 by every trained R-Net while O-Net,
        whose 48 px input keeps 2x more of the source detail, ranks it
        correctly. O-Net's ``thresholds[2]`` still gates every final
        detection, so false-positive behavior on face-free frames is
        unchanged (measured: tests/test_detector.py). Costs nothing at
        serve: the ``k_large`` O-Net slots are static either way. Set to
        ``thresholds[1]`` to restore uniform gating.

        ``rnet_keep``: fine slots the stage-2 NMS passes to O-Net (default
        ``2 * max_faces``, clamped to ``k_rnet``). With crowded frames
        (gt count == max_faces), R-Net duplicate survivors of one face
        rank-starve another face out of a max_faces budget (measured:
        15/16 bench-frame losses were exactly this, and the remaining
        60/64 bench fill at rnet_keep == max_faces becomes 64/64 at 2x —
        every "missed" face was a rank-starved one, not a scoring miss);
        rnet_keep > max_faces lets O-Net + the final NMS arbitrate at the
        cost of ``rnet_keep - max_faces`` extra 48 px O-Net crops.
        O-Net's batch grows to ``rnet_keep + k_large``.

        ``rnet_nms_iou``: IoU threshold of the stage-2 fine NMS (default
        0.7, the classic MTCNN value). Lower merges R-Net duplicate boxes
        of one face more aggressively, freeing slots.

        ``prefer_whole``: at the final min-mode NMS, a detection nested
        inside a larger valid detection (containment >= 0.8, area ratio
        >= ``part_ratio``) is demoted below it, so the covering face box
        wins over a facial-part box regardless of O-Net score order. Faces
        do not nest; the reference's pretrained O-Net achieves this via
        score order alone (reference app.py:274-286), which
        synthetic-trained nets do not reproduce on real photos (part 0.92
        vs whole 0.70 measured). ``part_ratio`` separates true facial-part
        boxes (measured 2.9-5x smaller in area than their face on the
        reference gallery) from an oversized duplicate of the SAME face
        demoting its own tight box (the round-5 bench-loss probe found
        such pairs at ratio < 2.5 landing the sloppy outer box at IoU
        0.23-0.29 vs ground truth). Default 2.5, from the same-state TPU
        A/B (tools/ab_part_ratio.py): 1.5 -> 374/369 of 384 bench GT faces
        matched at prob>=0.6/0.9, 2.5 -> 375/374 (+5 at the demo operating
        point), reference-gallery recall and full-face coverage 7/7 at
        both settings (the classic 1.5 demotes nothing the 2.5 floor
        keeps: parts are >=2.9x).

        ``lowlight_norm``: remap severely underexposed frames (per-frame
        pixel std < 24) to a canonical exposure
        (std 48, mean 110) before the cascade. The reference's pretrained
        MTCNN absorbs bad exposure through its real-world training data
        (app.py:274-286 feeds raw webcam frames); our synthetic-trained
        nets see only well-exposed scenes, so exposure is normalized at
        serve time instead. Gated: every normal frame measured (bench
        frames std 39-49, reference gallery std 42-55) passes through
        BIT-IDENTICAL; the one underexposed reference photo
        (random3_00000003.jpg, std 11.5) moves from a 0.895 part-box
        detection to 0.99 and gains coarse full-face P-Net candidates
        (side 82-117 px) that never score at all on the raw frame.
        Detection only — embed crops still sample the original frames."""
        self.image_hw = image_hw
        self.min_face_size = min_face_size
        self.thresholds = thresholds
        self.coarse_pnet_threshold = coarse_pnet_threshold
        self.k_large = k_large
        self.large_rnet_threshold = large_rnet_threshold
        # default 2x max_faces; never below max_faces (the final NMS must be
        # able to emit max_faces slots) and never above k_rnet unless
        # max_faces itself exceeds k_rnet (degenerate configs pad).
        self.rnet_keep = (min(2 * max_faces, max(k_rnet, max_faces))
                          if rnet_keep is None else rnet_keep)
        self.rnet_nms_iou = rnet_nms_iou
        # Stage-1 cross-scale NMS overlap mode. "union" (classic MTCNN) keeps
        # one box PER (face, pyramid level): concentric boxes 1.41x apart in
        # side have IoU ~0.5 < 0.7, so an F-face frame occupies ~3F-4F of the
        # k_rnet fine slots and rank-starves low-scoring (dark) faces out of
        # R-Net's input entirely (measured: every round-3 bench miss — the
        # "low-contrast floor" diagnosis was wrong; P-Net scores those faces
        # 0.75-0.91, tools/probe_pnet_dark.py). "dupmin" (the default) merges
        # SIMILAR-SIZE concentric duplicates by min-overlap while leaving
        # part-in-whole pairs to classic IoU (ops/nms.py overlap_matrix) —
        # one slot per face: bench fill 91.7% -> 99.0% at k_rnet=32, where
        # the brute-force alternative (k_rnet=64, union) reached only 97.4%
        # and cost ~10% e2e throughput (tools/ab_krnet.py). Plain "min" is
        # NOT offered as a default: it also merges part-into-whole and let a
        # higher-scoring part candidate eat the whole face on the hardest
        # reference-gallery photo.
        self.cross_scale_nms_mode = cross_scale_nms_mode
        self.prefer_whole = prefer_whole
        self.part_ratio = part_ratio
        self.approx_topk = approx_topk
        if input_range not in ("auto", "255", "1"):
            raise ValueError(f"input_range must be auto/255/1, got {input_range!r}")
        # "auto" infers 0..1 vs 0..255 per call via jnp.max — a full reduce
        # over the frame batch that costs ~0.7 ms at serve shapes (batch 48).
        # Serving paths that KNOW their scale pass "255" (or "1") and skip it.
        self.input_range = input_range
        self.lowlight_norm = lowlight_norm
        # R-Net 24px crops resample from a cached ``rnet_crop_scale`` copy of
        # the frame instead of full resolution: the crop matmuls contract
        # over the source H/W, so 0.6 cuts their FLOPs 2.8x (~0.6 ms at
        # batch 48). Lossless in resolution terms: min_face_size boxes map to
        # >= 24 source px at 0.6 (s * 0.6 >= 24 for s >= 40), so every crop
        # still downsamples; the extra bilinear stage only changes
        # antialiasing, which the trainer's blur augmentation already covers
        # (detect/train.py down-up resize). Set 1.0 to crop from full res.
        # Clamped so min-size faces never UPSAMPLE (needs s * scale >= 24):
        # e.g. min_face_size 24 forces full resolution.
        self.rnet_crop_scale = min(max(rnet_crop_scale, 24.0 / min_face_size), 1.0)
        self.factor = factor
        self.max_faces = max_faces
        self.k_pnet = k_pnet
        self.k_rnet = k_rnet
        # "frame": every pyramid level resamples the full-resolution frame
        # (classic MTCNN / facenet-pytorch behavior — each of the ~9 resizes
        # re-reads the whole [B, H, W, 3] tensor from HBM). "base": levels
        # below the largest resample from LEVEL 0 instead — one bounded extra
        # bilinear stage per level, but the re-reads shrink from the frame to
        # the (scale0^2)-sized base, cutting the pyramid stage's HBM traffic
        # ~3x at serve shapes. Detection-accuracy impact must be A/B'd per
        # weights (tools/ab_pipeline.py pyramid_base pyramid_frame).
        if pyramid_source not in ("frame", "base"):
            raise ValueError(f"pyramid_source must be frame/base, got {pyramid_source!r}")
        self.pyramid_source = pyramid_source
        self.scales = pyramid_scales(*image_hw, min_face_size, factor)
        self.dtype = dtype
        self.pnet = PNet(dtype=dtype)
        self.rnet = RNet(dtype=dtype)
        self.onet = ONet(dtype=dtype)

    # -- parameter init/load --------------------------------------------------
    def init(self, rng: jax.Array) -> dict:
        h, w = self.image_hw
        kp, kr, ko = jax.random.split(rng, 3)
        return {
            "pnet": self.pnet.init(kp, jnp.zeros((1, max(h // 4, 12), max(w // 4, 12), 3)))["params"],
            "rnet": self.rnet.init(kr, jnp.zeros((1, 24, 24, 3)))["params"],
            "onet": self.onet.init(ko, jnp.zeros((1, 48, 48, 3)))["params"],
        }

    # -- cascade ---------------------------------------------------------------
    def __call__(self, params: dict, images: jnp.ndarray) -> Detections:
        return self.detect(params, images)

    def normalize(self, images: jnp.ndarray) -> jnp.ndarray:
        """[B,H,W,3] float frames -> the cascade's normalized compute-dtype
        tensor. Pyramid + crops run in bf16 in serving: the pyramid re-reads
        every frame once per level, so this halves the detect stage's dominant
        HBM traffic; 8-bit image data loses nothing."""
        x = images.astype(jnp.float32)
        if self.input_range == "auto":
            x = jnp.where(jnp.max(x) <= 2.0, x * 255.0, x)
        elif self.input_range == "1":
            x = x * 255.0
        if self.lowlight_norm:
            # Stats on a 4x-subsampled grid: 1/16 the elements, and the
            # gate threshold (std < 24) sits far from both sides (dark
            # photo 11.5 vs dimmest normal frame 38.7), so subsampling
            # noise cannot flip it.
            #
            # The remap FOLDS INTO the normalize affine as per-frame
            # scalars: xn = (x - m_eff) * g_eff, where well-exposed frames
            # get (127.5, 1/128) — bit-identical to the plain path, since
            # scaling by the power of two 1/128 is exact — and dark frames
            # get the exposure stretch (to pixel std 48 / mean 110)
            # composed with it.
            #
            # Two measured 19%-e2e-slower drafts (interleaved
            # tools/ab_pipeline.py lowlight nolowlight, 20.3k vs 24.2k):
            # a full-frame where/clip remap chain, AND stats on a strided
            # x[:, ::4, ::4, :] subsample — the strided slice lowers as
            # gather-class traffic at ~3-9 ns/element (CLAUDE.md trap), so
            # "1/16 of the elements" cost ~4 ms, 20x the full contiguous
            # read it was meant to save. Full-frame mean/E[x^2] in ONE
            # fused contiguous pass is the cheap form.
            m = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
            s2 = jnp.mean(x * x, axis=(1, 2, 3), keepdims=True)
            s = jnp.sqrt(jnp.maximum(s2 - m * m, 0.0))
            dark = s < 24.0
            gain = 48.0 / jnp.maximum(s, 4.0)
            # dark:  xn = ((x - m) * gain + 110 - 127.5) / 128
            #           = (x - (m + (127.5 - 110) / gain)) * (gain / 128)
            m_eff = jnp.where(dark, m + (127.5 - 110.0) / gain, 127.5)
            g_eff = jnp.where(dark, gain, 1.0) * (1.0 / 128.0)
            # Pixel-range clip, in normalized units: for 0..255 inputs the
            # identity branch already lies inside these bounds, so the clip
            # only bites on the stretched dark frames.
            lo, hi = (0.0 - 127.5) / 128.0, (255.0 - 127.5) / 128.0
            return jnp.clip((x - m_eff) * g_eff, lo, hi).astype(self.dtype)
        return ((x - 127.5) / 128.0).astype(self.dtype)

    @partial(jax.jit, static_argnums=0)
    def detect(self, params: dict, images: jnp.ndarray) -> Detections:
        """images: [B, H, W, 3] float. Pixel scale per ``input_range``:
        "auto" (default) autodetects 0..255 vs 0..1 by jnp.max per call;
        "255"/"1" pin the scale and skip the probe — a pinned detector fed
        the OTHER scale normalizes frames to garbage and detects nothing,
        so serving paths expose the choice (serve/app.build_default_pipeline
        input_range)."""
        b, h, w, _ = images.shape
        assert (h, w) == self.image_hw, f"built for {self.image_hw}, got {(h, w)}"
        xn = self.normalize(images)
        boxes, _, valid = self.stage1(params, xn)
        # stage1's scores are profile-probe output only (tools/profile_detect
        # slope-times the stage1 prefix); R-Net re-scores every candidate, so
        # stages 2/3 never read them.
        return self._stages23(params, xn, boxes, valid)

    def stage1(self, params: dict, xn: jnp.ndarray):
        """P-Net over the pyramid + per-scale and stratified cross-scale NMS.
        Returns squared candidate (boxes [B,k_rnet,4], scores, valid) — the
        exact stage detect() runs (tools/profile_detect.py probes this method,
        so the profile cannot drift from the served program)."""
        b = xn.shape[0]
        h, w = self.image_hw
        # ---- stage 1: P-Net over the pyramid --------------------------------
        all_boxes, all_scores, all_valid = [], [], []
        coarse_side = 0.5 * min(h, w)  # same cut as the stratified NMS below
        base = None  # level 0, the resample source when pyramid_source="base"
        for scale in self.scales:
            p_thr = (self.coarse_pnet_threshold if 12.0 / scale >= coarse_side
                     else self.thresholds[0])
            sh, sw = max(int(math.ceil(h * scale)), 12), max(int(math.ceil(w * scale)), 12)
            src = base if (self.pyramid_source == "base" and base is not None) else xn
            level = resize_bilinear(src, (sh, sw))
            if base is None:
                base = level
            prob, reg = self.pnet.apply({"params": params["pnet"]}, level)  # [B,h',w'], [B,h',w',4]
            bh, bw = prob.shape[1], prob.shape[2]
            k = min(self.k_pnet, bh * bw)
            flat = prob.reshape(b, -1)
            if self.approx_topk and flat.shape[-1] > 4 * k:
                # TPU-native approximate top-k (Chern et al. 2022): the exact
                # per-level sort was a measurable slice of the cascade's
                # latency, and P-Net candidate selection tolerates it — a
                # 12x12 cell missed at recall 0.95 is a duplicate of a
                # neighboring cell past NMS, not a lost face.
                top_p, top_i = jax.lax.approx_max_k(flat, k, recall_target=0.95)
            else:
                top_p, top_i = jax.lax.top_k(flat, k)  # [B, k]
            iy = (top_i // bw).astype(jnp.float32)
            ix = (top_i % bw).astype(jnp.float32)
            # cell -> input-pixel box (stride 2, cell 12, then unscale)
            x1 = (ix * 2.0) / scale
            y1 = (iy * 2.0) / scale
            x2 = (ix * 2.0 + 12.0) / scale
            y2 = (iy * 2.0 + 12.0) / scale
            boxes = jnp.stack([x1, y1, x2, y2], axis=-1)  # [B, k, 4]
            reg_flat = reg.reshape(b, -1, 4)
            reg_k = jnp.take_along_axis(reg_flat, top_i[..., None], axis=1)
            boxes = _apply_regression(boxes, reg_k)
            valid = top_p > p_thr
            if boxes.shape[1] < self.k_pnet:  # pad small pyramid levels
                pad = self.k_pnet - boxes.shape[1]
                boxes = jnp.pad(boxes, ((0, 0), (0, pad), (0, 0)))
                top_p = jnp.pad(top_p, ((0, 0), (0, pad)))
                valid = jnp.pad(valid, ((0, 0), (0, pad)))
            all_boxes.append(boxes)
            all_scores.append(top_p)
            all_valid.append(valid)
        # per-scale NMS 0.5, batched over (frame, scale) in ONE vmapped call
        # (sequential NMS rounds are the cascade's latency driver; keeping one
        # selection loop of k_keep steps instead of n_scales separate loops)
        k_keep = min(self.k_pnet, self.k_rnet)
        sb = jnp.stack(all_boxes, axis=1)  # [B, S, k, 4]
        ss = jnp.stack(all_scores, axis=1)
        sv = jnp.stack(all_valid, axis=1)
        bx, sc, vl, _ = jax.vmap(jax.vmap(
            lambda bb, s_, vv: nms(bb, s_, vv, 0.5, "union", k_keep)))(sb, ss, sv)
        # cross-scale NMS 0.7 with a SCALE-STRATIFIED quota: coarse levels
        # (box side >= half the frame — full-face hypotheses on close-up
        # portraits) bypass rank competition against fine levels, so the
        # handful of ~0.7-0.9-scoring full-face candidates cannot be
        # rank-starved out of the static k_rnet budget by dozens of 0.95+
        # fine-scale sub-part windows (eyes/noses score high on real photos;
        # measured on the reference gallery close-ups,
        # tests/test_real_photos.py). The quota is PER LEVEL (top-q slots of
        # each coarse level's own NMS output, which is score-ordered): coarse
        # P-Net scores do not transfer to real photographs (measured 0.004 on
        # a portrait whose crop then scores 0.9+ at R-Net and O-Net), so a
        # shared cross-level quota would let one coarse level's confident
        # cells evict another's only candidate. R-Net/O-Net arbitrate.
        n_coarse = sum(1 for s in self.scales if 12.0 / s >= 0.5 * min(h, w))
        if 0 < n_coarse < len(self.scales):
            # quota cannot exceed k_keep — each level's NMS emits only k_keep
            # slots, and a larger q would silently slice fewer than k_c
            # candidates below, breaking the static k_rnet concat
            q = max(1, min(k_keep, (self.k_rnet // 8) // n_coarse))
            while q > 1 and q * n_coarse > self.k_rnet - 1:
                q -= 1
            k_c = min(q * n_coarse, self.k_rnet - 1)
            # [B, S, k_keep, ...] slots are score-desc per level: take top-q
            cb2 = bx[:, -n_coarse:, :q].reshape(b, -1, 4)[:, :k_c]
            cs2 = sc[:, -n_coarse:, :q].reshape(b, -1)[:, :k_c]
            cv2 = vl[:, -n_coarse:, :q].reshape(b, -1)[:, :k_c]
            fb, fs, fv = bx[:, :-n_coarse], sc[:, :-n_coarse], vl[:, :-n_coarse]
            fb2, fs2, fv2, _ = jax.vmap(
                lambda bb, ss_, vv: nms(bb, ss_, vv, 0.7, self.cross_scale_nms_mode,
                                        self.k_rnet - k_c)
            )(fb.reshape(b, -1, 4), fs.reshape(b, -1), fv.reshape(b, -1))
            fb2, fs2, fv2 = _pad_slots(fb2, fs2, fv2, self.k_rnet - k_c)
            boxes = jnp.concatenate([fb2, cb2], axis=1)
            scores = jnp.concatenate([fs2, cs2], axis=1)
            valid = jnp.concatenate([fv2, cv2], axis=1)
        else:
            boxes, scores, valid, _ = jax.vmap(
                lambda bb, ss_, vv: nms(bb, ss_, vv, 0.7, self.cross_scale_nms_mode,
                                        self.k_rnet)
            )(bx.reshape(b, -1, 4), sc.reshape(b, -1), vl.reshape(b, -1))
            boxes, scores, valid = _pad_slots(boxes, scores, valid, self.k_rnet)
        return _square(boxes), scores, valid

    def rnet_crops(self, xn: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
        """24px R-Net crops, resampled from a cached ``rnet_crop_scale`` copy
        of the frame when enabled (the served path — see __init__)."""
        h, w = self.image_hw
        if self.rnet_crop_scale != 1.0:
            rs = self.rnet_crop_scale
            rh, rw = int(round(h * rs)), int(round(w * rs))
            xh = resize_bilinear(xn, (rh, rw))
            rscale = jnp.asarray([rw / w, rh / h, rw / w, rh / h], jnp.float32)
            return jax.vmap(lambda im, bx: crop_resize_matmul(
                im, bx, 24, out_dtype=self.dtype))(xh, boxes * rscale)
        return jax.vmap(lambda im, bx: crop_resize_matmul(
            im, bx, 24, out_dtype=self.dtype))(xn, boxes)

    def _stages23(self, params: dict, xn: jnp.ndarray, boxes, valid) -> Detections:
        b = xn.shape[0]
        h, w = self.image_hw
        # ---- stage 2: R-Net ---------------------------------------------------
        mf = self.max_faces
        crops = self.rnet_crops(xn, boxes)
        rp, rreg = self.rnet.apply({"params": params["rnet"]}, crops.reshape(-1, 24, 24, 3))
        rp = rp.reshape(b, self.k_rnet)
        rreg = rreg.reshape(b, self.k_rnet, 4)
        rvalid = valid & (rp > self.thresholds[1])
        rboxes = _apply_regression(boxes, rreg)
        rk = self.rnet_keep
        fb, fs, fv, _ = jax.vmap(
            lambda bb, ss, vv: nms(bb, ss, vv, self.rnet_nms_iou, "union", rk)
        )(rboxes, rp, rvalid)
        fb, fs, fv = _pad_slots(fb, fs, fv, rk)
        if self.k_large > 0:
            # reserved slots for large survivors (full-face hypotheses on
            # close-up portraits): R-Net ranks part crops above the whole
            # face on real photos, so without these the covering box is
            # rank-starved out of the mf-slot budget before O-Net ever
            # scores it (see __init__ docstring).
            side = jnp.maximum(rboxes[..., 2] - rboxes[..., 0],
                               rboxes[..., 3] - rboxes[..., 1])
            large = (valid & (rp > self.large_rnet_threshold)
                     & (side >= 0.5 * min(h, w)))
            lb, ls, lv, _ = jax.vmap(
                lambda bb, ss, vv: nms(bb, ss, vv, 0.7, "union", self.k_large)
            )(rboxes, rp, large)
            lb, ls, lv = _pad_slots(lb, ls, lv, self.k_large)
            boxes = jnp.concatenate([fb, lb], axis=1)
            valid = jnp.concatenate([fv, lv], axis=1)
        else:
            boxes, valid = fb, fv
        boxes = _square(boxes)

        # ---- stage 3: O-Net ---------------------------------------------------
        ns = rk + max(self.k_large, 0)  # O-Net slots (fine + large quota)
        crops = jax.vmap(
            lambda im, bx: crop_resize_matmul(im, bx, 48, out_dtype=self.dtype))(xn, boxes)
        op, oreg, olmk = self.onet.apply({"params": params["onet"]}, crops.reshape(-1, 48, 48, 3))
        op = op.reshape(b, ns)
        oreg = oreg.reshape(b, ns, 4)
        olmk = olmk.reshape(b, ns, 10)
        valid = valid & (op > self.thresholds[2])
        bwd = boxes[..., 2] - boxes[..., 0]
        bht = boxes[..., 3] - boxes[..., 1]
        lx = boxes[..., 0:1] + olmk[..., 0:5] * bwd[..., None]
        ly = boxes[..., 1:2] + olmk[..., 5:10] * bht[..., None]
        landmarks = jnp.stack([lx, ly], axis=-1)  # [B, ns, 5, 2]
        boxes = _apply_regression(boxes, oreg)
        op_eff = (demote_nested(boxes, op, valid, self.part_ratio)
                  if self.prefer_whole else op)
        boxes, _, valid, idx = jax.vmap(
            lambda bb, ss, vv: nms(bb, ss, vv, 0.7, "min", mf)
        )(boxes, op_eff, valid)
        probs = jnp.where(
            valid, jnp.take_along_axis(op.astype(jnp.float32), idx, axis=1), 0.0)
        landmarks = jnp.take_along_axis(landmarks, idx[..., None, None], axis=1)
        return Detections(boxes=boxes, probs=probs, landmarks=landmarks, valid=valid)
