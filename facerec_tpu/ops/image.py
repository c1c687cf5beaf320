"""Batched image geometry ops: affine warp, align, crop+resize.

TPU-native replacement for the reference's cv2 calls
(``getRotationMatrix2D``/``warpAffine`` at data_prep.py:84-85, ``cv2.resize``
at :150): instead of rotate-then-crop-then-resize (three resamplings through
host OpenCV), we compose ONE affine per face — output-pixel -> input-pixel —
and bilinear-sample once, batched under jit (SURVEY.md section 2.3 item 2).

Conventions: images are NHWC float; coordinates are (x, y) pixel positions
like OpenCV's; affine matrices are 2x3 mapping OUTPUT coords to INPUT coords
(inverse/warp form, which is what sampling needs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def bilinear_sample(image: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Sample ``image`` [H, W, C] at float coords (x [h, w], y [h, w]) with
    bilinear interpolation and zero padding outside."""
    h, w = image.shape[0], image.shape[1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = (x - x0)[..., None]
    dy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi = jnp.clip(xi, 0, w - 1)
        yi = jnp.clip(yi, 0, h - 1)
        vals = image[yi, xi]  # [h, w, C] XLA gather
        return jnp.where(valid[..., None], vals, 0.0)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    top = v00 * (1 - dx) + v01 * dx
    bot = v10 * (1 - dx) + v11 * dx
    return top * (1 - dy) + bot * dy


def _warp_one(image: jnp.ndarray, matrix: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    oh, ow = out_hw
    ys = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 1)
    src_x = matrix[0, 0] * xs + matrix[0, 1] * ys + matrix[0, 2]
    src_y = matrix[1, 0] * xs + matrix[1, 1] * ys + matrix[1, 2]
    return bilinear_sample(image, src_x, src_y)


@functools.partial(jax.jit, static_argnames=("out_hw",))
def affine_warp(images: jnp.ndarray, matrices: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Batched warp: images [B, H, W, C], matrices [B, 2, 3] (output->input),
    returns [B, oh, ow, C]."""
    return jax.vmap(lambda im, m: _warp_one(im, m, out_hw))(images, matrices)


def rotation_matrix(center_xy: jnp.ndarray, angle_deg: jnp.ndarray, scale: jnp.ndarray = 1.0) -> jnp.ndarray:
    """cv2.getRotationMatrix2D semantics (forward map); [..., 2, 3]."""
    a = jnp.deg2rad(angle_deg)
    alpha = jnp.cos(a) * scale
    beta = jnp.sin(a) * scale
    cx, cy = center_xy[..., 0], center_xy[..., 1]
    row0 = jnp.stack([alpha, beta, (1 - alpha) * cx - beta * cy], axis=-1)
    row1 = jnp.stack([-beta, alpha, beta * cx + (1 - alpha) * cy], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def invert_affine(m: jnp.ndarray) -> jnp.ndarray:
    """Invert a [..., 2, 3] affine (forward map -> sampling map)."""
    a, b, tx = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    c, d, ty = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    det = a * d - b * c
    ia, ib = d / det, -b / det
    ic, id_ = -c / det, a / det
    itx = -(ia * tx + ib * ty)
    ity = -(ic * tx + id_ * ty)
    row0 = jnp.stack([ia, ib, itx], axis=-1)
    row1 = jnp.stack([ic, id_, ity], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def compose_affine(m2: jnp.ndarray, m1: jnp.ndarray) -> jnp.ndarray:
    """Compose sampling maps: result(p) = m1(m2(p)) for output coords p
    (apply m2 first when both are output->input maps of successive stages)."""
    a = jnp.concatenate([m1, jnp.broadcast_to(jnp.asarray([[0.0, 0.0, 1.0]]), m1.shape[:-2] + (1, 3))], axis=-2)
    b = jnp.concatenate([m2, jnp.broadcast_to(jnp.asarray([[0.0, 0.0, 1.0]]), m2.shape[:-2] + (1, 3))], axis=-2)
    return (a @ b)[..., :2, :]


def align_crop_matrix(
    boxes: jnp.ndarray,  # [B, 4] (x1, y1, x2, y2) with margin already applied
    landmarks: jnp.ndarray | None,  # [B, 5, 2] (x, y); eyes at rows 0, 1
    out_size: int,
) -> jnp.ndarray:
    """Build ONE output->input affine per face fusing eye-alignment rotation
    (reference align_face data_prep.py:69-87: angle from eye landmarks,
    rotate about eye center) with crop + resize. [B, 2, 3]."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    bw = jnp.maximum(x2 - x1, 1.0)
    bh = jnp.maximum(y2 - y1, 1.0)
    # resize+crop sampling map: out pixel -> input pixel inside the box
    zeros = jnp.zeros_like(bw)
    crop = jnp.stack([
        jnp.stack([bw / out_size, zeros, x1], axis=-1),
        jnp.stack([zeros, bh / out_size, y1], axis=-1),
    ], axis=-2)  # [B, 2, 3]
    if landmarks is None:
        return crop
    le, re = landmarks[:, 0], landmarks[:, 1]
    dy = re[:, 1] - le[:, 1]
    dx = re[:, 0] - le[:, 0]
    angle = jnp.degrees(jnp.arctan2(dy, dx))
    center = (le + re) / 2.0
    rot_fwd = rotation_matrix(center, angle)  # forward rotation (cv2 form)
    rot_inv = invert_affine(rot_fwd)  # sampling map of the rotation
    # sample = rot_inv ∘ crop : out pixel -> rotated-image pixel -> source pixel
    return compose_affine(crop, rot_inv)


@functools.partial(jax.jit, static_argnames=("out_size",))
def align_and_crop(
    images: jnp.ndarray, boxes: jnp.ndarray, landmarks: jnp.ndarray | None, out_size: int
) -> jnp.ndarray:
    """Fused align+crop+resize: [B, H, W, C] -> [B, out, out, C]."""
    m = align_crop_matrix(boxes, landmarks, out_size)
    return affine_warp(images, m, (out_size, out_size))


@functools.partial(jax.jit, static_argnames=("out_hw",))
def crop_and_resize(images: jnp.ndarray, boxes: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Batched box crop+resize (MTCNN stage handoff): boxes [B, 4] x1y1x2y2
    in pixels of the single shared image batch [B, H, W, C]."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    bw = jnp.maximum(x2 - x1, 1.0)
    bh = jnp.maximum(y2 - y1, 1.0)
    zeros = jnp.zeros_like(bw)
    m = jnp.stack([
        jnp.stack([bw / out_hw[1], zeros, x1], axis=-1),
        jnp.stack([zeros, bh / out_hw[0], y1], axis=-1),
    ], axis=-2)
    return affine_warp(images, m, out_hw)


@functools.partial(jax.jit, static_argnames=("out_size",))
def align_and_crop_from(image: jnp.ndarray, boxes: jnp.ndarray, landmarks: jnp.ndarray,
                        out_size: int) -> jnp.ndarray:
    """N aligned crops out of ONE image [H, W, C] -> [N, out, out, C]
    (gathers index the shared image directly; no per-box copies)."""
    m = align_crop_matrix(boxes, landmarks, out_size)
    return jax.vmap(lambda mi: _warp_one(image, mi, (out_size, out_size)))(m)


@functools.partial(jax.jit, static_argnames=("out_hw",))
def crop_and_resize_from(image: jnp.ndarray, boxes: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Crop N boxes out of ONE image [H, W, C] -> [N, oh, ow, C]; the gathers
    index the shared image directly (no per-box broadcast copies)."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    bw = jnp.maximum(x2 - x1, 1.0)
    bh = jnp.maximum(y2 - y1, 1.0)
    zeros = jnp.zeros_like(bw)
    m = jnp.stack([
        jnp.stack([bw / out_hw[1], zeros, x1], axis=-1),
        jnp.stack([zeros, bh / out_hw[0], y1], axis=-1),
    ], axis=-2)
    return jax.vmap(lambda mi: _warp_one(image, mi, out_hw))(m)


@functools.partial(jax.jit, static_argnames=("out_hw",))
def resize_bilinear(images: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Plain batched resize (image pyramid levels)."""
    b, h, w, c = images.shape
    return jax.image.resize(images, (b, *out_hw, c), method="bilinear")


def bbox_with_margin(boxes: jnp.ndarray, margin: float, img_hw: tuple[int, int]) -> jnp.ndarray:
    """Expand boxes by a relative margin, clipped to the image (reference
    get_face_bbox_with_margin data_prep.py:89-106)."""
    x1, y1, x2, y2 = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    mw = (x2 - x1) * margin / 2
    mh = (y2 - y1) * margin / 2
    h, w = img_hw
    return jnp.stack([
        jnp.clip(x1 - mw, 0, w - 1),
        jnp.clip(y1 - mh, 0, h - 1),
        jnp.clip(x2 + mw, 0, w - 1),
        jnp.clip(y2 + mh, 0, h - 1),
    ], axis=-1)
