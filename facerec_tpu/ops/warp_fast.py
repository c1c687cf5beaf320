"""Fast gather-free face alignment: matmul crop+resize + 2-shear rotation.

Why: XLA lowers arbitrary-index gathers to ~3-9 ns per element on TPU — the
exact bilinear warp (ops/image.py) costs ~57 ms for 64 faces x 160^2 from
480x640 frames on v5e and dominates serving latency. Every dynamic-index
formulation (per-pixel gathers, windowed gathers, vmapped dynamic slices) was
measured in the same 40-100 ms band. This module uses only the primitives the
hardware runs fast:

  Stage A — axis-aligned crop+resize to a padded patch P = S + 2*pad: two
    per-crop MXU matmuls against bilinear weight matrices (W_rows [P, H],
    W_cols [P, W]); the box offset and scale live in the weights, so there is
    no dynamic slicing at all. ~1.5 ms for 64 crops.
  Stage B — rotation by the eye angle about the eye center, done INSIDE the
    patch as TWO shear passes (Shy(sin*cos) . Shx(-tan), the shear remainder
    of the LDU factorization R = Diag(cos, 1/cos).Shy.Shx — the diagonal
    anisotropic scale folds into stage A's bilinear weights for free, which
    eliminates the classic 3-shear chain's full-width first pass and one
    interpolation stage; see ``_shear_params``). Each shear is a per-row
    (or per-column) fractional translation realized as a sum over STATIC
    rolls masked per row — pure VPU work, no gathers.

Accuracy: stage A matches direct bilinear exactly for unrotated faces; with
rotation the chain applies two successive linear interpolations on top of
the stage-A resample (slightly softer than one bilinear tap, ~40 dB PSNR vs
the exact warp — and sharper than the previous 3-pass chain).
Rotation angles are clamped to ``max_angle_deg`` (default 15 deg; real face
tilts beyond that are rare) — larger angles fall back to partial alignment.
The exact gather warp remains available for parity evaluation
(``FacePipeline(precise_align=True)``).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp


def _bilinear_weights(starts: jnp.ndarray, scales: jnp.ndarray, out_size: int,
                      in_size: int) -> jnp.ndarray:
    """[N, out, in] matrices: row p samples input at starts[n] + scales[n]*p
    (edge-clamped bilinear)."""
    p = jnp.arange(out_size, dtype=jnp.float32)
    pos = starts[:, None] + scales[:, None] * p[None, :]  # [N, out]
    pos = jnp.clip(pos, 0.0, in_size - 1.0)
    s = jnp.arange(in_size, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(pos[:, :, None] - s[None, None, :]))  # [N, out, in]


def crop_resize_matmul(image: jnp.ndarray, boxes: jnp.ndarray, out_size: int,
                       out_dtype: jnp.dtype = jnp.float32) -> jnp.ndarray:
    """N axis-aligned crops from ONE image [H, W, C] -> [N, out, out, C],
    resampled entirely with matmuls (no dynamic indexing).

    ``out_dtype=bf16`` saves the consumer-side cast for callers that compute
    in bf16 anyway (detector crops, the serve pipeline) — value-identical to
    returning f32 and casting later. The row-pass intermediate stays f32:
    producing it directly in bf16 (preferred_element_type=bf16) was measured
    perf-NEUTRAL (XLA already fuses the cast into the dot epilogue) while
    costing accuracy — XLA may accumulate multi-pass K-contraction partials
    at the output precision, and bench detection dropped 216->209/256."""
    h, w, _ = image.shape
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    sy = jnp.maximum(y2 - y1, 1.0) / out_size
    sx = jnp.maximum(x2 - x1, 1.0) / out_size
    wy = _bilinear_weights(y1, sy, out_size, h)  # [N, P, H]
    wx = _bilinear_weights(x1, sx, out_size, w)  # [N, P, W]
    t = jnp.einsum("nph,hwc->npwc", wy.astype(jnp.bfloat16), image.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    out = jnp.einsum("nqw,npwc->npqc", wx.astype(jnp.bfloat16), t.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return out.astype(out_dtype)


def _shear_x(patch: jnp.ndarray, slope: jnp.ndarray, const: jnp.ndarray, k_lo: int, k_hi: int,
             coarse: int = 8) -> jnp.ndarray:
    """out[n, y, x] = patch[n, y, x + slope[n]*(y - cy) + const[n]] via sums
    of STATIC slices of a zero-padded patch, masked per row (bilinear in the
    fractional part). Static slices (unlike jnp.roll's concat or dynamic
    slices) fuse into one VPU loop: the input tile is read once and each term
    is a select+fma. Shift clamped to [k_lo, k_hi].

    Two-level decomposition: shift = coarse*c + r + frac. An integer
    translate at ``coarse`` granularity (one select per coarse slot) feeds a
    fine pass of ``coarse+1`` bilinear taps — O(K/coarse + coarse) selects
    per element instead of O(K), ~3x fewer VPU ops at K~30-60 (the shear
    chain was the serving pipeline's bandwidth wall at batch>=16). The math
    is IDENTICAL to the single-level form: only zeros are added by the extra
    masked taps."""
    return _shear(patch, slope, const, k_lo, k_hi, axis=2, coarse=coarse)


def _shear(patch: jnp.ndarray, slope: jnp.ndarray, const: jnp.ndarray, k_lo: int, k_hi: int,
           axis: int, coarse: int = 8) -> jnp.ndarray:
    """Shear along ``axis`` (2 = x, shift varies per row; 1 = y, shift varies
    per column) — slicing the shifted axis directly instead of transposing a
    ~27 MB patch tensor twice around an x-only kernel."""
    n, p = patch.shape[0], patch.shape[1]
    dt = patch.dtype
    other = jnp.arange(p, dtype=jnp.float32) - (p - 1) / 2.0
    shift = slope[:, None] * other[None, :] + const[:, None]  # [N, P] per line
    shift = jnp.clip(shift, k_lo, k_hi - 1.0)
    base = jnp.floor(shift)
    frac = shift - base  # [N, P]
    c = jnp.floor(base / coarse)  # coarse slot per line
    r = base - c * coarse  # integer remainder in [0, coarse)
    c_lo = math.floor(k_lo / coarse)
    c_hi = math.floor((k_hi - 1) / coarse)
    pad_lo = max(-c_lo * coarse, 0)
    pad_hi = max(c_hi * coarse + coarse + 1, 0)
    pads = [(0, 0)] * patch.ndim
    pads[axis] = (pad_lo, pad_hi)
    padded = jnp.pad(patch, pads)
    # weight index layout: for axis=2 the shift varies with the ROW (dim 1)
    # -> broadcast [N, P, 1, 1]; for axis=1 it varies with the COLUMN (dim 2)
    # -> broadcast [N, 1, P, 1]
    expand = (slice(None), slice(None), None, None) if axis == 2 else (slice(None), None, slice(None), None)
    # stage 1: coarse integer translate, kept `coarse` wider for the fine taps
    width1 = p + coarse + 1
    shape1 = list(patch.shape)
    shape1[axis] = width1
    out1 = jnp.zeros(shape1, dt)
    for ci in range(c_lo, c_hi + 1):
        m = (c == ci).astype(dt)
        sl = jax.lax.slice_in_dim(padded, ci * coarse + pad_lo, ci * coarse + pad_lo + width1, axis=axis)
        out1 = out1 + m[expand] * sl
    # stage 2: fine shift f = r + frac in [0, coarse); floor(f) == r exactly
    f = (r + frac).astype(jnp.float32)
    fb = jnp.floor(f)
    ff = f - fb
    out = jnp.zeros_like(patch)
    for k in range(0, coarse + 1):
        wk = (jnp.where(fb == k, 1.0 - ff, 0.0) + jnp.where(fb == k - 1, ff, 0.0)).astype(dt)
        sl = jax.lax.slice_in_dim(out1, k, k + p, axis=axis)
        out = out + wk[expand] * sl
    return out


def _shear_params(phi: jnp.ndarray, centers: jnp.ndarray, p: int,
                  max_rad: float):
    """Slopes/consts/windows for the 2-shear remainder of the LDU rotation.

    The rotation sampling map R = [[c,-s],[s,c]] factors (LDU about the
    rotation center) as  R = Diag(c, 1/c) . ShY(s*c) . ShX(-s/c)  in pass
    order (leftmost applied first): the diagonal anisotropic scale is FOLDED
    into the stage-A crop matmuls (``_align_prep`` samples the frame at
    x-rate*c / y-rate/c — free, the scale lives in the bilinear weights), so
    rotation itself needs only TWO shear passes instead of the classic three
    (ShX.ShY.ShX). One full-width pass and one interpolation stage fewer:
    ~30% less VPU work and slightly sharper output.

    Consts (translation for rotating about rc = centers, offset e from the
    patch center): with t = (I - R) e,  ShY const = c*ty - s*tx and
    ShX const = tx / c  (composition check in ops/pallas_warp.py docstring).
    """
    cosp, sinp = jnp.cos(phi), jnp.sin(phi)
    cp = (p - 1) / 2.0
    # rotation center offset from the patch center, capped so the static
    # shift windows stay small: |rc - cp| <= 0.1 P (eye centers sit near the
    # face-box center; the residual is a few px of framing shift)
    cap = 0.1 * p
    rcx = jnp.clip(centers[:, 0] - cp, -cap, cap)
    rcy = jnp.clip(centers[:, 1] - cp, -cap, cap)
    # t = (I - R)(rc - cp)
    tx = (1 - cosp) * rcx + sinp * rcy
    ty = -sinp * rcx + (1 - cosp) * rcy
    slope_y = sinp * cosp
    slope_x = -sinp / cosp
    const_y = cosp * ty - sinp * tx
    const_x = tx / cosp
    cmin = math.cos(max_rad)
    smax = math.sin(max_rad)
    tmax = (smax + (1 - cmin)) * cap  # |t| bound
    ky = int(math.ceil(smax * cmin * p / 2 + (1.0 + smax) * tmax)) + 1
    kx = int(math.ceil((smax / cmin) * (p / 2) + tmax / cmin)) + 1
    return slope_y, const_y, slope_x, const_x, ky, kx


def rotate_patches(patches: jnp.ndarray, angles: jnp.ndarray, centers: jnp.ndarray,
                   out_size: int, max_angle_deg: float = 15.0) -> jnp.ndarray:
    """Complete the rotation of D-prescaled patches ([N, P, P, C], see
    ``_shear_params``: stage A already applied Diag(cos, 1/cos) about the
    patch center), then center-crop to out_size. 2-shear, gather-free."""
    n, p = patches.shape[0], patches.shape[1]
    max_rad = math.radians(max_angle_deg)
    phi = jnp.clip(angles, -max_rad, max_rad)
    sy, cy_, sx, cx_, ky, kx = _shear_params(phi, centers, p, max_rad)
    # bf16 through the shear chain: images are 8-bit data and the embedder
    # computes in bf16 anyway; halves the chain's HBM traffic (measured
    # bandwidth-bound at batch >= 16)
    out = patches.astype(jnp.bfloat16)
    out = _shear(out, sy, cy_, -ky, ky, axis=1)
    out = _shear(out, sx, cx_, -kx, kx, axis=2)
    off = (p - out_size) // 2
    return out[:, off : off + out_size, off : off + out_size, :].astype(patches.dtype)


def _align_prep(image: jnp.ndarray, boxes: jnp.ndarray, landmarks: jnp.ndarray,
                out_size: int, pad: float, max_angle_deg: float = 15.0):
    """Stage A + rotation parameters: padded patches [N, P, P, C], eye angle
    [N], rotation centers in patch coords [N, 2].

    Stage A also applies the Diag(cos, 1/cos) factor of the LDU rotation
    decomposition (``_shear_params``): the big box is scaled anisotropically
    about the patch center (x by cos(phi), y by 1/cos(phi)) so the crop
    matmuls resample at the rotated rates for free and the shear chain needs
    only two passes. Rotation centers are reported in the UNSCALED patch
    frame — the shear-pass consts are derived there."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    bw = jnp.maximum(x2 - x1, 1.0)
    bh = jnp.maximum(y2 - y1, 1.0)
    # padded patch so rotation has margin; P static
    p_size = int(round(out_size * (1 + 2 * pad) / 8)) * 8
    extra = (p_size - out_size) / (2.0 * out_size)  # box-relative pad each side
    big = jnp.stack([x1 - extra * bw, y1 - extra * bh, x2 + extra * bw, y2 + extra * bh], axis=-1)

    le, re = landmarks[:, 0], landmarks[:, 1]
    angle = jnp.arctan2(re[:, 1] - le[:, 1], re[:, 0] - le[:, 0])
    # eye center -> patch coords of the UNSCALED big box (the D fold below
    # does not move the patch-center-relative geometry the consts live in)
    ex = ((le[:, 0] + re[:, 0]) / 2 - big[:, 0]) / (big[:, 2] - big[:, 0]) * p_size
    ey = ((le[:, 1] + re[:, 1]) / 2 - big[:, 1]) / (big[:, 3] - big[:, 1]) * p_size
    centers = jnp.stack([ex, ey], axis=-1)

    # fold Diag(c, 1/c) about the patch center cp=(P-1)/2 into the box:
    # sample pos x1 + sx*(cp + c*(q - cp)) == x1' + (sx*c)*q with
    # x1' = x1 + sx*cp*(1-c); crop_resize_matmul derives sx from
    # max(x2-x1, 1.0)/P (clamped so degenerate near-1px folded boxes don't
    # divide to zero) — for such boxes the x scale clamps while y (expanded
    # by 1/cos) does not, so the fold is not exactly Diag(c, 1/c) there;
    # harmless, only garbage/invalid slots hit the clamp. Otherwise
    # x2' = x1' + c*(x2-x1) (and y analogously with 1/c).
    max_rad = math.radians(max_angle_deg)
    cosp = jnp.cos(jnp.clip(angle, -max_rad, max_rad))
    cp = (p_size - 1) / 2.0
    sx = (big[:, 2] - big[:, 0]) / p_size
    sy = (big[:, 3] - big[:, 1]) / p_size
    bx1 = big[:, 0] + sx * cp * (1.0 - cosp)
    by1 = big[:, 1] + sy * cp * (1.0 - 1.0 / cosp)
    big_d = jnp.stack([bx1, by1,
                       bx1 + cosp * (big[:, 2] - big[:, 0]),
                       by1 + (big[:, 3] - big[:, 1]) / cosp], axis=-1)
    # bf16 patches: the rotation chain casts to bf16 as its first step either
    # way (rotate_patches / rotate_patches_pallas), so producing bf16 here is
    # value-identical and halves the [N, P, P, C] write + re-read
    patches = crop_resize_matmul(image, big_d, p_size, out_dtype=jnp.bfloat16)
    return patches, angle, centers


@functools.partial(jax.jit,
                   static_argnames=("out_size", "pad", "max_angle_deg", "out_dtype"))
def align_and_crop_fast(
    image: jnp.ndarray,  # [H, W, C]
    boxes: jnp.ndarray,  # [N, 4] x1y1x2y2
    landmarks: jnp.ndarray,  # [N, 5, 2] (eyes at rows 0, 1)
    out_size: int,
    pad: float = 0.15,
    max_angle_deg: float = 15.0,
    out_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Gather-free counterpart of ops.image.align_and_crop_from: eye-leveling
    rotation + crop + resize, [N, out, out, C]."""
    patches, angle, centers = _align_prep(image, boxes, landmarks, out_size, pad,
                                          max_angle_deg)
    # the reference rotates the image by +angle (leveling eyes); the sampling
    # map is the inverse rotation
    return rotate_patches(patches, angle, centers, out_size,
                          max_angle_deg).astype(out_dtype)


@functools.partial(jax.jit,
                   static_argnames=("out_size", "pad", "max_angle_deg", "use_pallas",
                                    "out_dtype"))
def align_and_crop_fast_batched(
    frames: jnp.ndarray,  # [B, H, W, C]
    boxes: jnp.ndarray,  # [B, F, 4]
    landmarks: jnp.ndarray,  # [B, F, 5, 2]
    out_size: int,
    pad: float = 0.15,
    max_angle_deg: float = 15.0,
    use_pallas: bool | None = None,
    out_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Whole-batch align: per-frame crop matmuls, then ONE flat rotation over
    all B*F patches — on TPU via the VMEM-resident Pallas shear kernel
    (ops/pallas_warp.py; the XLA shear chain re-streams the patch tensor from
    HBM per tap and was the serve step's largest stage at 4 ms/batch-32).
    Returns [B, F, out, out, C]; numerics match the per-frame path to bf16
    rounding."""
    b, f = boxes.shape[0], boxes.shape[1]
    patches, angle, centers = jax.vmap(
        lambda im, bx, lm: _align_prep(im, bx, lm, out_size, pad, max_angle_deg)
    )(frames, boxes, landmarks)
    p_size = patches.shape[2]
    ch = patches.shape[-1]
    flat = patches.reshape(b * f, p_size, p_size, ch)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from facerec_tpu.ops.pallas_warp import rotate_patches_pallas

        rot = rotate_patches_pallas(flat, angle.reshape(-1), centers.reshape(-1, 2),
                                    out_size, max_angle_deg)
    else:
        rot = rotate_patches(flat, angle.reshape(-1), centers.reshape(-1, 2),
                             out_size, max_angle_deg)
    return rot.reshape(b, f, out_size, out_size, ch).astype(out_dtype)
