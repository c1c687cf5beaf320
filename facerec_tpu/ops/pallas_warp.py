"""Pallas 2-shear rotation: the whole shear chain on a VMEM-resident patch.

Why: the XLA shear chain (ops/warp_fast.rotate_patches) is HBM-bound — every
masked slice-add tap streams the full [N, P, P, C] patch tensor from HBM, so
the passes x (slots + fine taps) touch gigabytes at serving shapes
(256 x 208^2 x 3 bf16) — measured 4+ ms at the v5e roofline, ~30% of the
entire serve step. This kernel loads each patch into VMEM ONCE, runs both
two-level shear passes from VMEM, and writes only the center-cropped output:
HBM traffic drops to read-patch + write-crop (~105 MB), leaving pure VPU
work.

The math is IDENTICAL to rotate_patches (same LDU 2-shear decomposition,
same two-level coarse/fine taps, bf16 accumulation): stage-1/stage-2 tap
weights are precomputed per line on the host side of the jit as one-hot /
bilinear weight matrices, so the kernel is nothing but static-slice weighted
sums — no floor/compare/iota inside, which keeps Mosaic lowering trivial.

Decomposition (see warp_fast._shear_params): the rotation sampling map
R = [[c,-s],[s,c]] about the rotation center factors as
R = Diag(c, 1/c) . ShY(s*c) . ShX(-s/c) in pass order; Diag folds into the
stage-A crop matmuls, so this kernel runs only ShY then ShX. Composition
check (passes applied image-chronologically compose left-to-right on
sampling coordinates; offsets d from the patch center, e = rc - cp,
t = (I-R)e):
  ShX: u = (dx - (s/c) dy + tx/c, dy)
  ShY: v = (u_x, dy + (s c) u_x + (c ty - s tx))
  D:   w = (c v_x, v_y / c)
  w_x = c dx - s dy + tx;  w_y = s dx + c dy + ty          (= R d + t)
vs the classic 3-shear ShX(-tan(phi/2)).ShY(sin phi).ShX(-tan(phi/2)): one
full-width x pass and one interpolation stage fewer (~30% less VPU work at
serve shapes, slightly sharper output).

Layout: channels stay interleaved in the lane dimension ([P, P*C]); a shift
of k pixels along x is a static slice at k*C lanes, and x-pass weights vary
only per ROW ([P, 1] broadcasts). y-pass weights vary per column and are
pre-expanded to [*, P*C] on host.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

COARSE = 8  # two-level granularity; must match warp_fast._shear's default


def _pass_bounds(k_lo: int, k_hi: int) -> tuple[int, int, int, int]:
    """Static per-pass constants (slot range and padding), as in _shear."""
    c_lo = math.floor(k_lo / COARSE)
    c_hi = math.floor((k_hi - 1) / COARSE)
    pad_lo = max(-c_lo * COARSE, 0)
    pad_hi = max(c_hi * COARSE + COARSE + 1, 0)
    return c_lo, c_hi, pad_lo, pad_hi


def _line_weights(slope, const, p: int, k_lo: int, k_hi: int):
    """Per-line tap weights for one shear pass: stage-1 coarse one-hot
    [N, P, S] and stage-2 fine bilinear [N, P, COARSE + 1] (f32)."""
    other = jnp.arange(p, dtype=jnp.float32) - (p - 1) / 2.0
    shift = slope[:, None] * other[None, :] + const[:, None]  # [N, P]
    shift = jnp.clip(shift, k_lo, k_hi - 1.0)
    base = jnp.floor(shift)
    frac = shift - base
    c = jnp.floor(base / COARSE)
    r = base - c * COARSE
    c_lo, c_hi, _, _ = _pass_bounds(k_lo, k_hi)
    slots = jnp.arange(c_lo, c_hi + 1, dtype=jnp.float32)
    onehot = (c[..., None] == slots).astype(jnp.float32)  # [N, P, S]
    f = r + frac
    fb = jnp.floor(f)
    ff = f - fb
    ks = jnp.arange(0, COARSE + 1, dtype=jnp.float32)
    fine = (jnp.where(fb[..., None] == ks, 1.0 - ff[..., None], 0.0)
            + jnp.where(fb[..., None] == ks - 1.0, ff[..., None], 0.0))  # [N, P, K+1]
    return onehot, fine


def _rotate_kernel(x_ref, wyc_ref, wyf_ref, wxc_ref, wxf_ref,
                   out_ref, padx, padyb, *, p: int, e: int, c: int,
                   bx: tuple, by: tuple):
    """One patch per grid step; everything below happens in VMEM.

    Crop-aware: the y pass reads the raw patch and produces just the E
    output rows (+COARSE+1 fine halo) the final x pass needs, and the x pass
    produces just the E*C cropped lanes. Scratch zeroing touches only the
    halo strips (the center is overwritten)."""
    cx_lo, cx_hi, px_lo, _ = bx
    cy_lo, cy_hi, py_lo, _ = by
    dt = x_ref.dtype
    off = (p - e) // 2
    padx_w = padx.shape[1] // c
    pady_h = padyb.shape[0]

    # ---- pass 1: y shear on the raw patch -> the E kept rows --------------
    if py_lo:
        padyb[:py_lo, :] = jnp.zeros((py_lo, p * c), dt)
    hi = pady_h - py_lo - p
    if hi:
        padyb[py_lo + p:, :] = jnp.zeros((hi, p * c), dt)
    padyb[py_lo:py_lo + p, :] = x_ref[0]
    wyh = e + COARSE + 1  # rows of the coarse y output the fine taps read
    out1 = jnp.zeros((wyh, p * c), dt)
    for si in range(cy_hi - cy_lo + 1):
        o = (cy_lo + si) * COARSE + py_lo + off
        out1 = out1 + wyc_ref[0, si:si + 1, :].astype(dt) * padyb[o:o + wyh, :]
    x = jnp.zeros((e, p * c), dt)
    for k in range(COARSE + 1):
        x = x + wyf_ref[0, k:k + 1, :].astype(dt) * out1[k:k + e, :]

    # ---- pass 2: x shear on the E kept rows, producing the E*C crop -------
    if px_lo:
        padx[:e, : px_lo * c] = jnp.zeros((e, px_lo * c), dt)
    hi = padx_w - px_lo - p
    if hi:
        padx[:e, (px_lo + p) * c:] = jnp.zeros((e, hi * c), dt)
    padx[:e, px_lo * c:(px_lo + p) * c] = x
    wxx = e + COARSE + 1
    out1 = jnp.zeros((e, wxx * c), dt)
    wcx = wxc_ref[0][off:off + e]
    wfx = wxf_ref[0][off:off + e]
    for si in range(cx_hi - cx_lo + 1):
        o = ((cx_lo + si) * COARSE + px_lo + off) * c
        out1 = out1 + wcx[:, si:si + 1].astype(dt) * padx[:e, o:o + wxx * c]
    out = jnp.zeros((e, e * c), dt)
    for k in range(COARSE + 1):
        out = out + wfx[:, k:k + 1].astype(dt) * out1[:, k * c:(k + e) * c]
    out_ref[0] = out


@functools.partial(jax.jit, static_argnames=("out_size", "max_angle_deg", "interpret"))
def rotate_patches_pallas(patches: jnp.ndarray, angles: jnp.ndarray,
                          centers: jnp.ndarray, out_size: int,
                          max_angle_deg: float = 15.0,
                          interpret: bool = False) -> jnp.ndarray:
    """Drop-in Pallas counterpart of warp_fast.rotate_patches (expects the
    same D-prescaled patches from warp_fast._align_prep).

    patches [N, P, P, C], angles [N], centers [N, 2] -> [N, out, out, C].
    """
    from facerec_tpu.ops.warp_fast import _shear_params

    n, p = patches.shape[0], patches.shape[1]
    ch = patches.shape[3]
    e = out_size
    max_rad = math.radians(max_angle_deg)
    phi = jnp.clip(angles, -max_rad, max_rad)
    slope_y, const_y, slope_x, const_x, ky, kx = _shear_params(
        phi, centers, p, max_rad)

    wyc, wyf = _line_weights(slope_y, const_y, p, -ky, ky)
    wxc, wxf = _line_weights(slope_x, const_x, p, -kx, kx)
    # y-pass weights vary per column: expand pixel -> interleaved lanes and
    # transpose to [N, S, P*C] so the kernel reads [1, PC] rows per slot
    wyc = jnp.repeat(jnp.swapaxes(wyc, 1, 2), ch, axis=-1)  # [N, S, P*C]
    wyf = jnp.repeat(jnp.swapaxes(wyf, 1, 2), ch, axis=-1)

    bx = _pass_bounds(-kx, kx)
    by = _pass_bounds(-ky, ky)
    sx = bx[1] - bx[0] + 1
    sy = by[1] - by[0] + 1
    padx_w = bx[2] + p + bx[3]
    pady_h = by[2] + p + by[3]

    dt = jnp.bfloat16  # matches the bf16 chain in warp_fast.rotate_patches
    flat = patches.reshape(n, p, p * ch).astype(dt)

    out = pl.pallas_call(
        functools.partial(_rotate_kernel, p=p, e=e, c=ch, bx=bx, by=by),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, p, p * ch), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, sy, p * ch), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, COARSE + 1, p * ch), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, p, sx), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, p, COARSE + 1), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, e, e * ch), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, e, e * ch), dt),
        scratch_shapes=[
            pltpu.VMEM((e, padx_w * ch), dt),
            pltpu.VMEM((pady_h, p * ch), dt),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * e * ch * (p * (sy + COARSE + 1) + e * (sx + COARSE + 1)),
            bytes_accessed=n * (p * p * ch + e * e * ch) * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(flat, wyc, wyf, wxc, wxf)
    return out.reshape(n, e, e, ch).astype(patches.dtype)
