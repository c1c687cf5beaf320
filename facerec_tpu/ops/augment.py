"""JAX-native random augmentations (reference data_prep.py:38-48,155-170:
albumentations rotate +-20deg, brightness/contrast +-0.2, scale +-0.1, hflip).

All geometry composes into ONE affine per image (single resampling) and all
randomness is explicit PRNG keys — batched, jit-compiled, reproducible.
Replaces host-side albumentations entirely (SURVEY.md section 2.3 item 3).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from facerec_tpu.ops.image import affine_warp, compose_affine, invert_affine, rotation_matrix


class AugmentParams(NamedTuple):
    rotation_degrees: float = 20.0
    brightness: float = 0.2
    contrast: float = 0.2
    scale: float = 0.1
    horizontal_flip: bool = True
    p_geometry: float = 0.7  # albumentations defaults p=0.7/0.5 in reference
    p_flip: float = 0.5
    p_color: float = 0.7


@functools.partial(jax.jit, static_argnames=("params",))
def augment_batch(key: jax.Array, images: jnp.ndarray, params: AugmentParams = AugmentParams()) -> jnp.ndarray:
    """images [B, H, W, C] float in [0, 1] -> augmented same shape."""
    b, h, w, _ = images.shape
    k_rot, k_scale, k_flip, k_bright, k_contrast, k_prot, k_pflip, k_pcolor = jax.random.split(key, 8)

    angle = jax.random.uniform(k_rot, (b,), minval=-params.rotation_degrees, maxval=params.rotation_degrees)
    scale = 1.0 + jax.random.uniform(k_scale, (b,), minval=-params.scale, maxval=params.scale)
    do_geom = jax.random.uniform(k_prot, (b,)) < params.p_geometry
    angle = jnp.where(do_geom, angle, 0.0)
    scale = jnp.where(do_geom, scale, 1.0)

    center = jnp.broadcast_to(jnp.asarray([(w - 1) / 2.0, (h - 1) / 2.0]), (b, 2))
    rot_fwd = rotation_matrix(center, angle, scale)
    m = invert_affine(rot_fwd)  # out -> in sampling map

    if params.horizontal_flip:
        do_flip = (jax.random.uniform(k_pflip, (b,)) < params.p_flip).astype(jnp.float32)
        sign = 1.0 - 2.0 * do_flip
        zeros = jnp.zeros((b,))
        ones = jnp.ones((b,))
        flip = jnp.stack([
            jnp.stack([sign, zeros, do_flip * (w - 1)], axis=-1),
            jnp.stack([zeros, ones, zeros], axis=-1),
        ], axis=-2)
        m = compose_affine(flip, m)

    out = affine_warp(images, m, (h, w))

    do_color = jax.random.uniform(k_pcolor, (b,)) < params.p_color
    bright = jax.random.uniform(k_bright, (b,), minval=-params.brightness, maxval=params.brightness)
    contrast = 1.0 + jax.random.uniform(k_contrast, (b,), minval=-params.contrast, maxval=params.contrast)
    bright = jnp.where(do_color, bright, 0.0)[:, None, None, None]
    contrast = jnp.where(do_color, contrast, 1.0)[:, None, None, None]
    mean = jnp.mean(out, axis=(1, 2, 3), keepdims=True)
    out = (out - mean) * contrast + mean + bright
    return jnp.clip(out, 0.0, 1.0)


def low_data_variants(key: jax.Array, image: jnp.ndarray, n: int,
                      params: AugmentParams = AugmentParams()) -> jnp.ndarray:
    """N synthetic variants of one image (reference low-data augmentation,
    data_prep.py:353-396: 5 variants when a class has <20 train images)."""
    batch = jnp.broadcast_to(image[None], (n, *image.shape))
    strong = params._replace(p_geometry=1.0, p_color=1.0)
    return augment_batch(key, batch, strong)
