"""TPU ops: Pallas kernels and fused XLA image/math primitives."""

from facerec_tpu.ops.arcface import arc_margin_logits, cosine_logits, l2_normalize
from facerec_tpu.ops.augment import AugmentParams, augment_batch, low_data_variants
from facerec_tpu.ops.gallery import (
    cosine_to_euclidean, gallery_topk, gallery_topk_pallas, gallery_topk_xla,
)
from facerec_tpu.ops.image import (
    affine_warp, align_and_crop, align_and_crop_from, bbox_with_margin,
    crop_and_resize, crop_and_resize_from, resize_bilinear,
)
from facerec_tpu.ops.nms import nms, overlap_matrix

__all__ = [
    "arc_margin_logits", "cosine_logits", "l2_normalize",
    "AugmentParams", "augment_batch", "low_data_variants",
    "cosine_to_euclidean", "gallery_topk", "gallery_topk_pallas", "gallery_topk_xla",
    "affine_warp", "align_and_crop", "align_and_crop_from", "bbox_with_margin",
    "crop_and_resize", "crop_and_resize_from", "resize_bilinear",
    "nms", "overlap_matrix",
]
