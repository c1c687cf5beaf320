"""Gallery matching: fused cosine-similarity matmul + top-k.

TPU-native replacement for the demo's per-face, per-reference Python distance
loop (reference app.py:50-64 ``compare_faces``): the whole gallery lives in
HBM as one [capacity, D] matrix, queries are matched with a single MXU matmul
and a fused top-k — never materializing the [B, G] score matrix in HBM
(SURVEY.md section 2.3 item 5, BASELINE.json north star).

Two implementations with identical semantics:
  * :func:`gallery_topk_pallas` — tiled Pallas kernel. Grid (batch tiles x
    gallery tiles); each gallery tile is matmul'd in VMEM and merged into a
    running top-k scratch, so HBM traffic is O(B*D + G*D + B*K).
  * :func:`gallery_topk_xla` — jnp matmul + ``lax.top_k`` oracle (CPU tests,
    small galleries, and the autodiff path).

Gallery entries are a valid *prefix* of the capacity (entries are compacted
on host when references are added/removed); ``count`` masks the padding.
Scores are cosine similarities in [-1, 1]; euclidean distance on normalized
embeddings is ``sqrt(2 - 2*cos)`` (used to apply the reference's
``REC_THRESH=1.0`` euclidean operating point, app.py:19). The Pallas kernel
assumes that range: its packed top-k merge clamps scores below -1.9 and
returns values quantized down by at most 2^-18 (~4e-6) — see
``_topk_kernel``. The XLA oracle is exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def gallery_topk_xla(queries: jnp.ndarray, gallery: jnp.ndarray, count: jnp.ndarray | int,
                     k: int = 5) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Oracle: [B, D] x [G, D] -> (top-k scores [B, k], indices [B, k])."""
    scores = jnp.dot(queries.astype(jnp.float32), gallery.astype(jnp.float32).T,
                     preferred_element_type=jnp.float32)
    g = gallery.shape[0]
    valid = jax.lax.broadcasted_iota(jnp.int32, (1, g), 1) < jnp.asarray(count, jnp.int32)
    scores = jnp.where(valid, scores, _NEG)
    return jax.lax.top_k(scores, k)


# Packed (score, lane-index) encoding for the in-kernel top-k merge.
# Cosine scores are shifted into [0.1, 4), scaled by 2^(29 - idx_bits) and
# truncated, then the complemented lane index rides in the low idx_bits —
# one int32 whose integer order IS (score desc, index asc) order. Each
# top-k round is then a single max + mask pass instead of the argmax +
# one-hot gather + sum passes of a value/index pair walk. At the default
# block_g=2048 (idx_bits=11, scale 2^18) returned scores are quantized
# DOWN by at most 2^-18 (~4e-6) — far below bf16 storage rounding and the
# REC_THRESH operating point; ties within one quantum resolve to the lower
# index, matching lax.top_k's tie rule.
def _pack_params(tg: int) -> tuple[int, int, float]:
    idx_bits = max((tg - 1).bit_length(), 1)
    # (4.0 * scale) << idx_bits == 2^31 exactly; v < 4.0 strictly keeps the
    # packed value below 2^31 (sign bit clear)
    return idx_bits, (1 << idx_bits) - 1, float(1 << (29 - idx_bits))


def _topk_kernel(count_ref, q_ref, g_ref, out_v_ref, out_i_ref, topv, topi, *, k: int, tg: int,
                 merge: str = "pair"):
    _IDX_BITS, _IDX_MASK, _SCALE = _pack_params(tg)
    j = pl.program_id(1)
    ng = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        topv[:] = jnp.full_like(topv, _NEG)
        topi[:] = jnp.zeros_like(topi)

    scores = jnp.dot(q_ref[:], g_ref[:].T, preferred_element_type=jnp.float32)  # [TB, TG]
    local = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    valid = (local + j * tg) < count_ref[0]

    # Pack; masked lanes get score-bits 0 (below any valid score's 2.1 shift).
    v = jnp.where(valid, jnp.maximum(scores, -1.9) + 2.0, 0.0)
    packed = ((v * _SCALE).astype(jnp.int32) << _IDX_BITS) | (_IDX_MASK - local)

    # Pair reduction: fold lane l with lane l + tg/2 into (winner, loser)
    # half-width arrays — ONE read of the packed tile. The k extraction
    # rounds then run on the half-width array, with the loser substituted
    # in place whenever its partner wins (elementwise where, no gathers).
    # Exact: every element is either in `a` or shadowed by its pair partner
    # in `a`; a shadowed element can only belong to the top-k if its partner
    # does too (partner > element >= kth-best), and extraction promotes the
    # loser the moment the partner is retired, so it is considered before
    # any later round needs it. Index bits travel inside the packed value,
    # so decoding is unchanged.
    if merge == "pair":
        half = packed.shape[1] // 2
        lo, hi = packed[:, :half], packed[:, half:]
        a = jnp.maximum(lo, hi)  # [TB, TG/2] pair winners
        b = jnp.minimum(lo, hi)  # pair losers, promoted on extraction
    else:  # "flat": k max+mask rounds over the full-width tile (the r4 kernel)
        a, b = packed, None

    # k single-max rounds extract the tile's top-k (descending, _NEG-padded
    # once the valid lanes run out). Packed values are unique per lane, so
    # the == mask retires exactly the winner each round.
    wv, wi = [], []
    for _ in range(k):
        m = jnp.max(a, axis=1)  # [TB]
        win = a == m[:, None]
        if merge == "pair":
            a = jnp.where(win, b, a)
            b = jnp.where(win, -1, b)
        else:
            a = jnp.where(win, -1, a)
        sb = m >> _IDX_BITS
        wv.append(jnp.where(sb == 0, _NEG, sb.astype(jnp.float32) / _SCALE - 2.0))
        wi.append(j * tg + (_IDX_MASK - (m & _IDX_MASK)))

    # Merge the k tile winners with the carried top-k: tiny [TB, 2k] walk.
    vals = jnp.concatenate([topv[:, :k], jnp.stack(wv, axis=1)], axis=1)
    idxs = jnp.concatenate([topi[:, :k], jnp.stack(wi, axis=1)], axis=1)
    sel_cols = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 1)
    new_v, new_i = [], []
    for _ in range(k):
        am = jnp.argmax(vals, axis=1)  # [TB]
        onehot = sel_cols == am[:, None]
        new_v.append(jnp.max(vals, axis=1))
        new_i.append(jnp.sum(jnp.where(onehot, idxs, 0), axis=1))
        vals = jnp.where(onehot, _NEG, vals)
    pad = topv.shape[1] - k
    topv[:] = jnp.pad(jnp.stack(new_v, axis=1), ((0, 0), (0, pad)), constant_values=_NEG)
    topi[:] = jnp.pad(jnp.stack(new_i, axis=1), ((0, 0), (0, pad)))

    @pl.when(j == ng - 1)
    def _():
        out_v_ref[:] = topv[:]
        out_i_ref[:] = topi[:]


@functools.partial(jax.jit, static_argnames=("k", "block_b", "block_g", "interpret", "merge"))
def gallery_topk_pallas(
    queries: jnp.ndarray,  # [B, D]
    gallery: jnp.ndarray,  # [G, D], G multiple of block_g (pad the gallery buffer)
    count: jnp.ndarray | int,  # valid prefix length
    k: int = 5,
    block_b: int = 512,
    block_g: int = 2048,
    interpret: bool = False,
    merge: str = "pair",  # "pair" (half-width extraction) | "flat" (r4 kernel)
) -> tuple[jnp.ndarray, jnp.ndarray]:
    b, d = queries.shape
    g, dg = gallery.shape
    assert d == dg, (d, dg)
    kpad = 128  # lane-aligned top-k scratch; only [:k] is meaningful
    assert k <= kpad
    bb = min(block_b, _round_up(b, 8))
    bp = _round_up(b, bb)
    if bp != b:
        queries = jnp.pad(queries, ((0, bp - b), (0, 0)))
    bg = min(block_g, g)
    assert g % bg == 0, f"gallery capacity {g} must be a multiple of block_g {bg}"
    # idx_bits grows with the tile; the score quantum 2^-(29 - idx_bits)
    # stays <= 2^-15 (3e-5, still far below bf16 storage rounding) up to
    # the 16k-lane cap
    assert bg <= (1 << 14), f"block_g {bg} exceeds the packed index range"
    assert bg % 2 == 0, f"block_g {bg} must be even (pair-reduced top-k merge)"
    count = jnp.asarray(count, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bp // bb, g // bg),
        in_specs=[
            pl.BlockSpec((bb, d), lambda i, j, c: (i, 0)),
            pl.BlockSpec((bg, d), lambda i, j, c: (j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bb, kpad), lambda i, j, c: (i, 0)),
            pl.BlockSpec((bb, kpad), lambda i, j, c: (i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((bb, kpad), jnp.float32),
            pltpu.VMEM((bb, kpad), jnp.int32),
        ],
    )
    # A bf16 gallery sweeps HBM at half the bytes of f32 — the match stage is
    # bandwidth-bound at production scale (131k x 512 f32 = 256 MB/batch).
    # bf16 x bf16 products are exact into the f32 MXU accumulator, so the only
    # precision loss is the one-time storage rounding (~1e-3 on unit-vector
    # cosines — far from the REC_THRESH=1.0 operating point's knife edge).
    in_dtype = jnp.bfloat16 if gallery.dtype == jnp.bfloat16 else jnp.float32
    isz = jnp.dtype(in_dtype).itemsize
    out_v, out_i = pl.pallas_call(
        functools.partial(_topk_kernel, k=k, tg=bg, merge=merge),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bp, kpad), jnp.float32),
            jax.ShapeDtypeStruct((bp, kpad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * g * d,
            bytes_accessed=(bp * d + g * d) * isz + 2 * bp * kpad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(count, queries.astype(in_dtype), gallery.astype(in_dtype))
    return out_v[:b, :k], out_i[:b, :k]


def gallery_topk(queries, gallery, count, k: int = 5, use_pallas: bool | None = None):
    """Dispatch: Pallas on TPU, XLA elsewhere."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        return gallery_topk_pallas(queries, gallery, count, k)
    return gallery_topk_xla(queries, gallery, count, k)


def cosine_to_euclidean(cos: jnp.ndarray) -> jnp.ndarray:
    """Euclidean distance between unit vectors from their cosine similarity."""
    return jnp.sqrt(jnp.maximum(2.0 - 2.0 * cos, 0.0))
