"""The serving pipeline: detect -> align -> embed -> match, fused under jit.

This replaces the reference demo's per-frame Python choreography
(app.py:149-264: MTCNN detect, per-face crop, per-face embedding H->D
round-trips, then a per-reference Python distance loop at app.py:50-64) with
ONE compiled program per frame batch: the cascade, the fused affine
align+crop, the batched embedder, and the Pallas gallery top-k all execute on
device with no host round-trips between stages — the BASELINE.json north-star
path ("detect->align->embed->match as one jit pipeline; HBM-resident
gallery").

Batch-stream design: frames are processed in fixed-size batches; each frame
yields up to ``max_faces`` slots (masked). With a mesh (``mesh=`` argument),
throughput scales along the batch axis via the ``data`` axis (GSPMD DP over
detect/align/embed) and along the gallery axis via ``model``: the gallery
matrix is row-sharded (parallel/mesh.py gallery_sharding), each chip runs the
Pallas top-k over its shard under shard_map, and the per-shard winners are
merged exactly with an O(devices*k) all-gather (parallel/collectives.py
global_topk_merge) — SURVEY.md section 2.2 DP + TP rows.
"""

from __future__ import annotations

import functools
import time
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from facerec_tpu.config import ServeConfig
from facerec_tpu.detect.mtcnn import MTCNN, Detections
from facerec_tpu.ops.arcface import l2_normalize
from facerec_tpu.ops.gallery import cosine_to_euclidean, gallery_topk_pallas, gallery_topk_xla
from facerec_tpu.ops.image import align_and_crop_from, bbox_with_margin
from facerec_tpu.ops.warp_fast import align_and_crop_fast_batched
from facerec_tpu.parallel.collectives import global_topk_merge
from facerec_tpu.parallel.mesh import gallery_sharding, replicated
from facerec_tpu.serve.gallery import GalleryStore


class PipelineResult(NamedTuple):
    boxes: jnp.ndarray  # [B, F, 4]
    probs: jnp.ndarray  # [B, F]
    landmarks: jnp.ndarray  # [B, F, 5, 2]
    valid: jnp.ndarray  # [B, F] detection valid & above det threshold
    embeddings: jnp.ndarray  # [B, F, D]
    match_scores: jnp.ndarray  # [B, F, K] cosine similarities
    match_indices: jnp.ndarray  # [B, F, K] gallery rows
    match_distances: jnp.ndarray  # [B, F, K] euclidean (reference operating point)
    is_match: jnp.ndarray  # [B, F] best distance <= recognition threshold


class FacePipeline:
    """End-to-end face recognition over fixed-size frame batches.

    ``embed_fn(images_uint8_float [N, S, S, 3]) -> [N, D]`` is the pluggable
    embedder (ArcFaceNet.embed by default; InceptionResnetV1 when converted
    weights are available — models/facenet.py).
    """

    def __init__(
        self,
        config: ServeConfig,
        frame_hw: tuple[int, int],
        detector: MTCNN,
        detector_params: Any,
        embed_fn: Callable[..., jnp.ndarray],
        embed_dim: int = 512,
        face_margin: float = 0.0,
        embed_variables: Any = None,
        precise_align: bool = False,
        mesh: Mesh | None = None,
    ):
        """``embed_fn``: either ``f(images) -> emb`` (weights closed over) or,
        when ``embed_variables`` is given, ``f(variables, images) -> emb``.
        Prefer the latter: weights passed as jit ARGUMENTS keep the compiled
        program weight-independent, so the persistent compilation cache hits
        across processes (closed-over arrays become inlined HLO constants,
        which both bloats compiles and busts the cache).

        ``mesh``: optional (data, model) mesh. Frames are sharded over
        ``data`` (DP detect/align/embed); the gallery is row-sharded over
        ``model`` with an exact cross-shard top-k merge. Batch size must be a
        multiple of the data-axis size."""
        self.config = config
        self.frame_hw = frame_hw
        self.detector = detector
        self.mesh = mesh
        repl = replicated(mesh) if mesh is not None else None
        self._frame_sharding = (
            NamedSharding(mesh, P("data", None, None, None)) if mesh is not None else None
        )
        gal_shard = None
        if mesh is not None:
            mp = mesh.shape["model"]
            if config.gallery_capacity % max(mp, 1):
                raise ValueError(
                    f"gallery_capacity {config.gallery_capacity} not divisible by "
                    f"model-axis size {mp}")
            gal_shard = gallery_sharding(mesh) if mp > 1 else repl
        # device_put ONCE: weights passed as jit arguments from host numpy
        # would otherwise be re-transferred every call (~2 MB/step through
        # the tunnel dominated a measured benchmark run)
        self.detector_params = jax.device_put(detector_params, repl)
        self.embed_fn = embed_fn
        self.embed_variables = (
            None if embed_variables is None else jax.device_put(embed_variables, repl)
        )
        self.embed_dim = embed_dim
        self.face_margin = face_margin
        self.precise_align = precise_align
        self.gallery = GalleryStore(capacity=config.gallery_capacity, dim=embed_dim,
                                    sharding=gal_shard, dtype=config.gallery_dtype)
        self._step_raw = self._build_step()
        self._step = lambda frames, gallery, count: self._step_raw(
            frames, gallery, count, self.detector_params,
            self.embed_variables if self.embed_variables is not None else ())
        self._packed_step = self._build_packed_step()

    def _build_step(self):
        cfg = self.config
        det = self.detector
        embed_fn = self.embed_fn
        has_vars = self.embed_variables is not None
        margin = self.face_margin
        frame_hw = self.frame_hw
        use_pallas = jax.default_backend() == "tpu"
        mesh = self.mesh
        topk = gallery_topk_pallas if use_pallas else gallery_topk_xla
        if mesh is not None and mesh.shape["model"] > 1:
            # TP match: each chip holds a gallery row-shard; per-shard Pallas
            # top-k then an exact O(devices*k) merge over the model axis.
            mp = mesh.shape["model"]
            shard_rows = cfg.gallery_capacity // mp

            def _local_match(emb_l, gal_l, cnt):
                sid = jax.lax.axis_index("model")
                local_count = jnp.clip(cnt - sid * shard_rows, 0, shard_rows)
                v, i = topk(emb_l, gal_l, local_count, k=cfg.top_k)
                gv, gi, gs = global_topk_merge(v, i, cfg.top_k, axis_name="model")
                return gv, gs * shard_rows + gi

            def match(emb, gallery, count):
                return jax.shard_map(
                    _local_match, mesh=mesh,
                    in_specs=(P("data", None), P("model", None), P()),
                    out_specs=(P("data", None), P("data", None)),
                    check_vma=False,
                )(emb, gallery, count)
        else:
            def match(emb, gallery, count):
                return topk(emb, gallery, count, k=cfg.top_k)

        @jax.jit
        def step(frames: jnp.ndarray, gallery: jnp.ndarray, count: jnp.ndarray,
                 det_params, embed_vars) -> PipelineResult:
            b = frames.shape[0]
            f = cfg.max_faces
            d: Detections = det.detect(det_params, frames)
            valid = d.valid & (d.probs >= cfg.detection_threshold)
            boxes = d.boxes
            if margin > 0:
                boxes = bbox_with_margin(boxes, margin, frame_hw)
            # Sanitize boxes BEFORE the align gather: clamp to the frame and
            # replace invalid slots with a small fixed box. Degenerate boxes
            # from low-confidence slots otherwise scatter the bilinear gathers
            # across the whole frame (measured to dominate pipeline latency).
            h, w = frame_hw
            default_box = jnp.asarray([0.0, 0.0, float(cfg.embed_size), float(cfg.embed_size)])
            x1 = jnp.clip(boxes[..., 0], 0.0, w - 2.0)
            y1 = jnp.clip(boxes[..., 1], 0.0, h - 2.0)
            x2 = jnp.clip(boxes[..., 2], x1 + 1.0, float(w))
            y2 = jnp.clip(boxes[..., 3], y1 + 1.0, float(h))
            boxes = jnp.stack([x1, y1, x2, y2], axis=-1)
            boxes = jnp.where(valid[..., None], boxes, default_box)
            landmarks = jnp.where(valid[..., None, None], d.landmarks,
                                  jnp.asarray([[40.0, 60.0], [120.0, 60.0], [80.0, 90.0],
                                               [50.0, 120.0], [110.0, 120.0]]))
            # fused align (eye landmarks) + crop + resize, one warp per face;
            # the fast path rotates ALL B*F patches in one pallas kernel on
            # TPU (VMEM-resident shear chain, ops/pallas_warp.py)
            if self.precise_align:
                # exact per-pixel gather warp, kept for checkpoint-parity eval
                crops = jax.vmap(
                    lambda img, bx, lm: align_and_crop_from(img, bx, lm, cfg.embed_size)
                )(frames.astype(jnp.float32), boxes, landmarks)
            elif mesh is not None:
                # The Pallas rotate kernel cannot be auto-partitioned by
                # GSPMD, but it is batch-parallel — run the whole fused align
                # per data-shard inside shard_map so mesh serving keeps the
                # VMEM-resident kernel (4.17 -> 2.76 ms standalone vs the XLA
                # shear chain; round-2 VERDICT item #4).
                crops = jax.shard_map(
                    lambda fr, bx, lm: align_and_crop_fast_batched(
                        fr, bx, lm, cfg.embed_size, use_pallas=use_pallas,
                        out_dtype=jnp.bfloat16),
                    mesh=mesh,
                    in_specs=(P("data", None, None, None), P("data", None, None),
                              P("data", None, None, None)),
                    out_specs=P("data", None, None, None, None),
                    check_vma=False,
                )(frames.astype(jnp.float32), boxes, landmarks)
            else:
                # bf16 crops: the rotation kernel computes in bf16 and every
                # embedder in the zoo casts its input to bf16 — handing bf16
                # over halves the crop tensor's write + re-read (the values
                # are identical; the f32 detour added two casts of [B*F, S,
                # S, 3] for nothing)
                crops = align_and_crop_fast_batched(
                    frames.astype(jnp.float32), boxes, landmarks,
                    cfg.embed_size, use_pallas=use_pallas, out_dtype=jnp.bfloat16)
            crops = crops.reshape(b * f, cfg.embed_size, cfg.embed_size, 3)
            emb = embed_fn(embed_vars, crops) if has_vars else embed_fn(crops)  # [B*F, D]
            emb = l2_normalize(emb.astype(jnp.float32))
            scores, idx = match(emb, gallery, count)
            dist = cosine_to_euclidean(scores)
            emb = emb.reshape(b, f, -1)
            scores = scores.reshape(b, f, cfg.top_k)
            idx = idx.reshape(b, f, cfg.top_k)
            dist = dist.reshape(b, f, cfg.top_k)
            is_match = valid & (dist[..., 0] <= cfg.recognition_threshold) & (count > 0)
            return PipelineResult(boxes, d.probs, d.landmarks, valid, emb, scores, idx, dist, is_match)

        return step

    def _build_packed_step(self):
        """Demo-path variant of the step: every host-needed field packed into
        ONE [B, F, 19] f32 tensor so a frame costs ONE host materialization
        (each materialized buffer is a ~30 ms runtime round trip; device_get
        of the full 9-field PipelineResult paid it 9 times per frame).
        Embeddings stay on device; the demo fetches a single [D] row lazily
        when enrolling an unknown face (reference app.py:683-693 flow)."""
        step = self._step_raw

        @jax.jit
        def packed(frames, gallery, count, det_params, embed_vars):
            r = step(frames, gallery, count, det_params, embed_vars)
            b, f = r.probs.shape
            flat = jnp.concatenate([
                r.valid[..., None].astype(jnp.float32),          # 0
                r.probs[..., None].astype(jnp.float32),          # 1
                r.boxes.astype(jnp.float32),                     # 2:6
                r.landmarks.reshape(b, f, 10).astype(jnp.float32),  # 6:16
                r.is_match[..., None].astype(jnp.float32),       # 16
                r.match_indices[..., :1].astype(jnp.float32),    # 17
                r.match_distances[..., :1].astype(jnp.float32),  # 18
            ], axis=-1)
            return flat, r.embeddings

        return packed

    def _upload_frames(self, frames: np.ndarray) -> jnp.ndarray:
        """Host->device frame upload. uint8 frames transfer AS uint8 — 1/4 the
        bytes of the old unconditional float32 cast (3.7 MB -> 0.9 MB per
        480x640 frame) — and are cast to float INSIDE the jit step, which is
        bit-identical to casting on host (integral values are exact in f32).
        Float inputs (e.g. synthetic bench frames with fractional blends)
        keep the float32 path."""
        arr = np.asarray(frames)
        if arr.dtype != np.uint8:
            arr = arr.astype(np.float32, copy=False)
        out = jnp.asarray(arr)
        if self._frame_sharding is not None:
            out = jax.device_put(out, self._frame_sharding)
        return out

    def dispatch_demo(self, frames: np.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Async demo dispatch: upload + enqueue the packed step, return the
        DEVICE buffers (packed [B,F,19], embeddings [B,F,D]) without
        materializing. The demo loop double-buffers on this: frame N+1 is
        dispatched before frame N's packed result is fetched, hiding the
        ~30 ms host round trip behind the next frame's device work
        (round-3 VERDICT item 4)."""
        frames = self._upload_frames(frames)
        return self._packed_step(
            frames, self.gallery.embeddings, self.gallery.count_device,
            self.detector_params,
            self.embed_variables if self.embed_variables is not None else ())

    def process_demo(self, frames: np.ndarray) -> tuple[np.ndarray, jnp.ndarray]:
        """Demo fast path: (packed host [B,F,19], device embeddings [B,F,D])."""
        flat, emb = self.dispatch_demo(frames)
        return np.asarray(jax.device_get(flat)), emb

    def faces_from_packed(self, flat: np.ndarray) -> list[list[dict]]:
        """Decode a packed [B,F,19] tensor into identify()-shaped face dicts
        (without the 'embedding' key; 'slot' carries the face-slot index so
        the caller can fetch the device-resident embedding on demand)."""
        out = []
        for bi in range(flat.shape[0]):
            faces = []
            for fi in range(flat.shape[1]):
                row = flat[bi, fi]
                if row[0] < 0.5:
                    continue
                matched = row[16] >= 0.5
                gi = int(row[17])
                faces.append({
                    "slot": fi,
                    "box": row[2:6].tolist(),
                    "prob": float(row[1]),
                    "landmarks": row[6:16].reshape(5, 2).tolist(),
                    "name": self.gallery.name_of(gi) if matched else "Unknown",
                    "distance": float(row[18]),
                })
            out.append(faces)
        return out

    def process(self, frames: np.ndarray) -> PipelineResult:
        """frames: [B, H, W, 3] uint8/float RGB -> device results. The gallery
        matrix and count stay device-resident (GalleryStore) — nothing but the
        frames transfers per call."""
        return self._step(self._upload_frames(frames), self.gallery.embeddings,
                          self.gallery.count_device)

    def identify(self, frames: np.ndarray) -> list[list[dict]]:
        """Host-friendly results: per frame, a list of face dicts with names
        (the demo's consumption shape, app.py:639-676)."""
        r = jax.device_get(self.process(frames))
        out = []
        for bi in range(r.boxes.shape[0]):
            faces = []
            for fi in range(r.boxes.shape[1]):
                if not r.valid[bi, fi]:
                    continue
                matched = bool(r.is_match[bi, fi])
                gi = int(r.match_indices[bi, fi, 0])
                faces.append({
                    "box": r.boxes[bi, fi].tolist(),
                    "prob": float(r.probs[bi, fi]),
                    "landmarks": r.landmarks[bi, fi].tolist(),
                    "name": self.gallery.name_of(gi) if matched else "Unknown",
                    "distance": float(r.match_distances[bi, fi, 0]),
                    "embedding": np.asarray(r.embeddings[bi, fi]),
                })
            out.append(faces)
        return out

    def benchmark(self, frames: np.ndarray, iters: int = 20) -> dict[str, float]:
        """Steady-state throughput of the full fused pipeline.

        Inputs live on device, and every iteration perturbs the frames with a
        traced salt so each call is a distinct execution — this defeats both
        result caching in the runtime and constant folding (identical-input
        timing was measured to report cache hits, not compute).
        """
        gallery = self.gallery.embeddings
        count = self.gallery.count_device
        step_raw = self._step_raw
        det_params = self.detector_params
        embed_vars = self.embed_variables if self.embed_variables is not None else ()
        # Timing methodology (all of these were measured to matter on the
        # remote-attached TPU runtime):
        #  * distinct device-resident input batches per call — identical
        #    inputs are served from an execution cache (time ~0);
        #  * compute-only via the SLOPE between a short and a long run of
        #    dispatches, materializing only the final scalar — block_until_
        #    ready does not truly block through the runtime, and each host
        #    materialization costs a ~30 ms round trip that would otherwise
        #    contaminate per-call timing.
        iters = min(max(iters, 8), 24)
        rng = np.random.default_rng(1234)
        variants = [
            jnp.asarray(np.asarray(frames, np.float32)
                        + rng.normal(0, 2.0, frames.shape).astype(np.float32))
            for _ in range(iters + 1)
        ]
        if self._frame_sharding is not None:
            variants = [jax.device_put(v, self._frame_sharding) for v in variants]

        @jax.jit
        def stepsum(fr, g, c, dp, ev):
            # the reduction must live INSIDE the jit: an eager .sum() per
            # iteration costs a ~30 ms runtime round trip each
            return step_raw(fr, g, c, dp, ev).match_scores.sum()

        def chain(n: int) -> float:
            t0 = time.perf_counter()
            outs = [
                stepsum(variants[i % len(variants)], gallery, count, det_params, embed_vars)
                for i in range(n)
            ]
            float(outs[-1])  # host materialization = true barrier
            return time.perf_counter() - t0

        float(stepsum(variants[-1], gallery, count, det_params, embed_vars))  # compile + warm
        n_short = max(iters // 4, 2)
        t_short = chain(n_short)
        t_long = chain(iters)
        dt = max((t_long - t_short) / (iters - n_short), 1e-6)
        b = frames.shape[0]
        return {
            "sec_per_batch": dt,
            "frames_per_sec": b / dt,
            "faces_per_sec": b * self.config.max_faces / dt,
        }


    def benchmark_transfer(self, frames: np.ndarray, iters: int = 12) -> dict[str, float]:
        """Transfer-INCLUSIVE throughput: every iteration uploads a fresh host
        uint8 frame batch (the real serving ingestion cost the device-resident
        ``benchmark`` excludes), then runs the fused step; slope-timed like
        ``benchmark``. Frames are quantized to uint8 — the camera-native dtype
        — so the measured upload is the 1-byte/channel fast path.

        Distinct-inputs rule (CLAUDE.md): each upload carries a unique salt
        stamped into one pixel, with ONE persistent cursor across the short
        and long chains so no (content) pair ever repeats."""
        base = np.ascontiguousarray(np.clip(np.asarray(frames), 0, 255).astype(np.uint8))
        gallery = self.gallery.embeddings
        count = self.gallery.count_device
        step_raw = self._step_raw
        det_params = self.detector_params
        embed_vars = self.embed_variables if self.embed_variables is not None else ()

        @jax.jit
        def stepsum(fr, g, c, dp, ev):
            return step_raw(fr, g, c, dp, ev).match_scores.sum()

        cursor = [0]

        def upload():
            # in-place 3-byte salt => distinct content per upload, no copies
            i = cursor[0]
            cursor[0] += 1
            base[0, 0, 0, :] = (i & 0xFF, (i >> 8) & 0xFF, 1)
            x = jnp.asarray(base)
            if self._frame_sharding is not None:
                x = jax.device_put(x, self._frame_sharding)
            return x

        def chain(n: int) -> float:
            t0 = time.perf_counter()
            outs = [stepsum(upload(), gallery, count, det_params, embed_vars)
                    for _ in range(n)]
            float(outs[-1])  # host materialization = true barrier
            return time.perf_counter() - t0

        float(stepsum(upload(), gallery, count, det_params, embed_vars))  # compile+warm
        n_short = max(iters // 4, 2)
        t_short = chain(n_short)
        t_long = chain(iters)
        dt = max((t_long - t_short) / (iters - n_short), 1e-6)
        b = base.shape[0]
        return {
            "sec_per_batch": dt,
            "frames_per_sec": b / dt,
            "faces_per_sec": b * self.config.max_faces / dt,
        }


def calc_iou(box_a, box_b) -> float:
    """IOU for host-side face tracking across frames (reference app.py:126-147)."""
    xa = max(box_a[0], box_b[0])
    ya = max(box_a[1], box_b[1])
    xb = min(box_a[2], box_b[2])
    yb = min(box_a[3], box_b[3])
    inter = max(0.0, xb - xa) * max(0.0, yb - ya)
    area_a = (box_a[2] - box_a[0]) * (box_a[3] - box_a[1])
    area_b = (box_b[2] - box_b[0]) * (box_b[3] - box_b[1])
    denom = area_a + area_b - inter
    return inter / denom if denom > 0 else 0.0


class FaceTracker:
    """IOU-based face-ID tracking across frames (reference app.py:183-246)."""

    def __init__(self, iou_threshold: float = 0.3):
        self.iou_threshold = iou_threshold
        self.prev: list[tuple[int, list[float]]] = []  # (face_id, box)
        self._next_id = 0

    def update(self, boxes: list[list[float]]) -> list[int]:
        ids = []
        used = set()
        for box in boxes:
            best, best_iou = -1, self.iou_threshold
            for fid, pbox in self.prev:
                if fid in used:
                    continue
                iou = calc_iou(box, pbox)
                if iou > best_iou:
                    best, best_iou = fid, iou
            if best < 0:
                best = self._next_id
                self._next_id += 1
            used.add(best)
            ids.append(best)
        self.prev = list(zip(ids, boxes))
        return ids
