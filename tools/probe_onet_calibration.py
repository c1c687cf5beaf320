"""O-Net score-calibration A/B (round-4 VERDICT next #3, second half).

bench.py fills ~380/384 at prob>=0.6 but only ~370-376 at the demo operating
point prob>=0.9 (the reference's DET_THRESH, app.py:18). This probes whether
a post-hoc temperature on the O-Net softmax can lift the 0.6-0.9 band's true
faces above 0.9 without pulling face-free false positives across the gate.

Key identity stated up front so nobody re-derives it later: the O-Net prob
is a 2-class softmax, p = sigmoid(z1 - z0), so temperature scaling is
p_T = sigmoid(logit(p) / T) — a MONOTONE transform of p. Gating p_T >= 0.9
is therefore EXACTLY equivalent to gating p >= sigmoid(T * logit(0.9)):
temperature cannot reorder detections, it can only slide the operating
point along the score ROC. The experiment below measures that ROC on both
sides of it:

  true side — the exact bench frames (rng(0), bit-equal to bench.py via
      diagnose_dark.face_frames_with_gt): matched-detection fill at the
      shifted gate per temperature;
  FP side — 64 face-free frames (32 bench-style dim-noise backgrounds + 32
      photo-style backgrounds from data/synthetic._photo_background, the
      harder domain): valid detections crossing the shifted gate.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_onet_calibration.py
(one process, one backend — check the backend= line; CLAUDE.md trap 7).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.diagnose_dark import face_frames_with_gt, iou_matrix  # noqa: E402

TEMPS = (1.0, 0.9, 0.8, 0.7, 0.6, 0.5)


def shifted_gate(thr: float, temp: float) -> float:
    """p-threshold equivalent to gating sigmoid(logit(p)/T) >= thr."""
    z = np.log(thr / (1.0 - thr))
    return float(1.0 / (1.0 + np.exp(-temp * z)))


def face_free_frames(n: int, frame_hw: tuple[int, int]) -> np.ndarray:
    """Half bench-style dim uniform noise, half photo-style backgrounds."""
    from facerec_tpu.data.synthetic import _photo_background

    h, w = frame_hw
    rng = np.random.default_rng(77)
    out = np.empty((n, h, w, 3), np.float32)
    canvas = max(h, w)
    for i in range(n):
        if i < n // 2:
            out[i] = rng.uniform(0, 80, size=(h, w, 3)).astype(np.float32)
        else:
            bg = _photo_background(rng, canvas)  # [canvas, canvas, 3] in [0,1]
            out[i] = bg[:h, :w] * 255.0
    return out


def main() -> None:
    import jax
    import jax.numpy as jnp

    from facerec_tpu.detect.mtcnn import MTCNN
    from facerec_tpu.detect.weights import load_detector_params

    frame_hw, B, F = (480, 640), 48, 8
    det = MTCNN(frame_hw, min_face_size=40, max_faces=F, k_pnet=64, k_rnet=32,
                dtype=jnp.bfloat16, input_range="255")
    params = load_detector_params()
    print(f"backend={jax.default_backend()} B={B} F={F}")

    # ---- true side: bench frames, matched detections only ------------------
    frames, gt = face_frames_with_gt(B, frame_hw, F, np.random.default_rng(0))
    out = jax.device_get(det.detect(params, jnp.asarray(frames)))
    matched_probs: list[float] = []
    n_gt = 0
    by_frame: dict[int, list[dict]] = {}
    for g in gt:  # gt is a flat list of {"b", "f", "box", ...} dicts
        by_frame.setdefault(int(g["b"]), []).append(g)
    for b in range(B):
        val = np.asarray(out.valid[b], bool)
        boxes = np.asarray(out.boxes[b], np.float32)
        probs = np.asarray(out.probs[b], np.float32)
        used = np.zeros(len(boxes), bool)
        for g in by_frame.get(b, []):
            n_gt += 1
            ious = iou_matrix(np.asarray(g["box"], np.float32), boxes)
            ious = np.where(val & ~used, ious, 0.0)
            j = int(np.argmax(ious))
            if ious[j] >= 0.3 and probs[j] >= 0.6:
                matched_probs.append(float(probs[j]))
                used[j] = True
    mp = np.asarray(matched_probs)

    # ---- FP side: face-free frames ------------------------------------------
    ff = face_free_frames(64, frame_hw)
    fp_probs: list[float] = []
    for i in range(0, 64, B):
        chunk = ff[i : i + B]
        if len(chunk) < B:  # pad to the compiled batch
            chunk = np.concatenate([chunk, np.zeros((B - len(chunk), *ff.shape[1:]),
                                                    np.float32)])
        o = jax.device_get(det.detect(params, jnp.asarray(chunk)))
        for b in range(min(B, 64 - i)):
            val = np.asarray(o.valid[b], bool)
            pr = np.asarray(o.probs[b], np.float32)
            fp_probs.extend(float(p) for p in pr[val & (pr >= 0.5)])
    fp = np.asarray(fp_probs) if fp_probs else np.zeros(0, np.float32)

    # ---- score-band census ---------------------------------------------------
    bands = [(0.6, 0.7), (0.7, 0.8), (0.8, 0.9), (0.9, 1.01)]
    print("\n# score-band census (matched true faces | face-free FPs, 64 frames)")
    for lo, hi in bands:
        t = int(((mp >= lo) & (mp < hi)).sum())
        f = int(((fp >= lo) & (fp < hi)).sum())
        print(f"  [{lo:.1f}, {hi if hi <= 1 else 1.0:>4.1f}): true {t:3d}   fp {f:3d}")

    # ---- temperature sweep (== gate shift; both reported) --------------------
    print("\n# temperature sweep: gate 0.9 on p_T == gate p >= p* on raw scores")
    rows = []
    for T in TEMPS:
        p_star = shifted_gate(0.9, T)
        fill = int((mp >= p_star).sum())
        n_fp = int((fp >= p_star).sum())
        rows.append({"T": T, "equiv_gate": round(p_star, 4),
                     "fill_at_090": fill, "gt": n_gt,
                     "fp_at_090_per_64_facefree": n_fp})
        print(f"  T={T:.1f}  p*={p_star:.3f}  fill {fill}/{n_gt}  "
              f"fp {n_fp}/64-frames")
    print("\n" + json.dumps({"matched_at_06": int(len(mp)), "gt": n_gt,
                             "fp_at_06": int((fp >= 0.6).sum()),
                             "sweep": rows}))


if __name__ == "__main__":
    main()
