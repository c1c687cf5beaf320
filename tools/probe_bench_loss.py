"""Pin the residual bench slot losses with evidence (round-4 VERDICT #5).

bench.py fills 379-383 of 384 rendered faces at prob>=0.6; README attributes
the losses to "adjacent-face NMS slot merges and off-box near-misses" with
no probe backing it — the same unverified-diagnosis shape that produced the
round-3 "contrast floor" error. This tool renders the EXACT bench frames
(bit-equal: bench.py draws them first from rng(0), matching
diagnose_dark.face_frames_with_gt) and, for every ground-truth face with no
matching detection (IoU>=0.3 at prob>=0.6), traces the candidate chain
through the served cascade stage by stage:

  stage1 — best-IoU P-Net candidate among the k_rnet survivors (score, valid)
  rnet   — R-Net score of that candidate, threshold pass, whether it survived
           the stage-2 NMS into the rnet_keep budget; if suppressed, WHICH
           surviving box ate it and whether that box covers a DIFFERENT
           ground-truth face (a true two-faces-one-slot merge) or drifted
           off both (an off-box regression miss)
  onet   — O-Net score, threshold pass, demote_nested effect, final-NMS fate

The stepwise re-execution is validated against det.detect()'s own output on
the probed frame (the probe cannot drift from the served program). A second
section lists every face matched at 0.6 but NOT at the demo operating point
0.9 (reference app.py:18 DET_THRESH) with its O-Net score — the input for
any score-calibration attempt (VERDICT #3).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_bench_loss.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.diagnose_dark import face_frames_with_gt, iou_matrix  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from facerec_tpu.detect.mtcnn import (
        MTCNN, _apply_regression, _pad_slots, _square, demote_nested)
    from facerec_tpu.detect.weights import load_detector_params
    from facerec_tpu.ops.nms import nms
    from facerec_tpu.ops.warp_fast import crop_resize_matmul

    frame_hw, B, F = (480, 640), 48, 8
    det = MTCNN(frame_hw, min_face_size=40, max_faces=F, k_pnet=64, k_rnet=32,
                dtype=jnp.bfloat16, input_range="255")
    params = load_detector_params()
    rng = np.random.default_rng(0)
    frames, gt = face_frames_with_gt(B, frame_hw, F, rng)
    fj = jnp.asarray(frames)

    out = jax.device_get(det.detect(params, fj))
    print(f"# backend={jax.default_backend()} "
          f"fill@0.6={int(((out.probs >= 0.6) & out.valid).sum())}/{B*F} "
          f"fill@0.9={int(((out.probs >= 0.9) & out.valid).sum())}/{B*F}",
          file=sys.stderr)

    def matched(g, thr):
        iou = iou_matrix(g["box"], out.boxes[g["b"]])
        return bool(((iou >= 0.3) & (out.probs[g["b"]] >= thr)).any())

    missed = [g for g in gt if not matched(g, 0.6)]
    gap = [g for g in gt if matched(g, 0.6) and not matched(g, 0.9)]

    # ---- stepwise cascade re-execution for the missed faces' frames --------
    stage1 = jax.jit(lambda p, x: det.stage1(p, x))
    rnet = jax.jit(lambda p, x, bx: det.rnet.apply(
        {"params": p["rnet"]}, det.rnet_crops(x, bx).reshape(-1, 24, 24, 3)))
    onet = jax.jit(lambda p, x, bx: det.onet.apply(
        {"params": p["onet"]},
        jax.vmap(lambda im, b2: crop_resize_matmul(
            im, b2, 48, out_dtype=det.dtype))(x, bx).reshape(-1, 48, 48, 3)))

    def gt_of_frame(b):
        return [g for g in gt if g["b"] == b]

    def suppressor_info(cand_box, survivors_boxes, survivors_valid, frame_gts, gt_box):
        """Which surviving box overlaps the lost candidate most, and does it
        cover a DIFFERENT ground-truth face?"""
        vb = survivors_boxes[np.asarray(survivors_valid, bool)]
        if vb.shape[0] == 0:
            return None
        ious = iou_matrix(cand_box, vb)
        j = int(np.argmax(ious))
        sup = vb[j]
        covers = []
        for g2 in frame_gts:
            if iou_matrix(g2["box"], sup[None])[0] >= 0.3:
                covers.append(g2["f"])
        area = lambda b: max(b[2] - b[0], 0.0) * max(b[3] - b[1], 0.0)
        return {"iou_with_candidate": round(float(ious[j]), 3),
                "iou_with_gt": round(float(iou_matrix(gt_box, sup[None])[0]), 3),
                # outer/inner area ratio: demote_nested fires at >= its
                # part_ratio floor — this says where the failing pair sits
                "area_ratio_sup_over_cand": round(
                    float(area(sup) / max(area(cand_box), 1e-6)), 2),
                "covers_gt_faces": covers}

    for m in missed:
        b = int(m["b"])
        gtb = np.asarray(m["box"], np.float32)
        fgts = gt_of_frame(b)
        xn = det.normalize(fj[b : b + 1])
        rec: dict = {"b": b, "f": m["f"], "lum": round(m["lum"], 3),
                     "size": m["size"], "gt_box": [round(v, 1) for v in m["box"]]}

        s1b, s1s, s1v = jax.device_get(stage1(params, xn))
        iou1 = iou_matrix(gtb, s1b[0])
        c = int(np.argmax(iou1 * s1v[0]))  # best among VALID candidates
        rec["stage1"] = {"best_iou": round(float(iou1[c]), 3),
                         "pnet_score": round(float(s1s[0, c]), 3),
                         "valid": bool(s1v[0, c]),
                         "covered": bool((iou1 >= 0.3)[s1v[0].astype(bool)].any())}

        rp, rreg = jax.device_get(rnet(params, xn, jnp.asarray(s1b)))
        rp = rp.reshape(1, det.k_rnet)
        rreg = rreg.reshape(1, det.k_rnet, 4)
        rboxes = np.asarray(jax.device_get(
            _apply_regression(jnp.asarray(s1b), jnp.asarray(rreg))))
        rvalid = s1v & (rp > det.thresholds[1])
        iou2 = iou_matrix(gtb, rboxes[0])
        c2 = int(np.argmax(iou2 * rvalid[0]))
        rk = det.rnet_keep
        fb, fs, fv, _ = jax.device_get(jax.vmap(
            lambda bb, ss, vv: nms(bb, ss, vv, det.rnet_nms_iou, "union", rk)
        )(jnp.asarray(rboxes), jnp.asarray(rp), jnp.asarray(rvalid)))
        fb, fs, fv = map(np.asarray, jax.device_get(_pad_slots(
            jnp.asarray(fb), jnp.asarray(fs), jnp.asarray(fv), rk)))
        cov_after = bool((iou_matrix(gtb, fb[0]) >= 0.3)[fv[0].astype(bool)].any()) \
            if fv[0].any() else False
        rec["rnet"] = {"best_iou_pre_nms": round(float(iou2[c2]), 3),
                       "score": round(float(rp[0, c2]), 4),
                       "passed_thr": bool(rvalid[0, c2]),
                       "survived_nms": cov_after}
        if rvalid[0, c2] and iou2[c2] >= 0.3 and not cov_after:
            rec["rnet"]["suppressor"] = suppressor_info(
                rboxes[0, c2], fb[0], fv[0], fgts, gtb)

        # large quota + square (mirror _stages23)
        if det.k_large > 0:
            side = np.maximum(rboxes[..., 2] - rboxes[..., 0],
                              rboxes[..., 3] - rboxes[..., 1])
            large = s1v & (rp > det.large_rnet_threshold) & (
                side >= 0.5 * min(*frame_hw))
            lb, ls, lv, _ = jax.device_get(jax.vmap(
                lambda bb, ss, vv: nms(bb, ss, vv, 0.7, "union", det.k_large)
            )(jnp.asarray(rboxes), jnp.asarray(rp), jnp.asarray(large)))
            lb, ls, lv = map(np.asarray, jax.device_get(_pad_slots(
                jnp.asarray(lb), jnp.asarray(ls), jnp.asarray(lv), det.k_large)))
            boxes3 = np.concatenate([fb, lb], axis=1)
            valid3 = np.concatenate([fv, lv], axis=1)
        else:
            boxes3, valid3 = fb, fv
        boxes3 = np.asarray(jax.device_get(_square(jnp.asarray(boxes3))))

        op, oreg, olmk = jax.device_get(onet(params, xn, jnp.asarray(boxes3)))
        ns = boxes3.shape[1]
        op = op.reshape(1, ns)
        oreg = oreg.reshape(1, ns, 4)
        ovalid = valid3 & (op > det.thresholds[2])
        obox = np.asarray(jax.device_get(
            _apply_regression(jnp.asarray(boxes3), jnp.asarray(oreg))))
        iou3_pre = iou_matrix(gtb, boxes3[0])
        c3 = int(np.argmax(iou3_pre * valid3[0]))
        op_eff = demote_nested(jnp.asarray(obox), jnp.asarray(op), jnp.asarray(ovalid),
                               det.part_ratio) if det.prefer_whole else jnp.asarray(op)
        fb3, _, fv3, idx3 = jax.device_get(jax.vmap(
            lambda bb, ss, vv: nms(bb, ss, vv, 0.7, "min", F)
        )(jnp.asarray(obox), op_eff, jnp.asarray(ovalid)))
        fprob = np.where(fv3, np.take_along_axis(op, np.asarray(idx3), axis=1), 0.0)
        iou_fin = iou_matrix(gtb, fb3[0])
        rec["onet"] = {"best_iou_pre_final": round(float(iou_matrix(gtb, obox[0])[c3]), 3),
                       "score": round(float(op[0, c3]), 4),
                       "passed_thr": bool(ovalid[0, c3]),
                       "demoted": bool(np.asarray(op_eff)[0, c3] < op[0, c3] - 1e-6),
                       "final_cover": bool(((iou_fin >= 0.3) & fv3[0] & (fprob[0] >= 0.6)).any())}
        if ovalid[0, c3] and iou_matrix(gtb, obox[0])[c3] >= 0.3 \
                and not rec["onet"]["final_cover"]:
            rec["onet"]["suppressor"] = suppressor_info(
                obox[0, c3], fb3[0], fv3[0] & (fprob[0] >= 0.6), fgts, gtb)

        # consistency: stepwise final must agree with det.detect on coverage
        rec["stepwise_matches_served"] = (
            rec["onet"]["final_cover"] == matched(m, 0.6))
        # verdict classification
        if not rec["stage1"]["covered"]:
            rec["verdict"] = ("pnet_no_candidate" if rec["stage1"]["best_iou"] < 0.3
                              else "stage1_rank_starved_or_gated")
        elif not rec["rnet"]["passed_thr"] and rec["rnet"]["best_iou_pre_nms"] >= 0.3:
            rec["verdict"] = "rnet_score_below_threshold"
        elif not rec["rnet"]["survived_nms"]:
            sup = rec["rnet"].get("suppressor") or {}
            rec["verdict"] = ("rnet_nms_slot_merge" if sup.get("covers_gt_faces")
                              else "rnet_rank_or_offbox")
        elif not rec["onet"]["passed_thr"]:
            rec["verdict"] = "onet_score_below_threshold"
        elif not rec["onet"]["final_cover"]:
            sup = rec["onet"].get("suppressor") or {}
            rec["verdict"] = ("final_nms_slot_merge" if sup.get("covers_gt_faces")
                              else "final_rank_or_offbox")
        else:
            rec["verdict"] = "stepwise_found_it (served/stepwise numeric divergence)"
        print(json.dumps(rec))

    # ---- the 0.6 -> 0.9 calibration gap ------------------------------------
    print(f"\n# faces matched at 0.6 but not 0.9: {len(gap)}", file=sys.stderr)
    for g in gap:
        iou = iou_matrix(g["box"], out.boxes[g["b"]])
        j = int(np.argmax(iou * (out.probs[g["b"]] >= 0.6)))
        print(json.dumps({"gap": True, "b": g["b"], "f": g["f"],
                          "lum": round(g["lum"], 3), "size": g["size"],
                          "onet_prob": round(float(out.probs[g["b"]][j]), 4),
                          "iou": round(float(iou[j]), 3)}))


if __name__ == "__main__":
    main()
