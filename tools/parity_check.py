#!/usr/bin/env python
"""Checkpoint-parity harness (BASELINE.json: embedding cosine error < 1e-3 vs
the reference's PyTorch checkpoints).

Given a reference ``.pth`` checkpoint and its model type, this tool:
  1. converts it to Flax trees (models/convert.py),
  2. runs the same inputs through the torch model (when torch + the reference
     source are importable) and through the converted Flax model,
  3. reports per-image embedding cosine error and logit max-abs error.

Without a torch-side reference available (e.g. torchvision absent), it still
converts the checkpoint and reports the Flax forward statistics plus a
layout self-check — the conversion mechanics themselves are covered by
torch-replica tests in tests/test_convert.py (conv/BN/linear layouts,
CHW-flatten seams, ceil-pooling, PReLU).

Usage:
  python tools/parity_check.py --checkpoint best_model.pth --model-type arcface \
      [--image-dir data/processed/.../test] [--image-size 224]

Reverse mode (--reverse): the END-TO-END ROC-AUC parity measurement
(BASELINE.md target #2). Loads one of OUR trained Flax checkpoints, runs it
through eval/engine.py, reverse-converts the weights into the reference key
layout (models/convert.py flax_to_torch_state_dict), runs the reference's
eval semantics (testing.py:175-177 siamese dist<0.5; :258-269 arcface cosine
logits; :290-312 sklearn ROC-AUC) in torch on the SAME test batches, and
reports prediction agreement + |delta ROC-AUC|.

  python tools/parity_check.py --reverse --model-name arcface_synth \
      --model-type arcface --dataset data/processed/synth16/ds --image-size 160
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def cosine_error(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    a = a / np.linalg.norm(a, axis=-1, keepdims=True)
    b = b / np.linalg.norm(b, axis=-1, keepdims=True)
    return 1.0 - np.sum(a * b, axis=-1)


def load_images(image_dir: str | None, image_size: int, n: int = 16) -> np.ndarray:
    if image_dir:
        from facerec_tpu.data.datasets import ImageFolderIndex, _imagenet_normalize, _load_image

        idx = ImageFolderIndex.build(image_dir)
        imgs = [_load_image(p, image_size) for p in idx.paths[:n]]
        return _imagenet_normalize(np.stack(imgs))
    rng = np.random.default_rng(0)
    return rng.normal(size=(n, image_size, image_size, 3)).astype(np.float32)


def torch_embeddings(checkpoint: str, model_type: str, x_nhwc: np.ndarray) -> np.ndarray | None:
    """Reference-model embeddings; None when the torch side can't be built."""
    try:
        import torch

        sys.path.insert(0, "/root/reference/src")
        import face_models  # type: ignore  # reference module

        model = face_models.get_model(model_type, num_classes=_num_classes(checkpoint, model_type))
        sd = torch.load(checkpoint, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "model_state_dict" in sd:
            sd = sd["model_state_dict"]
        model.load_state_dict(sd)
        model.eval()
        with torch.no_grad():
            t = torch.from_numpy(x_nhwc.transpose(0, 3, 1, 2))
            emb = model.get_embedding(t)
        return emb.numpy()
    except Exception as e:  # torchvision or reference source unavailable
        print(f"[parity] reference source unavailable ({e}); "
              f"falling back to key-compatible torch replicas", file=sys.stderr)
        return replica_embeddings(checkpoint, model_type, x_nhwc)


def replica_embeddings(checkpoint: str, model_type: str, x_nhwc: np.ndarray) -> np.ndarray | None:
    """Torch-side embeddings via tools/torch_replicas.py — modules whose
    state-dict key layout matches the reference's, so a real reference .pth
    loads directly into them (torchvision-free)."""
    try:
        import torch

        sys.path.insert(0, str(Path(__file__).resolve().parent))
        from torch_replicas import REPLICAS

        if model_type not in REPLICAS:
            print(f"[parity] no torch replica for {model_type}", file=sys.stderr)
            return None
        model = REPLICAS[model_type](num_classes=_num_classes(checkpoint, model_type)) \
            if model_type != "siamese" else REPLICAS[model_type]()
        sd = torch.load(checkpoint, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "model_state_dict" in sd:
            sd = sd["model_state_dict"]
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        model.load_state_dict(sd, strict=False)
        model.eval()
        with torch.no_grad():
            t = torch.from_numpy(x_nhwc.transpose(0, 3, 1, 2))
            emb = model.embed(t) if hasattr(model, "embed") else model(t)
        return emb.numpy()
    except Exception as e:
        print(f"[parity] torch replica side failed ({e}); "
              f"reporting conversion-only checks", file=sys.stderr)
        return None


def _num_classes(checkpoint: str, model_type: str) -> int:
    from facerec_tpu.models.convert import load_torch_state_dict

    sd = load_torch_state_dict(checkpoint)
    for key in ("fc2.weight", "resnet.fc.1.weight", "fc.weight", "arcface.weight"):
        if key in sd:
            return sd[key].shape[0]
    return 18


def torch_reference_eval(sd: dict, model_type: str, batches: list[dict],
                         num_classes: int, dist_threshold: float = 0.5) -> dict:
    """Run the reference's eval semantics in torch over preprocessed batches.

    Mirrors /root/reference/src/testing.py: siamese -> pairwise distance,
    pred = (dist < 0.5) (:175-177), ROC from -dist (:293-296); classifiers ->
    softmax/argmax, sklearn ROC-AUC ovr (:289-303); arcface -> cosine logits
    vs normalized class centers (:258-269)."""
    import torch
    import torch.nn.functional as F

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from torch_replicas import REPLICAS

    model = REPLICAS[model_type]() if model_type == "siamese" \
        else REPLICAS[model_type](num_classes=num_classes)
    model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}, strict=True)
    model.eval()

    ys, preds, scores = [], [], []
    with torch.no_grad():
        for b in batches:
            m = b["mask"].astype(bool)
            if model_type == "siamese":
                xa = torch.from_numpy(b["image_a"].transpose(0, 3, 1, 2))
                xb = torch.from_numpy(b["image_b"].transpose(0, 3, 1, 2))
                out1, out2 = model(xa, xb)
                dist = F.pairwise_distance(out1, out2).numpy()[m]
                ys.append(b["pair_label"][m])
                preds.append((dist < dist_threshold).astype(np.int64))
                scores.append(dist)
            else:
                x = torch.from_numpy(b["image"].transpose(0, 3, 1, 2))
                out = model.eval_logits(x) if model_type == "arcface" else model(x)
                probs = F.softmax(out, dim=1).numpy()[m]
                ys.append(b["label"][m])
                preds.append(probs.argmax(1))
                scores.append(probs)

    y = np.concatenate(ys)
    yhat = np.concatenate(preds)
    score = np.concatenate(scores)
    from sklearn import metrics as sk

    if model_type == "siamese":
        fpr, tpr, _ = sk.roc_curve(y, -score)
        roc = float(sk.auc(fpr, tpr))
    else:
        roc = float(sk.roc_auc_score(y, score, multi_class="ovr", average="weighted"))
    return {"y": y, "yhat": yhat, "score": score, "roc_auc": roc,
            "accuracy": float((yhat == y).mean())}


def collect_batches(test_dir: str, model_type: str, batch_size: int, image_size: int):
    """Materialize the exact batch sequence eval/engine.py consumes
    (shuffle=False / fixed_pairs=True => deterministic)."""
    from facerec_tpu.data.datasets import ClassificationBatcher, ImageFolderIndex, SiamesePairBatcher

    index = ImageFolderIndex.build(test_dir)
    if model_type == "siamese":
        batcher = SiamesePairBatcher(index, batch_size, image_size, fixed_pairs=True)
    else:
        batcher = ClassificationBatcher(index, batch_size, image_size, shuffle=False)
    return [{k: np.asarray(v) for k, v in b.items()} for b in batcher.epoch(0)], index


def run_reverse_parity(model_name: str, model_type: str, dataset: str,
                       image_size: int, batch_size: int = 32,
                       checkpoints_root: str | None = None,
                       outputs_root: str | None = None) -> dict:
    """Flax eval (eval/engine.py) vs torch reference-semantics eval of the
    SAME checkpoint on the SAME batches; returns the comparison report."""
    from facerec_tpu.config import CHECKPOINTS_DIR, EvalConfig, OUTPUTS_DIR
    from facerec_tpu.eval.engine import discover_test_dir, evaluate_model
    from facerec_tpu.models.convert import flax_to_torch_state_dict
    from facerec_tpu.train.checkpoints import load_checkpoint

    checkpoints_root = str(checkpoints_root or CHECKPOINTS_DIR)
    outputs_root = str(outputs_root or OUTPUTS_DIR)
    cfg = EvalConfig(model_type=model_type, model_name=model_name, batch_size=batch_size,
                     image_size=image_size, compute_dtype="float32")
    flax_res = evaluate_model(cfg, dataset, checkpoints_root, outputs_root,
                              return_predictions=True)
    fp = flax_res["_predictions"]

    ck = load_checkpoint(Path(checkpoints_root) / model_name)
    tree = {"params": ck["params"], "batch_stats": ck.get("batch_stats") or {}}
    sd = flax_to_torch_state_dict(tree, model_type)

    test_dir = discover_test_dir(dataset)
    batches, index = collect_batches(test_dir, model_type, batch_size, image_size)
    tref = torch_reference_eval(sd, model_type, batches, num_classes=index.num_classes,
                                dist_threshold=cfg.siamese_distance_threshold)

    agree = float((fp["yhat"] == tref["yhat"]).mean())
    d_roc = abs(flax_res["roc_auc"] - tref["roc_auc"])
    return {
        "model_name": model_name,
        "model_type": model_type,
        "n_eval": int(len(fp["y"])),
        "labels_match": bool((fp["y"] == tref["y"]).all()),
        "prediction_agreement": agree,
        "flax_accuracy": flax_res["accuracy"],
        "torch_accuracy": tref["accuracy"],
        "flax_roc_auc": flax_res["roc_auc"],
        "torch_roc_auc": tref["roc_auc"],
        "roc_auc_delta": float(d_roc),
        "pass": bool(agree == 1.0 and d_roc < 1e-3),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint")
    ap.add_argument("--model-type", required=True)
    ap.add_argument("--image-dir", default=None)
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--threshold", type=float, default=1e-3)
    ap.add_argument("--reverse", action="store_true",
                    help="end-to-end parity: OUR checkpoint -> torch reference eval")
    ap.add_argument("--model-name", default=None, help="(reverse) checkpoint dir name")
    ap.add_argument("--dataset", default=None, help="(reverse) imagefolder root with test/")
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--checkpoints-root", default=None)
    ap.add_argument("--outputs-root", default=None)
    args = ap.parse_args()

    if args.reverse:
        report = run_reverse_parity(
            args.model_name or args.model_type, args.model_type, args.dataset,
            args.image_size, args.batch_size, args.checkpoints_root, args.outputs_root)
        print(json.dumps(report, indent=2))
        return 0 if report["pass"] else 1
    if not args.checkpoint:
        ap.error("--checkpoint is required (or use --reverse)")

    from facerec_tpu.models import get_model
    from facerec_tpu.models.convert import convert_checkpoint

    tree = convert_checkpoint(args.checkpoint, args.model_type)
    nc = _num_classes(args.checkpoint, args.model_type)
    model = get_model(args.model_type, num_classes=nc)
    x = load_images(args.image_dir, args.image_size)

    variables = {"params": tree["params"]}
    if tree.get("batch_stats"):
        variables["batch_stats"] = tree["batch_stats"]
    flax_emb = np.asarray(model.apply(variables, x, method="embed"))

    report = {
        "checkpoint": args.checkpoint,
        "model_type": args.model_type,
        "num_classes": nc,
        "num_images": len(x),
        "flax_embedding_shape": list(flax_emb.shape),
        "flax_embedding_finite": bool(np.isfinite(flax_emb).all()),
    }
    torch_emb = torch_embeddings(args.checkpoint, args.model_type, x)
    if torch_emb is not None:
        err = cosine_error(flax_emb, torch_emb)
        report.update({
            "cosine_error_max": float(err.max()),
            "cosine_error_mean": float(err.mean()),
            "pass": bool(err.max() < args.threshold),
            "threshold": args.threshold,
        })
    print(json.dumps(report, indent=2))
    return 0 if report.get("pass", True) else 1


if __name__ == "__main__":
    raise SystemExit(main())
