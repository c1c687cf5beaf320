"""Evaluation engine — `evaluate_model` / `predict_image`
(reference testing.py:26-595).

Batched, jit-compiled inference with per-batch latency measurement (the
reference's only performance metric — testing.py:163-178), the full metric
suite (accuracy / weighted P/R/F1 / ROC-AUC / PR-AUC — :290-312), ROC/PR
curve CSV export (:415-437), the siamese person-by-person recognition-rate
matrix (:439-501), and the corrected ArcFace eval path (cosine logits vs
class centers; see ops/arcface.py docstring for the defect we do not copy).
"""

from __future__ import annotations

import csv
import itertools
import json
import time
from pathlib import Path
from typing import Any

import jax
import numpy as np

from facerec_tpu.config import CHECKPOINTS_DIR, EvalConfig, OUTPUTS_DIR, PROC_DATA_DIR, logger
from facerec_tpu.data.datasets import ClassificationBatcher, ImageFolderIndex, SiamesePairBatcher, _imagenet_normalize, _load_image
from facerec_tpu.eval import metrics as M
from facerec_tpu.models import get_model
from facerec_tpu.parallel.mesh import build_mesh, shard_params
from facerec_tpu.train.checkpoints import load_checkpoint


def discover_test_dir(dataset_path: str | Path | None = None) -> Path:
    """Find a test split under the processed-data tree (reference
    testing.py:41-67 handles nested config/dataset layouts)."""
    if dataset_path is not None:
        p = Path(dataset_path)
        if (p / "test").exists():
            return p / "test"
        if p.name == "test" and p.exists():
            return p
    base = PROC_DATA_DIR
    candidates = sorted(base.glob("**/test"))
    if not candidates:
        raise FileNotFoundError(f"no test split found under {base}")
    return candidates[0]


def _load_model_for_eval(model_type: str, model_name: str, num_classes: int, config: EvalConfig,
                         checkpoints_root: Path):
    model_dir = checkpoints_root / model_name
    ck = load_checkpoint(model_dir)  # best -> final fallback
    model = get_model(model_type, num_classes=num_classes, compute_dtype=config.compute_dtype)
    variables = {"params": ck["params"]}
    if ck.get("batch_stats"):
        variables["batch_stats"] = ck["batch_stats"]
    return model, variables, model_dir, ck.get("metadata", {})


def evaluate_model(
    config: EvalConfig,
    dataset_path: str | Path | None = None,
    checkpoints_root: str | Path | None = None,
    outputs_root: str | Path | None = None,
    model=None,
    variables=None,
    return_predictions: bool = False,
) -> dict[str, Any]:
    """Evaluate a trained model on a test split; writes the reference's
    artifact set and returns the metrics dict.

    ``return_predictions`` keeps the per-image arrays (``_predictions``:
    labels / argmax / probs, or pair labels / distances for siamese) in the
    returned dict — used by the end-to-end torch parity harness
    (tools/parity_check.py --reverse). Never serialized to JSON."""
    checkpoints_root = Path(checkpoints_root or CHECKPOINTS_DIR)
    outputs_root = Path(outputs_root or OUTPUTS_DIR)
    test_dir = discover_test_dir(dataset_path)
    index = ImageFolderIndex.build(test_dir)
    model_type = config.model_type
    model_name = config.model_name or model_type

    if model is None or variables is None:
        model, variables, _, _ = _load_model_for_eval(
            model_type, model_name, index.num_classes, config, checkpoints_root)

    mesh = build_mesh()
    variables = shard_params(variables, mesh)
    out_dir = outputs_root / model_name
    out_dir.mkdir(parents=True, exist_ok=True)

    results: dict[str, Any]
    if model_type == "siamese":
        results = _evaluate_siamese(model, variables, index, config, mesh, out_dir)
    else:
        results = _evaluate_classifier(model, variables, index, config, mesh, out_dir, model_type)

    predictions = results.pop("_predictions", None)
    results["model_name"] = model_name
    results["model_type"] = model_type
    results["test_dir"] = str(test_dir)
    results["num_test_images"] = len(index)
    (out_dir / f"{model_type}_results.json").write_text(json.dumps(results, indent=2, default=str))
    _write_experiment_summary(out_dir, results)
    logger.info("[eval %s] acc=%.4f f1=%.4f roc_auc=%s %.2fms/batch",
                model_name, results["accuracy"], results["f1"],
                f"{results.get('roc_auc', float('nan')):.4f}",
                results["avg_inference_time_ms"])
    if return_predictions and predictions is not None:
        results["_predictions"] = predictions
    return results


def _eval_batches(apply_fn, batcher, mesh, keep: list, keep_max: int = 8):
    """Yield (host_outputs, host_batch) for the metric pass; stash up to
    ``keep_max`` device-resident batches in ``keep`` for the separate latency
    measurement (no per-batch timing here — see _slope_latency_ms)."""
    from facerec_tpu.data.pipeline import prefetch_to_device

    for batch in prefetch_to_device(batcher.epoch(0), mesh):
        if len(keep) < keep_max:
            keep.append(batch)
        out = apply_fn(batch)
        yield jax.device_get(out), jax.device_get(batch)


def _slope_latency_ms(apply_fn, batches, image_key: str, iters: int = 12) -> float:
    """Honest per-batch inference latency (reference metric shape
    testing.py:163-178) via the repo's only trustworthy method on the
    remote-attached runtime (CLAUDE.md measurement traps; same scheme as
    serve/pipeline.benchmark):
      * distinct inputs per call — a traced per-iteration salt perturbs the
        image tensor, since identical-input executions are served from a
        cache and time ~0 (trap #1);
      * the reduction lives INSIDE the jit and only the final scalar is
        materialized with float() — jax.block_until_ready does not truly
        block through the runtime (trap #2: an embed pass once "timed" at an
        impossible 785 TFLOP/s), and each materialization costs ~30 ms;
      * the reported time is the SLOPE between a short and a long dispatch
        chain, cancelling the fixed chain overhead."""
    if not batches:
        return float("nan")

    @jax.jit
    def stepsum(batch, salt):
        b = dict(batch)
        b[image_key] = b[image_key] + salt * 1e-4
        out = apply_fn(b)
        return jax.tree_util.tree_reduce(
            lambda a, x: a + x.astype(jax.numpy.float32).sum(), out, 0.0)

    # The salt cursor persists ACROSS chains: restarting it per chain would
    # re-issue the short chain's exact (batch, salt) pairs at the head of the
    # long chain, and those repeats are served from the execution cache
    # (trap #1 again), skewing the slope ~33% optimistic at iters=12.
    cursor = itertools.count(1)

    def chain(n: int) -> float:
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            i = next(cursor)
            out = stepsum(batches[i % len(batches)], float(i))
        float(out)  # host materialization = the one true barrier
        return time.perf_counter() - t0

    float(stepsum(batches[0], 0.0))  # compile + warm
    n_short = max(iters // 4, 2)
    t_short = chain(n_short)
    t_long = chain(iters)
    return 1000.0 * max((t_long - t_short) / (iters - n_short), 1e-9)


def _evaluate_classifier(model, variables, index, config, mesh, out_dir, model_type):
    @jax.jit
    def apply_fn(batch):
        if model_type == "arcface":
            logits = model.apply(variables, batch["image"], labels=batch["label"])
        else:
            logits = model.apply(variables, batch["image"])
        return jax.nn.softmax(logits.astype(jax.numpy.float32), axis=-1)

    batcher = ClassificationBatcher(index, config.batch_size, config.image_size, shuffle=False)
    all_probs, all_labels, kept = [], [], []
    n_batches = 0
    for probs, batch in _eval_batches(apply_fn, batcher, mesh, kept):
        m = batch["mask"].astype(bool)
        all_probs.append(probs[m])
        all_labels.append(batch["label"][m])
        n_batches += 1
    probs = np.concatenate(all_probs)
    y = np.concatenate(all_labels)
    yhat = probs.argmax(1)
    ms_per_batch = _slope_latency_ms(apply_fn, kept, "image")

    prec, rec, f1 = M.precision_recall_f1(y, yhat, "weighted")
    results = {
        "accuracy": M.accuracy(y, yhat),
        "precision": prec,
        "recall": rec,
        "f1": f1,
        "roc_auc": M.roc_auc_ovr(y, probs, "weighted"),
        "pr_auc": M.pr_auc_ovr(y, probs),
        "avg_inference_time_ms": ms_per_batch,
        "throughput_imgs_per_sec": float(
            (len(y) / max(n_batches, 1)) / max(ms_per_batch / 1000.0, 1e-9)),
        "calibration": M.expected_calibration_error(y, probs),
        "per_class": M.per_class_metrics(y, yhat, probs, index.class_names),
        "confusion": M.enhanced_confusion_matrix(y, yhat, index.class_names),
        "_predictions": {"y": y, "yhat": yhat, "probs": probs},
    }
    # ROC/PR curve CSVs, per class (reference testing.py:415-437)
    _write_curves_csv(out_dir, y, probs, index.class_names)
    return results


def _evaluate_siamese(model, variables, index, config, mesh, out_dir):
    @jax.jit
    def apply_fn(batch):
        ea, eb = model.apply(variables, batch["image_a"], batch["image_b"])
        return jax.numpy.sqrt(jax.numpy.maximum(jax.numpy.sum((ea - eb) ** 2, -1), 1e-24))

    batcher = SiamesePairBatcher(index, config.batch_size, config.image_size, fixed_pairs=True)
    dists, ys, la, lb, kept = [], [], [], [], []
    n_batches = 0
    for dist, batch in _eval_batches(apply_fn, batcher, mesh, kept):
        m = batch["mask"].astype(bool)
        dists.append(dist[m])
        ys.append(batch["pair_label"][m])
        la.append(batch["label_a"][m])
        lb.append(batch["label_b"][m])
        n_batches += 1
    ms_per_batch = _slope_latency_ms(apply_fn, kept, "image_a")
    dist = np.concatenate(dists)
    y = np.concatenate(ys)
    la = np.concatenate(la)
    lb = np.concatenate(lb)
    yhat = (dist < config.siamese_distance_threshold).astype(np.int64)

    prec, rec, f1 = M.precision_recall_f1(y, yhat, "weighted")
    fpr, tpr, _ = M.roc_curve(y, -dist)  # reference: roc_curve(targets, -distance)
    results = {
        "accuracy": M.accuracy(y, yhat),
        "precision": prec,
        "recall": rec,
        "f1": f1,
        "roc_auc": M.auc(fpr, tpr),
        "pr_auc": M.average_precision(y, -dist),
        "same_accuracy": M.accuracy(y[y == 1], yhat[y == 1]),
        "diff_accuracy": M.accuracy(y[y == 0], yhat[y == 0]),
        "avg_inference_time_ms": ms_per_batch,
        "throughput_pairs_per_sec": float(
            (len(y) / max(n_batches, 1)) / max(ms_per_batch / 1000.0, 1e-9)),
        "distance_threshold": config.siamese_distance_threshold,
        "_predictions": {"y": y, "yhat": yhat, "dist": dist},
    }
    # verification ROC curve CSV
    with (out_dir / "roc_curve.csv").open("w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["fpr", "tpr"])
        w.writerows(zip(fpr.tolist(), tpr.tolist()))

    # person-by-person recognition-rate matrix (reference testing.py:439-501)
    names = index.class_names
    n = len(names)
    correct = np.zeros((n, n))
    total = np.zeros((n, n))
    for d, t, a, b in zip(dist, y, la, lb):
        pred_same = d < config.siamese_distance_threshold
        ok = int(pred_same == bool(t))
        correct[a, b] += ok
        correct[b, a] += ok
        total[a, b] += 1
        total[b, a] += 1
    with np.errstate(invalid="ignore"):
        rate = np.where(total > 0, correct / np.maximum(total, 1), np.nan)
    with (out_dir / "person_recognition_matrix.csv").open("w", newline="") as f:
        w = csv.writer(f)
        w.writerow([""] + names)
        for i, nm in enumerate(names):
            w.writerow([nm] + [f"{rate[i, j]:.3f}" if total[i, j] else "" for j in range(n)])
    per_person = {
        names[i]: float(np.nansum(correct[i]) / max(np.nansum(total[i]), 1)) for i in range(n)
    }
    with (out_dir / "per_person_accuracy.csv").open("w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["person", "accuracy"])
        w.writerows(per_person.items())
    results["per_person_accuracy"] = per_person
    return results


def _write_curves_csv(out_dir: Path, y: np.ndarray, probs: np.ndarray, names: list[str]) -> None:
    with (out_dir / "roc_curves.csv").open("w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["class", "fpr", "tpr"])
        for c, name in enumerate(names):
            mask = y == c
            if mask.any() and (~mask).any():
                fpr, tpr, _ = M.roc_curve(mask, probs[:, c])
                for a, b in zip(fpr, tpr):
                    w.writerow([name, a, b])
    with (out_dir / "pr_curves.csv").open("w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["class", "precision", "recall"])
        for c, name in enumerate(names):
            mask = y == c
            if mask.any():
                prec, rec, _ = M.precision_recall_curve(mask, probs[:, c])
                for a, b in zip(prec, rec):
                    w.writerow([name, a, b])


def _write_experiment_summary(out_dir: Path, results: dict) -> None:
    """experiment_summary.json append (reference testing.py:345-394)."""
    path = out_dir / "experiment_summary.json"
    history = json.loads(path.read_text()) if path.exists() else []
    entry = {k: v for k, v in results.items()
             if isinstance(v, (int, float, str)) and not isinstance(v, bool)}
    entry["timestamp"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    history.append(entry)
    path.write_text(json.dumps(history, indent=2))


def predict_image(
    image_path: str | Path,
    config: EvalConfig,
    class_names: list[str],
    model=None,
    variables=None,
    checkpoints_root: str | Path | None = None,
) -> dict[str, Any]:
    """Single-image top-1 prediction with softmax confidence (reference
    testing.py:532-595)."""
    if model is None or variables is None:
        model, variables, _, _ = _load_model_for_eval(
            config.model_type, config.model_name or config.model_type,
            len(class_names), config, Path(checkpoints_root or CHECKPOINTS_DIR))
    img = _load_image(image_path, config.image_size)
    x = _imagenet_normalize(img)[None]
    if config.model_type == "arcface":
        logits = model.apply(variables, x, labels=np.zeros(1, np.int32))
    else:
        logits = model.apply(variables, x)
    probs = np.asarray(jax.nn.softmax(np.asarray(logits, np.float32), axis=-1))[0]
    top = int(probs.argmax())
    order = np.argsort(-probs)[:3]
    return {
        "predicted_class": class_names[top],
        "confidence": float(probs[top]),
        "top3": [{"class": class_names[i], "prob": float(probs[i])} for i in order],
    }
