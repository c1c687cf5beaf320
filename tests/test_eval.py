"""Evaluation engine tests: artifact contract + metric plumbing (reference
testing.py shapes) using randomly-initialized checkpoints."""

import json

import jax
import numpy as np
import pytest

from facerec_tpu.config import EvalConfig
from facerec_tpu.eval.engine import evaluate_model, predict_image
from facerec_tpu.models import get_model
from facerec_tpu.train.checkpoints import save_checkpoint


def _save_random_ckpt(model_type, num_classes, ckroot, name, image_size=32):
    model = get_model(model_type, num_classes=num_classes)
    x = np.zeros((2, image_size, image_size, 3), np.float32)
    if model_type == "siamese":
        v = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, x, train=False)
    else:
        v = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, train=False)
    save_checkpoint(ckroot / name, "best", v["params"], v.get("batch_stats", {}),
                    metadata={"model_type": model_type})


def test_evaluate_classifier(synthetic_imagefolder, tmp_path):
    ckroot = tmp_path / "ck"
    _save_random_ckpt("baseline", 4, ckroot, "baseline")
    cfg = EvalConfig(model_type="baseline", batch_size=8, image_size=32, compute_dtype="float32")
    res = evaluate_model(cfg, synthetic_imagefolder, checkpoints_root=ckroot,
                         outputs_root=tmp_path / "out")
    for key in ("accuracy", "precision", "recall", "f1", "roc_auc", "pr_auc",
                "avg_inference_time_ms", "calibration", "per_class", "confusion"):
        assert key in res, key
    assert 0.0 <= res["accuracy"] <= 1.0
    out_dir = tmp_path / "out" / "baseline"
    assert (out_dir / "baseline_results.json").exists()
    assert (out_dir / "roc_curves.csv").exists()
    assert (out_dir / "pr_curves.csv").exists()
    summary = json.loads((out_dir / "experiment_summary.json").read_text())
    assert len(summary) == 1 and "accuracy" in summary[0]


def test_evaluate_siamese(synthetic_imagefolder, tmp_path):
    ckroot = tmp_path / "ck"
    _save_random_ckpt("siamese", 4, ckroot, "siamese")
    cfg = EvalConfig(model_type="siamese", batch_size=8, image_size=32, compute_dtype="float32")
    res = evaluate_model(cfg, synthetic_imagefolder, checkpoints_root=ckroot,
                         outputs_root=tmp_path / "out")
    assert "roc_auc" in res and "per_person_accuracy" in res
    out_dir = tmp_path / "out" / "siamese"
    assert (out_dir / "person_recognition_matrix.csv").exists()
    assert (out_dir / "per_person_accuracy.csv").exists()
    assert (out_dir / "roc_curve.csv").exists()


def test_predict_image(synthetic_imagefolder, tmp_path):
    ckroot = tmp_path / "ck"
    _save_random_ckpt("baseline", 4, ckroot, "baseline")
    cfg = EvalConfig(model_type="baseline", image_size=32, compute_dtype="float32")
    img = next((synthetic_imagefolder / "test").glob("*/*.jpg"))
    out = predict_image(img, cfg, [f"person_{i:03d}" for i in range(4)], checkpoints_root=ckroot)
    assert out["predicted_class"].startswith("person_")
    assert 0.0 <= out["confidence"] <= 1.0
    assert len(out["top3"]) == 3
