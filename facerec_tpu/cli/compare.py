"""Compare-all-models flow (reference interactive.py:832-961 option 7):
train + evaluate every architecture on one dataset, print a comparison table."""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any

from facerec_tpu.config import EvalConfig, TrainConfig, logger
from facerec_tpu.models import MODEL_TYPES


def compare_all_models(
    dataset_dir: str | Path,
    epochs: int = 10,
    batch_size: int = 32,
    image_size: int | None = None,
    model_types: list[str] | None = None,
    checkpoints_root: str | Path | None = None,
    outputs_root: str | Path | None = None,
) -> dict[str, Any]:
    from facerec_tpu.eval.engine import evaluate_model
    from facerec_tpu.train.engine import train_model

    results: dict[str, Any] = {}
    for mt in model_types or MODEL_TYPES:
        t0 = time.time()
        try:
            cfg = TrainConfig(model_type=mt, epochs=epochs, batch_size=batch_size,
                              image_size=image_size or TrainConfig().image_size,
                              model_name=f"{mt}_compare")
            train_out = train_model(cfg, dataset_dir, checkpoints_root=checkpoints_root)
            ecfg = EvalConfig(model_type=mt, model_name=f"{mt}_compare",
                              image_size=cfg.image_size, batch_size=batch_size)
            eval_out = evaluate_model(ecfg, dataset_dir, checkpoints_root=checkpoints_root,
                                      outputs_root=outputs_root)
            results[mt] = {
                "val_acc": train_out["best_val_acc"],
                "test_acc": eval_out["accuracy"],
                "f1": eval_out["f1"],
                "roc_auc": eval_out.get("roc_auc"),
                "inference_ms": eval_out["avg_inference_time_ms"],
                "train_time_sec": round(time.time() - t0, 1),
            }
        except Exception as e:
            logger.warning("compare-all: %s failed: %s", mt, e)
            results[mt] = {"error": str(e)}

    # print the comparison table (reference interactive.py:940-961)
    header = f"{'model':<12}{'val_acc':>9}{'test_acc':>10}{'f1':>8}{'roc_auc':>9}{'ms/batch':>10}{'time_s':>9}"
    print(header)
    print("-" * len(header))
    for mt, r in results.items():
        if "error" in r:
            print(f"{mt:<12}  ERROR: {r['error'][:60]}")
        else:
            auc = f"{r['roc_auc']:.4f}" if isinstance(r.get("roc_auc"), float) else "-"
            print(f"{mt:<12}{r['val_acc']:>9.4f}{r['test_acc']:>10.4f}{r['f1']:>8.4f}"
                  f"{auc:>9}{r['inference_ms']:>10.1f}{r['train_time_sec']:>9.1f}")
    return results
