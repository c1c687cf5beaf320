"""K-fold cross-validation (reference src/cross_validation.py:22-286).

Faithful behaviors: KFold(n_splits=5, shuffle, seed 42) over the train split
(:97), optional warm-start from an existing model's best checkpoint
(:104-121), a shortened per-fold training loop (:167-249), per-fold results +
mean/std summary written to cv_results.json (:261-278). First-party fold
splitting (no sklearn dependency).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any

import jax
import numpy as np

from facerec_tpu.config import CHECKPOINTS_DIR, TrainConfig, logger
from facerec_tpu.data.datasets import ClassificationBatcher, ImageFolderIndex, SiamesePairBatcher
from facerec_tpu.data.pipeline import prefetch_to_device
from facerec_tpu.parallel.mesh import build_mesh, shard_params
from facerec_tpu.train.checkpoints import load_checkpoint, save_checkpoint
from facerec_tpu.train.schedulers import get_scheduler
from facerec_tpu.train.state import create_train_state, set_hyperparam
from facerec_tpu.train.steps import jit_steps


def kfold_indices(n: int, n_splits: int = 5, seed: int = 42) -> list[tuple[np.ndarray, np.ndarray]]:
    """sklearn KFold(shuffle=True) semantics: shuffled order, contiguous
    folds, first n % n_splits folds one element larger."""
    order = np.random.default_rng(seed).permutation(n)
    sizes = np.full(n_splits, n // n_splits)
    sizes[: n % n_splits] += 1
    folds, start = [], 0
    for s in sizes:
        folds.append(order[start : start + s])
        start += s
    return [(np.concatenate([f for j, f in enumerate(folds) if j != i]), folds[i]) for i in range(n_splits)]


class _SubsetIndex:
    """View over an ImageFolderIndex restricted to given rows."""

    def __init__(self, index: ImageFolderIndex, rows: np.ndarray):
        self.root = index.root
        self.paths = [index.paths[i] for i in rows]
        self.labels = index.labels[rows]
        self.class_names = index.class_names

    def __len__(self):
        return len(self.paths)

    @property
    def num_classes(self):
        return len(self.class_names)


def run_cross_validation(
    config: TrainConfig,
    dataset_dir: str | Path,
    n_splits: int = 5,
    epochs_per_fold: int = 15,
    warm_start_model: str | None = None,
    checkpoints_root: str | Path | None = None,
) -> dict[str, Any]:
    ckroot = Path(checkpoints_root or CHECKPOINTS_DIR)
    train_dir = Path(dataset_dir) / "train"
    index = ImageFolderIndex.build(train_dir)
    num_classes = index.num_classes
    mesh = build_mesh(config.mesh)

    from facerec_tpu.models import get_model

    model = get_model(config.model_type, num_classes=num_classes,
                      compute_dtype=config.compute_dtype, param_dtype=config.param_dtype)

    warm = None
    if warm_start_model:
        warm = load_checkpoint(ckroot / warm_start_model)  # best/final fallback
        logger.info("CV warm-start from %s", warm_start_model)

    cv_dir = ckroot / f"cv_{config.model_type}_{int(time.time())}"
    cv_dir.mkdir(parents=True, exist_ok=True)
    fold_results = []
    for fold, (tr, va) in enumerate(kfold_indices(len(index), n_splits, seed=42)):
        t0 = time.time()
        if config.model_type == "siamese":
            tr_b = SiamesePairBatcher(_SubsetIndex(index, tr), config.batch_size, config.image_size,
                                      seed=config.seed + fold)
            va_b = SiamesePairBatcher(_SubsetIndex(index, va), config.batch_size, config.image_size,
                                      fixed_pairs=True, seed=config.seed + fold)
        else:
            tr_b = ClassificationBatcher(_SubsetIndex(index, tr), config.batch_size, config.image_size,
                                         seed=config.seed + fold)
            va_b = ClassificationBatcher(_SubsetIndex(index, va), config.batch_size, config.image_size,
                                         shuffle=False, seed=config.seed + fold)

        first = next(iter(tr_b.epoch(0)))
        state = create_train_state(model, first, config, config.model_type,
                                   jax.random.key(config.seed + fold))
        if warm is not None:
            state = state.replace(
                params=jax.tree_util.tree_map(lambda t, s: jax.numpy.asarray(s, t.dtype),
                                              state.params, warm["params"]),
                batch_stats=jax.tree_util.tree_map(lambda t, s: jax.numpy.asarray(s, t.dtype),
                                                   state.batch_stats, warm["batch_stats"]),
            )
        state = state.replace(params=shard_params(state.params, mesh),
                              batch_stats=shard_params(state.batch_stats, mesh))
        train_step, eval_step = jit_steps(model, config.model_type, mesh)
        sched = get_scheduler(config.scheduler, config.optimizer.learning_rate, epochs_per_fold)
        lr = sched.step()
        set_hyperparam(state.opt_state, "learning_rate", lr)

        best_acc = 0.0
        for epoch in range(epochs_per_fold):
            state = state.replace(epoch=jax.numpy.asarray(float(epoch), jax.numpy.float32))
            for batch in prefetch_to_device(tr_b.epoch(epoch), mesh):
                state, _ = train_step(state, batch)
            correct = total = loss_sum = 0.0
            for batch in prefetch_to_device(va_b.epoch(epoch), mesh):
                m = jax.device_get(eval_step(state, batch))
                correct += float(m["correct"])
                total += float(m["count"])
                loss_sum += float(m["loss_sum"])
            acc = correct / max(total, 1.0)
            best_acc = max(best_acc, acc)
            lr = sched.step(loss_sum / max(total, 1.0))
            set_hyperparam(state.opt_state, "learning_rate", lr)
        save_checkpoint(cv_dir, f"fold_{fold}", state.params, state.batch_stats,
                        metadata={"fold": fold, "val_acc": best_acc})
        fold_results.append({"fold": fold, "val_acc": best_acc, "time_sec": round(time.time() - t0, 1)})
        logger.info("CV fold %d/%d: val_acc=%.4f", fold + 1, n_splits, best_acc)

    accs = [f["val_acc"] for f in fold_results]
    summary = {
        "model_type": config.model_type,
        "n_splits": n_splits,
        "epochs_per_fold": epochs_per_fold,
        "fold_results": fold_results,
        "mean_val_acc": float(np.mean(accs)),
        "std_val_acc": float(np.std(accs)),
        "warm_start": warm_start_model,
    }
    (cv_dir / "cv_results.json").write_text(json.dumps(summary, indent=2))
    logger.info("CV done: %.4f +/- %.4f", summary["mean_val_acc"], summary["std_val_acc"])
    return summary
