"""Interactive menu (reference src/interactive.py:78-974).

Same 9 options: preprocess, preprocessing visualization, train (full wizard),
evaluate, hyperopt wizard, cross-validation (with warm start), compare-all,
download, exit. All wizards construct the same typed configs the CLI uses.
"""

from __future__ import annotations

import json
from pathlib import Path

from facerec_tpu.config import (
    ArcFaceConfig, CHECKPOINTS_DIR, EvalConfig, OptimizerConfig, PROC_DATA_DIR,
    PreprocessingConfig, SchedulerConfig, TrainConfig, TuningConfig, logger,
)
from facerec_tpu.models import MODEL_TYPES


def _ask(prompt: str, default: str = "") -> str:
    try:
        v = input(f"{prompt}{f' [{default}]' if default else ''}: ").strip()
    except EOFError:
        return default
    return v or default


def _ask_float(prompt: str, default: float) -> float:
    try:
        return float(_ask(prompt, str(default)))
    except ValueError:
        return default


def _ask_int(prompt: str, default: int) -> int:
    try:
        return int(_ask(prompt, str(default)))
    except ValueError:
        return default


def _ask_bool(prompt: str, default: bool = True) -> bool:
    v = _ask(prompt + " (y/n)", "y" if default else "n").lower()
    return v.startswith("y")


def _choose(prompt: str, options: list[str], default: int = 0) -> str:
    print(prompt)
    for i, o in enumerate(options):
        print(f"  {i + 1}. {o}")
    try:
        idx = int(_ask("choice", str(default + 1))) - 1
    except ValueError:
        idx = default
    return options[max(0, min(idx, len(options) - 1))]


def _choose_dataset() -> str:
    candidates = sorted(str(p.parent) for p in PROC_DATA_DIR.glob("**/train") if p.is_dir())
    if not candidates:
        return _ask("processed dataset dir (with train/val/test)")
    return _choose("Select dataset:", candidates)


def _train_wizard() -> tuple[TrainConfig, str]:
    model_type = _choose("Model type:", MODEL_TYPES)
    ds = _choose_dataset()
    epochs = _ask_int("epochs", 50)
    batch = _ask_int("batch size", 16)
    lr = _ask_float("learning rate", 1e-3)
    sched_name = _choose("Scheduler:", ["cosine", "warmup_cosine", "plateau", "step",
                                        "one_cycle", "exponential", "constant"],
                         default=1 if model_type == "arcface" else 0)
    clip = _ask_bool("use gradient clipping", True)
    early = _ask_bool("early stopping", True)
    arc = ArcFaceConfig()
    if model_type == "arcface":
        arc = ArcFaceConfig(
            margin=_ask_float("arcface margin", 0.5),
            scale=_ask_float("arcface scale", 32.0),
            easy_margin=_ask_bool("easy margin", True),
            progressive_margin=_ask_bool("progressive margin", True),
            two_phase=_ask_bool("two-phase training", True),
            warmup_epochs=_ask_int("margin warmup epochs", 10),
        )
    opt = OptimizerConfig(name="adamw" if model_type == "arcface" else "adam",
                          amsgrad=model_type == "arcface", learning_rate=lr,
                          use_grad_clip=clip)
    cfg = TrainConfig(model_type=model_type, epochs=epochs, batch_size=batch,
                      optimizer=opt, scheduler=SchedulerConfig(name=sched_name),
                      arcface=arc, early_stopping=early,
                      use_lr_finder=_ask_bool("run LR finder first", False))
    return cfg, ds


def interactive_menu() -> int:
    options = [
        "Preprocess raw data",
        "Preprocessing visualization",
        "Train a model",
        "Evaluate a model",
        "Hyperparameter tuning",
        "Cross-validation",
        "Compare all models",
        "Download datasets",
        "Exit",
    ]
    while True:
        print("\n=== Face Recognition (TPU) ===")
        for i, o in enumerate(options):
            print(f"  {i + 1}. {o}")
        choice = _ask("choice", "9")
        try:
            idx = int(choice)
        except ValueError:
            continue
        try:
            if idx == 1:
                from facerec_tpu.data.preprocess import process_raw_data

                cfg = PreprocessingConfig(
                    name=_ask("config name", "default"),
                    use_mtcnn=_ask_bool("use MTCNN detection", True),
                    face_margin=_ask_float("face margin", 0.4),
                    augment=_ask_bool("augment", True),
                )
                cap = _ask("max samples per class (empty = all)", "")
                out = process_raw_data(config=cfg,
                                       max_samples_per_class=int(cap) if cap else None,
                                       test_mode=_ask_bool("test mode (3 persons)", False))
                print(f"processed -> {out}")
            elif idx == 2:
                from facerec_tpu.eval.engine import _load_model_for_eval, discover_test_dir
                from facerec_tpu.eval.visualizer import generate_visualization_report
                from facerec_tpu.data.datasets import ImageFolderIndex

                mt = _choose("Model type:", MODEL_TYPES)
                name = _ask("model name", mt)
                ds = _choose_dataset()
                test_dir = discover_test_dir(ds)
                nc = ImageFolderIndex.build(test_dir).num_classes
                model, variables, _, _ = _load_model_for_eval(mt, name, nc, EvalConfig(model_type=mt),
                                                              CHECKPOINTS_DIR)
                print(json.dumps(generate_visualization_report(model, variables, mt, test_dir), indent=2))
            elif idx == 3:
                from facerec_tpu.train.engine import train_model

                cfg, ds = _train_wizard()
                out = train_model(cfg, ds)
                print(json.dumps(out["summary"], indent=2, default=str))
            elif idx == 4:
                from facerec_tpu.eval.engine import evaluate_model

                mt = _choose("Model type:", MODEL_TYPES)
                cfg = EvalConfig(model_type=mt, model_name=_ask("model name", mt))
                res = evaluate_model(cfg, _choose_dataset())
                print(json.dumps({k: v for k, v in res.items()
                                  if isinstance(v, (int, float, str))}, indent=2))
            elif idx == 5:
                from facerec_tpu.train.tuning import run_hyperparameter_tuning

                mt = _choose("Model type:", MODEL_TYPES)
                trials = _ask_int("trials", 50 if mt == "arcface" else 20)  # arcface bump, reference interactive.py:553
                tcfg = TuningConfig(model_type=mt, n_trials=trials,
                                    epochs_per_trial=_ask_int("epochs per trial", 12),
                                    train_best=_ask_bool("train best config after", False))
                res = run_hyperparameter_tuning(tcfg, _choose_dataset())
                print(json.dumps({k: res[k] for k in ("best_value", "best_params")}, indent=2))
            elif idx == 6:
                from facerec_tpu.train.cross_validation import run_cross_validation

                mt = _choose("Model type:", MODEL_TYPES)
                warm = _ask("warm-start model name (empty = none)", "")
                res = run_cross_validation(TrainConfig(model_type=mt), _choose_dataset(),
                                           n_splits=_ask_int("folds", 5),
                                           epochs_per_fold=_ask_int("epochs per fold", 15),
                                           warm_start_model=warm or None)
                print(json.dumps({k: v for k, v in res.items() if k != "fold_results"}, indent=2))
            elif idx == 7:
                from facerec_tpu.cli.compare import compare_all_models

                compare_all_models(_choose_dataset(), epochs=_ask_int("epochs per model", 10))
            elif idx == 8:
                from facerec_tpu.data.download import download_all_datasets

                download_all_datasets()
            elif idx == 9:
                return 0
        except KeyboardInterrupt:
            print("\ninterrupted")
        except Exception as e:
            logger.error("menu action failed: %s", e)
    return 0
