"""Unified typed configuration for the TPU face-recognition framework.

Replaces the reference's four coexisting config mechanisms (module constants in
``src/base_config.py:12-35``, the duck-typed ``PreprocessingConfig`` in
``src/data_prep.py:20-67``, the argparse CLIs, and the interactive wizards)
with one dataclass hierarchy that serves programmatic, CLI, and interactive
frontends alike.

Design notes (TPU-first):
  * All shape-bearing fields (image size, batch size, gallery capacity) are
    static Python ints so every jitted function traces once.
  * PRNG handling is explicit: a single root seed, threaded as ``jax.random``
    keys; never global mutable RNG state.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Sequence

# ---------------------------------------------------------------------------
# Path layout (mirrors reference src/base_config.py:12-28 artifact contract)
# ---------------------------------------------------------------------------

# Persistent XLA compilation cache: first compiles through the TPU
# remote-compile tunnel take ~30-90s; the cache makes reruns instant.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache"))

PROJECT_ROOT = Path(os.environ.get("FACEREC_ROOT", Path(__file__).resolve().parent.parent))
DATA_DIR = PROJECT_ROOT / "data"
RAW_DATA_DIR = DATA_DIR / "raw"
PROC_DATA_DIR = DATA_DIR / "processed"
OUTPUTS_DIR = PROJECT_ROOT / "outputs"
CHECKPOINTS_DIR = OUTPUTS_DIR / "checkpoints"
VIZ_DIR = OUTPUTS_DIR / "visualizations"
FACE_REFERENCES_DIR = PROJECT_ROOT / "face_references"

TRAIN_SPLIT = "train"
VAL_SPLIT = "val"
TEST_SPLIT = "test"

# Training defaults (reference src/base_config.py:32-35)
DEFAULT_BATCH_SIZE = 16
DEFAULT_EPOCHS = 50
DEFAULT_LR = 1e-3
IMG_SIZE = 224

logger = logging.getLogger("facerec_tpu")
if not logger.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("%(asctime)s [%(levelname)s] %(name)s: %(message)s"))
    logger.addHandler(_h)
    logger.setLevel(logging.INFO)


def ensure_dirs() -> None:
    """Create the on-disk artifact layout (reference base_config.py:39-42)."""
    for d in (RAW_DATA_DIR, PROC_DATA_DIR, CHECKPOINTS_DIR, VIZ_DIR, FACE_REFERENCES_DIR):
        d.mkdir(parents=True, exist_ok=True)


# ---------------------------------------------------------------------------
# Dataclass config tree
# ---------------------------------------------------------------------------


class _DictMixin:
    """to_dict / from_dict round-tripping, like PreprocessingConfig's
    (reference data_prep.py:50-67), but generic over dataclasses."""

    def to_dict(self) -> dict[str, Any]:
        out = {}
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if dataclasses.is_dataclass(v) and not isinstance(v, type):
                v = v.to_dict() if isinstance(v, _DictMixin) else dataclasses.asdict(v)
            elif isinstance(v, tuple):
                v = list(v)
            elif isinstance(v, Path):
                v = str(v)
            out[f.name] = v
        return out

    @classmethod
    def from_dict(cls, d: dict[str, Any]):
        kwargs = {}
        for f in dataclasses.fields(cls):
            if f.name not in d:
                continue
            v = d[f.name]
            ftype = f.type if isinstance(f.type, type) else None
            if ftype is not None and dataclasses.is_dataclass(ftype) and isinstance(v, dict):
                v = ftype.from_dict(v) if issubclass(ftype, _DictMixin) else ftype(**v)
            elif isinstance(v, list):
                v = tuple(v)
            kwargs[f.name] = v
        return cls(**kwargs)

    def save_json(self, path: str | Path) -> None:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        Path(path).write_text(json.dumps(self.to_dict(), indent=2))

    @classmethod
    def load_json(cls, path: str | Path):
        return cls.from_dict(json.loads(Path(path).read_text()))

    def replace(self, **kwargs):
        return dataclasses.replace(self, **kwargs)


# Cascade thresholds calibrated to the committed SELF-TRAINED detector
# weights on the reference gallery's real photographs (recall 7/7 vs 5/7 at
# the classic 0.6/0.7/0.7, FP cost 5/32 vs 2-4/32 face-free frames —
# tests/test_real_photos.py). The classic values belong to facenet-pytorch's
# WIDER-FACE-trained weights; detect/weights.py picks per weight source.
CALIBRATED_DETECTION_THRESHOLDS: tuple[float, float, float] = (0.5, 0.5, 0.55)
CLASSIC_DETECTION_THRESHOLDS: tuple[float, float, float] = (0.6, 0.7, 0.7)


@dataclass(frozen=True)
class PreprocessingConfig(_DictMixin):
    """Detect->align->crop->augment settings (reference data_prep.py:20-67)."""

    name: str = "default"
    use_mtcnn: bool = True
    face_margin: float = 0.4
    final_size: tuple[int, int] = (IMG_SIZE, IMG_SIZE)
    min_face_size: int = 20
    # None = pick by resolved weight source (detect/weights.thresholds_for_
    # source): CALIBRATED for self-trained npz weights, CLASSIC 0.6/0.7/0.7
    # for converted facenet-pytorch .pt. A tuple here is an explicit user
    # override applied regardless of source.
    detection_thresholds: tuple[float, float, float] | None = None
    # Augmentation parameters (reference data_prep.py:38-48)
    augment: bool = True
    rotation_degrees: float = 20.0
    brightness: float = 0.2
    contrast: float = 0.2
    scale: float = 0.1
    horizontal_flip: bool = True
    # Low-data augmentation: synthetic variants when a class has <20 train
    # images (reference data_prep.py:353-396)
    low_data_threshold: int = 20
    low_data_variants: int = 5


@dataclass(frozen=True)
class MeshConfig(_DictMixin):
    """Device-mesh layout. Axes: data (DP), model (TP for the embedding /
    gallery matmuls). TPU-native equivalent of the reference's absent
    distributed backend (SURVEY.md section 2.2 / 5.8)."""

    data_axis: str = "data"
    model_axis: str = "model"
    # -1 = use all devices on the data axis.
    data_parallel: int = -1
    model_parallel: int = 1


@dataclass(frozen=True)
class OptimizerConfig(_DictMixin):
    name: str = "adam"  # adam | adamw | radam | sgd  (reference hyperparameter_tuning.py:95-150)
    learning_rate: float = DEFAULT_LR
    weight_decay: float = 1e-4
    amsgrad: bool = False
    momentum: float = 0.9
    beta1: float = 0.9
    beta2: float = 0.999
    grad_clip_norm: float = 1.0  # model-aware defaults applied by the trainer
    use_grad_clip: bool = True


@dataclass(frozen=True)
class SchedulerConfig(_DictMixin):
    """LR schedule (reference training_utils.py:74-148 + warmup training.py:158-180)."""

    name: str = "cosine"  # cosine | step | exponential | plateau | one_cycle | warmup_cosine | constant
    warmup_epochs: int = 0
    step_size: int = 10
    gamma: float = 0.1
    min_lr: float = 1e-6
    plateau_patience: int = 5
    plateau_factor: float = 0.5
    one_cycle_max_lr: float | None = None


@dataclass(frozen=True)
class ArcFaceConfig(_DictMixin):
    """ArcMarginProduct behavior (reference face_models.py:297-445)."""

    margin: float = 0.5
    scale: float = 32.0
    easy_margin: bool = True
    progressive_margin: bool = True
    warmup_epochs: int = 10  # margin/scale ramp length (face_models.py:336-348)
    two_phase: bool = True
    two_phase_epoch: int = -1  # -1 => max(10, epochs // 3) (training.py:685-699)
    label_smoothing: float = 0.05


@dataclass(frozen=True)
class TrainConfig(_DictMixin):
    model_type: str = "baseline"
    model_name: str | None = None
    batch_size: int = DEFAULT_BATCH_SIZE
    epochs: int = DEFAULT_EPOCHS
    image_size: int = IMG_SIZE
    num_classes: int = 0  # inferred from dataset when 0
    seed: int = 42
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    scheduler: SchedulerConfig = field(default_factory=SchedulerConfig)
    arcface: ArcFaceConfig = field(default_factory=ArcFaceConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    # Early stopping on val loss (reference training_utils.py:18-71)
    early_stopping: bool = True
    patience: int = 10
    min_delta: float = 0.0
    # Precision policy: bf16 activations/compute, f32 params & reductions.
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    # Loop caps kept for parity with the reference's defensive caps
    # (training.py:476,569,788); 0 = uncapped (the TPU-native default).
    max_train_batches: int = 0
    max_val_batches: int = 0
    max_test_batches: int = 0
    # LR range-finder pre-pass (reference training.py:284-302)
    use_lr_finder: bool = False
    label_smoothing: float = 0.1
    checkpoint_every: int = 1
    keep_checkpoints: int = 3
    resume: bool = False
    dropout_rate: float | None = None  # override model default when set
    # Host input pipeline
    prefetch_depth: int = 2
    shuffle_buffer: int = 2048


@dataclass(frozen=True)
class EvalConfig(_DictMixin):
    model_type: str = "baseline"
    model_name: str | None = None
    batch_size: int = 64
    image_size: int = IMG_SIZE
    seed: int = 42
    siamese_distance_threshold: float = 0.5  # reference training.py:588-590
    compute_dtype: str = "bfloat16"


@dataclass(frozen=True)
class ServeConfig(_DictMixin):
    """Real-time demo operating points (reference app.py:17-29)."""

    detection_threshold: float = 0.9
    recognition_threshold: float = 1.0
    iou_tracking_threshold: float = 0.3
    skip_frames: int = 1
    embed_size: int = 160
    gallery_capacity: int = 1024  # padded, power-of-two for static shapes
    top_k: int = 5
    max_faces: int = 16  # static per-frame face capacity
    # Device-resident gallery dtype. bf16 halves the gallery's HBM footprint
    # (1M x 512 = 1 GB) and what the match kernel's pack pass touches; the
    # kernel itself is merge-compute-bound at scale, not HBM-bound
    # (docs/MATCHER.md roofline). Products stay exact into the f32 MXU
    # accumulator so only the storage rounding (~1e-3 on unit cosines) is
    # lost — far from the REC_THRESH=1.0 operating point. "float32" opts out.
    gallery_dtype: str = "bfloat16"


@dataclass(frozen=True)
class TuningConfig(_DictMixin):
    """Native hyperparameter search (replaces Optuna; reference
    hyperparameter_tuning.py:289-560)."""

    model_type: str = "baseline"
    n_trials: int = 20
    epochs_per_trial: int = 12
    timeout_seconds: float | None = None
    seed: int = 42
    use_trial0_baseline: bool = True
    pruning: bool = True
    pruning_warmup_epochs: int = 3
    storage: str | None = None  # sqlite path for resume; None = in-memory
    study_name: str = "facerec_study"
    train_best: bool = False
    # LR-finder pre-pass: center the log-uniform LR search window on the
    # range test's suggestion (reference hyperparameter_tuning.py:193-287,
    # :634-661 find_optimal_lr_for_trial).
    use_lr_finder: bool = False
    lr_finder_span: float = 5.0  # window = [suggested/span, suggested*span]
    # Per-trial mode (the reference's exact semantics,
    # hyperparameter_tuning.py:634-661): re-run the range test inside each
    # trial on the trial's own sampled config (batch size/optimizer shift the
    # usable LR range) and resample that trial's LR from its own window.
    # Costs one ~60-step range test per trial; the once-per-study pre-pass
    # above is the cheap default.
    use_lr_finder_per_trial: bool = False
    # "tpe-lite" (default): after 8 completed trials, half the samples
    # perturb a top-quartile trial (the stand-in for the reference's Optuna
    # TPE, hyperparameter_tuning.py:422-448); "random": pure random search.
    # Sample-efficiency A/B recorded in docs/TUNER.md (tools/ab_tuner.py).
    sampler: str = "tpe-lite"


def set_random_seeds(seed: int = 42) -> None:
    """Seed host-side RNGs (reference base_config.py:103-133). Device-side
    randomness is always explicit jax.random keys, so nothing to do there."""
    import random

    import numpy as np

    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)


def check_tpu() -> dict[str, Any]:
    """Report accelerator availability (reference base_config.py:72-86)."""
    import jax

    devs = jax.devices()
    info = {
        "backend": jax.default_backend(),
        "device_count": jax.device_count(),
        "local_device_count": jax.local_device_count(),
        "devices": [str(d) for d in devs],
    }
    logger.info("JAX backend=%s devices=%d: %s", info["backend"], info["device_count"], info["devices"])
    return info
