"""facerec_tpu — TPU-native face-recognition framework.

Rebuild of henryhcooperr/FaceRecognition-MultiArchitecture-Pipeline's
capabilities on JAX/XLA/Pallas/pjit. Public API mirrors the reference's
package surface (reference src/__init__.py:9-43) plus the TPU-native
additions (mesh/serving/kernels).
"""

from facerec_tpu.config import (
    CHECKPOINTS_DIR,
    DEFAULT_BATCH_SIZE,
    DEFAULT_EPOCHS,
    DEFAULT_LR,
    IMG_SIZE,
    PROC_DATA_DIR,
    PROJECT_ROOT,
    RAW_DATA_DIR,
    VIZ_DIR,
    ArcFaceConfig,
    EvalConfig,
    MeshConfig,
    OptimizerConfig,
    PreprocessingConfig,
    SchedulerConfig,
    ServeConfig,
    TrainConfig,
    TuningConfig,
    check_tpu,
    ensure_dirs,
    logger,
    set_random_seeds,
)
from facerec_tpu.models import (
    MODEL_TYPES,
    ArcFaceNet,
    AttentionNet,
    BaselineNet,
    EnsembleModel,
    HybridNet,
    ResNetTransfer,
    SiameseNet,
    create_ensemble,
    get_criterion,
    get_model,
)

__version__ = "0.1.0"


# Heavier subsystems are exposed lazily so `import facerec_tpu` stays light.
def __getattr__(name):
    if name == "train_model":
        from facerec_tpu.train.engine import train_model

        return train_model
    if name == "evaluate_model":
        from facerec_tpu.eval.engine import evaluate_model

        return evaluate_model
    if name == "predict_image":
        from facerec_tpu.eval.engine import predict_image

        return predict_image
    if name == "process_raw_data":
        from facerec_tpu.data.preprocess import process_raw_data

        return process_raw_data
    if name == "download_all_datasets":
        from facerec_tpu.data.download import download_all_datasets

        return download_all_datasets
    if name == "run_cross_validation":
        from facerec_tpu.train.cross_validation import run_cross_validation

        return run_cross_validation
    if name == "run_hyperparameter_tuning":
        from facerec_tpu.train.tuning import run_hyperparameter_tuning

        return run_hyperparameter_tuning
    if name == "FacePipeline":
        from facerec_tpu.serve.pipeline import FacePipeline

        return FacePipeline
    if name == "GalleryStore":
        from facerec_tpu.serve.gallery import GalleryStore

        return GalleryStore
    raise AttributeError(name)


__all__ = [
    "MODEL_TYPES", "get_model", "get_criterion", "create_ensemble",
    "BaselineNet", "ResNetTransfer", "SiameseNet", "AttentionNet", "ArcFaceNet",
    "HybridNet", "EnsembleModel",
    "TrainConfig", "EvalConfig", "ServeConfig", "TuningConfig", "MeshConfig",
    "OptimizerConfig", "SchedulerConfig", "ArcFaceConfig", "PreprocessingConfig",
    "train_model", "evaluate_model", "predict_image", "process_raw_data",
    "download_all_datasets", "run_cross_validation", "run_hyperparameter_tuning",
    "FacePipeline", "GalleryStore",
    "check_tpu", "ensure_dirs", "set_random_seeds", "logger",
]
