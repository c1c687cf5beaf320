"""facerec_tpu — TPU-native face-recognition framework.

Rebuild of henryhcooperr/FaceRecognition-MultiArchitecture-Pipeline's
capabilities on JAX/XLA/Pallas/pjit. Public API mirrors the reference's
package surface (reference src/__init__.py:9-43).
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
    PreprocessingConfig,
    TrainConfig,
    EvalConfig,
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
