"""End-to-end ROC-AUC / prediction parity vs PyTorch (BASELINE.md target #2).

Trains real (small) models with our engine, evaluates them through
eval/engine.py, reverse-converts the trained Flax checkpoints into the
reference's state-dict layout (models/convert.py flax_to_torch_state_dict),
runs the REFERENCE's eval semantics in torch (testing.py:175-177 siamese
dist<0.5 verification; :258-269 arcface cosine-center logits; :290-312
sklearn ROC-AUC) on the same test batches, and requires identical argmax
predictions and |delta ROC-AUC| < 1e-3.

This closes the one BASELINE row conversion-fidelity tests alone cannot:
the same trained weights produce the same decisions and the same ROC-AUC in
both frameworks, end to end.
"""

import sys

import pytest

from facerec_tpu.config import OptimizerConfig, TrainConfig
from facerec_tpu.data.synthetic import write_synthetic_imagefolder
from facerec_tpu.train.engine import train_model

sys.path.insert(0, "/root/repo/tools")
from parity_check import run_reverse_parity  # noqa: E402


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e") / "ds"
    write_synthetic_imagefolder(root, num_classes=4, per_class=14, size=64, seed=9)
    return root


def _train(model_type: str, synth_root, tmp_path_factory, epochs: int = 3):
    ck = tmp_path_factory.mktemp(f"ck_{model_type}")
    cfg = TrainConfig(
        model_type=model_type, model_name=model_type, batch_size=16, epochs=epochs,
        image_size=64, early_stopping=False, checkpoint_every=0,
        optimizer=OptimizerConfig(learning_rate=2e-3),
    )
    train_model(cfg, synth_root, checkpoints_root=ck, model_name=model_type)
    return ck


@pytest.mark.slow
def test_arcface_e2e_roc_auc_parity(synth_root, tmp_path_factory, tmp_path):
    ck = _train("arcface", synth_root, tmp_path_factory)
    rep = run_reverse_parity("arcface", "arcface", str(synth_root), image_size=64,
                             batch_size=16, checkpoints_root=ck, outputs_root=tmp_path)
    assert rep["labels_match"]
    # identical decisions, not merely close scores
    assert rep["prediction_agreement"] == 1.0, rep
    assert rep["roc_auc_delta"] < 1e-3, rep
    assert rep["flax_accuracy"] == rep["torch_accuracy"]
    # the model must actually have learned something for the ROC comparison
    # to be non-degenerate (4 classes => chance = 0.25)
    assert rep["flax_accuracy"] >= 0.5, rep


@pytest.mark.slow
def test_siamese_e2e_verification_parity(synth_root, tmp_path_factory, tmp_path):
    ck = _train("siamese", synth_root, tmp_path_factory)
    rep = run_reverse_parity("siamese", "siamese", str(synth_root), image_size=64,
                             batch_size=16, checkpoints_root=ck, outputs_root=tmp_path)
    assert rep["labels_match"]
    assert rep["prediction_agreement"] == 1.0, rep
    assert rep["roc_auc_delta"] < 1e-3, rep
    assert rep["flax_accuracy"] == rep["torch_accuracy"]
