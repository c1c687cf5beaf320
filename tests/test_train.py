"""End-to-end training-engine tests on the 8-device CPU mesh: the DP train
step compiles and learns on a tiny synthetic dataset; artifacts match the
reference's on-disk contract (metrics CSV header, model_info.json, best/final
checkpoints); schedulers and early stopping behave."""

import csv
import json

import numpy as np
import pytest

from facerec_tpu.config import OptimizerConfig, SchedulerConfig, TrainConfig
from facerec_tpu.train.checkpoints import load_checkpoint
from facerec_tpu.train.early_stopping import EarlyStopping
from facerec_tpu.train.results import TRAIN_CSV_HEADER
from facerec_tpu.train.schedulers import (
    CosineAnnealingLR, ReduceLROnPlateau, StepLR, WarmupCosineLR, get_scheduler,
)


def _cfg(**kw):
    base = dict(
        model_type="baseline",
        batch_size=16,
        epochs=3,
        image_size=32,
        seed=0,
        early_stopping=False,
        checkpoint_every=0,
        compute_dtype="float32",
        optimizer=OptimizerConfig(learning_rate=3e-3),
        scheduler=SchedulerConfig(name="cosine"),
    )
    base.update(kw)
    return TrainConfig(**base)


def test_train_baseline_e2e(synthetic_imagefolder, tmp_path):
    from facerec_tpu.train.engine import train_model

    out = train_model(_cfg(), synthetic_imagefolder, checkpoints_root=tmp_path, model_name="baseline_t")
    hist = out["history"]
    assert len(hist) == 3
    # learning happened: loss decreased from first to last epoch
    assert hist[-1]["train_loss"] < hist[0]["train_loss"]
    model_dir = tmp_path / "baseline_t"
    # artifact contract
    csv_path = model_dir / "metrics" / "training_metrics.csv"
    with csv_path.open() as f:
        rows = list(csv.reader(f))
    assert rows[0] == TRAIN_CSV_HEADER
    assert len(rows) == 4
    info = json.loads((model_dir / "model_info.json").read_text())
    assert info["model_type"] == "baseline" and info["num_classes"] == 4
    assert "test_acc" in info
    assert (model_dir / "final").exists()
    # best checkpoint loads
    ck = load_checkpoint(model_dir)
    assert "params" in ck and "metadata" in ck


def test_train_siamese_short(synthetic_imagefolder, tmp_path):
    from facerec_tpu.train.engine import train_model

    cfg = _cfg(model_type="siamese", epochs=1, batch_size=16)
    out = train_model(cfg, synthetic_imagefolder, checkpoints_root=tmp_path, model_name="siam_t")
    assert np.isfinite(out["history"][0]["train_loss"])
    assert (tmp_path / "siam_t" / "final").exists()


def test_train_arcface_two_phase(synthetic_imagefolder, tmp_path):
    from facerec_tpu.config import ArcFaceConfig
    from facerec_tpu.train.engine import train_model

    cfg = _cfg(
        model_type="arcface", epochs=2,
        arcface=ArcFaceConfig(two_phase=True, two_phase_epoch=1, warmup_epochs=4),
        optimizer=OptimizerConfig(name="adamw", amsgrad=True, learning_rate=1e-3),
        scheduler=SchedulerConfig(name="warmup_cosine", warmup_epochs=1),
    )
    out = train_model(cfg, synthetic_imagefolder, checkpoints_root=tmp_path, model_name="arc_t")
    assert all(np.isfinite(r["train_loss"]) for r in out["history"])


def test_schedulers():
    s = StepLR(1.0, step_size=2, gamma=0.1)
    lrs = [s.step() for _ in range(5)]
    assert lrs == pytest.approx([1.0, 1.0, 0.1, 0.1, 0.01])

    c = CosineAnnealingLR(1.0, t_max=10, min_lr=0.0)
    first = c.step()
    assert first == pytest.approx(1.0)
    for _ in range(10):
        last = c.step()
    assert last == pytest.approx(0.0, abs=1e-9)

    w = WarmupCosineLR(1.0, warmup_epochs=3, total_epochs=10)
    ws = [w.step() for _ in range(5)]
    assert ws[0] == pytest.approx(1 / 3) and ws[2] == pytest.approx(1.0)
    assert ws[3] == pytest.approx(1.0)  # cosine peak at end of warmup
    assert ws[4] < 1.0

    p = ReduceLROnPlateau(1.0, factor=0.5, patience=1)
    p.step(1.0)
    p.step(1.0)  # bad 1
    lr = p.step(1.0)  # bad 2 -> reduce
    assert lr == pytest.approx(0.5)

    cfg = SchedulerConfig(name="one_cycle")
    assert get_scheduler(cfg, 0.1, 10).step() > 0.1


def test_early_stopping():
    es = EarlyStopping(patience=2, mode="min")
    assert not es(1.0)
    assert not es(0.9)
    assert not es(0.95)
    assert es(0.92)  # second epoch without improvement -> stop
    es2 = EarlyStopping(patience=2, mode="max")
    es2(0.5)
    assert not es2(0.6)


def test_resume_matches_uninterrupted():
    """Train 4 epochs straight vs train 2 / kill / resume to 4: final params
    and metrics must match exactly. SGD+momentum so the parameter trajectory
    is deterministic (Adam at step 1 amplifies f32 reduction-order noise) and
    the momentum trace genuinely tests opt_state restoration. StepLR at
    step_size=2 flips the LR exactly at the resume boundary, so a restarted
    scheduler would diverge immediately (VERDICT round-1 item 3)."""
    import jax

    from facerec_tpu.data.synthetic import write_synthetic_imagefolder
    from facerec_tpu.train.engine import train_model

    import tempfile
    from pathlib import Path

    with tempfile.TemporaryDirectory() as td:
        root = Path(td) / "ds"
        write_synthetic_imagefolder(root, num_classes=3, per_class=8, size=32, seed=5)

        def cfg(epochs):
            return _cfg(
                epochs=epochs, batch_size=8, checkpoint_every=1, keep_checkpoints=5,
                resume=True,
                optimizer=OptimizerConfig(name="sgd", momentum=0.9, learning_rate=1e-2,
                                          use_grad_clip=False),
                scheduler=SchedulerConfig(name="step", step_size=2, gamma=0.1),
            )

        straight = train_model(cfg(4), root, checkpoints_root=Path(td) / "a", model_name="m")
        # interrupted run: 2 epochs, then a fresh process-equivalent resume
        train_model(cfg(2), root, checkpoints_root=Path(td) / "b", model_name="m")
        resumed = train_model(cfg(4), root, checkpoints_root=Path(td) / "b", model_name="m")

        assert resumed["history"][0]["epoch"] == 2  # continued, not restarted
        hs, hr = straight["history"], resumed["history"]
        for row_s, row_r in zip(hs[2:], hr):
            assert row_s["train_loss"] == pytest.approx(row_r["train_loss"], rel=1e-5)
            assert row_s["val_loss"] == pytest.approx(row_r["val_loss"], rel=1e-5)
            assert row_s["lr"] == pytest.approx(row_r["lr"])  # scheduler fast-forwarded
        ps = jax.tree_util.tree_leaves(jax.device_get(straight["state"].params))
        pr = jax.tree_util.tree_leaves(jax.device_get(resumed["state"].params))
        for a, b in zip(ps, pr):
            np.testing.assert_allclose(a, b, atol=1e-6)
        assert int(straight["state"].step) == int(resumed["state"].step)


def test_resume_arcface_opt_state_roundtrip(synthetic_imagefolder, tmp_path):
    """The full AMSGrad + inject_hyperparams opt_state tree survives the orbax
    round-trip, and the restored hyperparams carry the phase-2 backbone_scale
    across the two-phase boundary."""
    from facerec_tpu.config import ArcFaceConfig
    from facerec_tpu.train.engine import train_model
    from facerec_tpu.train.checkpoints import restore_into

    cfg_kw = dict(
        model_type="arcface", checkpoint_every=1, resume=True,
        arcface=ArcFaceConfig(two_phase=True, two_phase_epoch=1, warmup_epochs=4),
        optimizer=OptimizerConfig(name="adamw", amsgrad=True, learning_rate=1e-3),
        scheduler=SchedulerConfig(name="warmup_cosine", warmup_epochs=1),
    )
    train_model(_cfg(epochs=1, **cfg_kw), synthetic_imagefolder,
                checkpoints_root=tmp_path, model_name="arc_r")
    out = train_model(_cfg(epochs=2, **cfg_kw), synthetic_imagefolder,
                      checkpoints_root=tmp_path, model_name="arc_r")
    assert out["history"][0]["epoch"] == 1
    assert np.isfinite(out["history"][0]["train_loss"])
    # the resumed epoch ran in phase 2: backbone_scale restored then unfrozen
    hp = out["state"].opt_state.hyperparams
    assert float(hp["backbone_scale"]) == 1.0
    # saved metadata recorded the optimizer state
    tree, meta = restore_into(tmp_path / "arc_r", "epoch_1",
                              out["state"].params, out["state"].batch_stats,
                              out["state"].opt_state)
    assert meta["has_opt_state"] and "opt_state" in tree
