"""CLI + graft-entry tests."""

import json
import subprocess
import sys

import numpy as np
import pytest

from facerec_tpu.cli.main import build_parser, main


def test_parser_covers_reference_surface():
    p = build_parser()
    # union of reference run.py:88-183 and src/main.py:19-69 subcommands
    for cmd in ["interactive", "demo", "cv", "hyperopt", "preprocess", "train",
                "evaluate", "predict", "check-tpu", "list-models", "download",
                "visualize", "compare-all", "bench"]:
        args = p.parse_args([cmd] + (["--dataset", "x"] if cmd in
                            {"train", "cv", "hyperopt", "visualize", "compare-all"} else
                            ["--image-path", "x", "--dataset", "y"] if cmd == "predict" else []))
        assert args.command == cmd


def test_list_models(capsys):
    assert main(["list-models"]) == 0
    out = capsys.readouterr().out.split()
    assert out == ["baseline", "cnn", "siamese", "attention", "arcface", "hybrid", "ensemble"]


def test_check_tpu(capsys):
    assert main(["check-tpu"]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["device_count"] == 8  # virtual CPU mesh in tests


def test_train_cli_smoke(synthetic_imagefolder, tmp_path, monkeypatch):
    import facerec_tpu.config as C

    monkeypatch.setattr(C, "CHECKPOINTS_DIR", tmp_path / "ck")
    import facerec_tpu.train.engine as E

    monkeypatch.setattr(E, "CHECKPOINTS_DIR", tmp_path / "ck")
    rc = main(["train", "--model-type", "baseline", "--dataset", str(synthetic_imagefolder),
               "--epochs", "1", "--batch-size", "8", "--image-size", "32",
               "--model-name", "cli_t"])
    assert rc == 0
    assert (tmp_path / "ck" / "cli_t" / "model_info.json").exists()


def test_graft_entry_multichip():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    import jax

    out = jax.jit(fn)(*args)
    assert out.shape == (8, 512)
    assert np.all(np.isfinite(np.asarray(out)))
    ge.dryrun_multichip(8)
    ge.dryrun_multichip(4)


def test_train_wizard_full_depth(monkeypatch):
    """The interactive train wizard can express every TrainConfig field the
    CLI can (reference interactive.py:249-452 prompts for clip value,
    min-delta, two-phase epoch, and per-scheduler parameters)."""
    import facerec_tpu.cli.interactive as I

    monkeypatch.setattr(I, "_choose_dataset", lambda: "dsdir")
    answers = iter([
        "5",       # model type -> arcface
        "wiz",     # model name
        "3",       # epochs
        "8",       # batch size
        "",        # image size (default 160 for arcface)
        "n",       # run LR finder first
        "0.002",   # learning rate
        "0.0005",  # weight decay
        "4",       # optimizer -> sgd
        "4",       # scheduler -> step
        "7",       # step size
        "0.3",     # step gamma
        "1e-05",   # minimum LR
        "y",       # gradient clipping
        "2.5",     # max gradient norm
        "y",       # early stopping
        "6",       # patience
        "0.01",    # min delta
        "y",       # two-phase
        "0.4",     # margin
        "48",      # scale
        "n",       # easy margin
        "y",       # progressive margin
        "2",       # two-phase switch epoch
        "5",       # margin warmup epochs
        "0.02",    # arcface label smoothing
        "7",       # seed
        "2",       # checkpoint every
        "n",       # resume
    ])
    monkeypatch.setattr("builtins.input", lambda *_: next(answers))
    cfg, ds = I._train_wizard()
    assert ds == "dsdir"
    assert (cfg.model_type, cfg.model_name, cfg.epochs, cfg.batch_size,
            cfg.image_size, cfg.seed) == ("arcface", "wiz", 3, 8, 160, 7)
    assert cfg.optimizer.name == "sgd"
    assert cfg.optimizer.learning_rate == 0.002
    assert cfg.optimizer.weight_decay == 0.0005
    assert cfg.optimizer.use_grad_clip and cfg.optimizer.grad_clip_norm == 2.5
    assert cfg.scheduler.name == "step"
    assert cfg.scheduler.step_size == 7 and cfg.scheduler.gamma == 0.3
    assert cfg.scheduler.min_lr == 1e-5
    assert cfg.early_stopping and cfg.patience == 6 and cfg.min_delta == 0.01
    assert cfg.arcface.two_phase and cfg.arcface.two_phase_epoch == 2
    assert (cfg.arcface.margin, cfg.arcface.scale) == (0.4, 48.0)
    assert not cfg.arcface.easy_margin and cfg.arcface.progressive_margin
    assert cfg.arcface.warmup_epochs == 5
    assert cfg.arcface.label_smoothing == 0.02
    assert cfg.checkpoint_every == 2 and not cfg.resume
    assert next(answers, None) is None  # every scripted answer was consumed


def test_compare_all_pretrained_ensemble(synthetic_imagefolder, tmp_path):
    """The compare-all ensemble entry loads the members this run just
    trained. With a single member the ensemble IS that member, so its test
    accuracy must match exactly — proof the checkpoint graft is verbatim."""
    from facerec_tpu.cli.compare import compare_all_models

    res = compare_all_models(
        synthetic_imagefolder, epochs=2, batch_size=8, image_size=32,
        model_types=["baseline", "ensemble"], ensemble_members=["baseline"],
        checkpoints_root=tmp_path / "ck", outputs_root=tmp_path / "out")
    assert "error" not in res["ensemble"], res["ensemble"]
    assert res["ensemble"]["test_acc"] == res["baseline"]["test_acc"]
    meta = json.loads((tmp_path / "ck" / "ensemble_compare" / "best" / "metadata.json").read_text())
    assert meta["pretrained_members"]
