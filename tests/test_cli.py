"""CLI + menu smoke tests (tiny shapes, CPU): the reference's
train_model.py / run_training.py surfaces."""

import os

import numpy as np
import pytest


@pytest.mark.slow
def test_train_cli_end_to_end(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.train.cli import (
        train_main)
    trainer, history = train_main([
        "--create_synthetic", "--num_samples", "3",
        "--synthetic_shape", "24", "24", "16",
        "--data_dir", str(tmp_path / "data"),
        "--epochs", "1", "--batch_size", "1", "--lr", "1e-3",
        "--image_size", "16", "16", "16",
        "--features", "8", "16",
        "--preset", "lightweight",
        "--num_workers", "1", "--dtype", "float32", "--no_remat",
        "--experiment_name", "cli_smoke",
    ])
    assert len(history["train_loss"]) == 1
    assert np.isfinite(history["train_loss"][0])
    # checkpoint written on best epoch
    assert os.path.isdir(trainer._ckpt_path())


def test_menu_invalid_then_quit(monkeypatch, capsys):
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.train import menu
    answers = iter(["zzz", "q"])
    monkeypatch.setattr("builtins.input", lambda *_: next(answers))
    assert menu.main() is None
    out = capsys.readouterr().out
    assert "invalid choice" in out


def test_menu_preset_args():
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.train.menu import (
        PRESET_ARGS)
    assert set(PRESET_ARGS) == {"1", "2", "3", "4"}
    assert "--preset" in PRESET_ARGS["1"]


@pytest.mark.slow
def test_train_cli_interrupt_and_resume(tmp_path, monkeypatch):
    """Failure-recovery contract (SURVEY section 5): a run killed after
    its save-on-best checkpoint resumes via --resume with the epoch
    counter, best dice, and metrics history carried forward (reference
    resume semantics, train_model.py:185-190)."""
    monkeypatch.chdir(tmp_path)
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.train.cli import (
        train_main)
    common = [
        "--create_synthetic", "--num_samples", "3",
        "--synthetic_shape", "24", "24", "16",
        "--data_dir", str(tmp_path / "data"),
        "--batch_size", "1", "--lr", "1e-3",
        "--image_size", "16", "16", "16",
        "--features", "8", "16",
        "--preset", "lightweight",
        "--num_workers", "1", "--dtype", "float32", "--no_remat",
        "--experiment_name", "resume_smoke",
        "--ema_decay", "0.9",
    ]
    trainer1, hist1 = train_main(common + ["--epochs", "2"])
    ckpt = trainer1._ckpt_path()
    assert os.path.isdir(ckpt)
    n1 = len(hist1["train_loss"])

    # "crash": a fresh process would start from the checkpoint; emulate
    # with a fresh train_main invocation + --resume
    trainer2, hist2 = train_main(
        common + ["--epochs", "4", "--resume", ckpt])
    # resumed run continues the epoch count rather than restarting
    assert trainer2.start_epoch >= 1
    assert len(hist2["train_loss"]) >= n1 + 1   # old history + new epochs
    assert trainer2.best_dice >= trainer1.best_dice - 1e-9
    # EMA state survived the round trip into the resumed trainer
    assert trainer2.state.ema_params is not None
