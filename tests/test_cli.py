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
