"""Cross-layer integration: train -> checkpoint -> Predictor -> serve
analysis (the reference's implied end-to-end story, which its dead
training path never completed)."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.config import Config
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu import models
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.data import (
    create_brats_data_loaders, create_enhanced_synthetic_data)
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.inference import Predictor
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.train import (
    ModernBrainTumorTrainer, restore_checkpoint, create_train_state)

FEATS = (8, 16)
IMG = (16, 16, 16)


def tiny_config(tmp):
    c = Config()
    return c.replace(
        model=dataclasses.replace(c.model, features=FEATS, in_channels=4,
                                  compute_dtype="float32", remat=False),
        data=dataclasses.replace(c.data, image_size=IMG),
        inference=dataclasses.replace(c.inference, roi_size=IMG,
                                      sw_batch_size=2),
        models_dir=os.path.join(tmp, "models"),
        results_dir=os.path.join(tmp, "results"),
        use_tensorboard=False)


@pytest.mark.slow
def test_train_checkpoint_predict_roundtrip(tmp_path):
    cfg = tiny_config(str(tmp_path))
    data_dir = create_enhanced_synthetic_data(
        5, str(tmp_path / "data"), shape=(24, 24, 16), seed=11)
    train_loader, val_loader = create_brats_data_loaders(
        data_dir, batch_size=2, num_workers=1, image_size=IMG)
    model = models.UNet3D(out_channels=4, features=FEATS,
                          dtype=jnp.float32)
    trainer = ModernBrainTumorTrainer(
        model, learning_rate=1e-3, experiment_name="integ",
        config=cfg, hausdorff_every=0)
    trainer.train(train_loader, val_loader, num_epochs=1)
    ckpt = trainer._ckpt_path()
    assert os.path.isdir(ckpt)

    # restore into a fresh state and hand the params to the Predictor
    fresh = create_train_state(model, cfg, jax.random.PRNGKey(3),
                               (1, *IMG, 4))
    restored, meta = restore_checkpoint(ckpt, fresh)
    predictor = Predictor(cfg, seg_model=model)
    predictor.load_seg_params(restored.params)

    vol = np.random.default_rng(0).normal(
        size=(20, 20, 12, 4)).astype(np.float32)
    seg_sw = predictor.segment_tumor(vol, mode="sliding_window")
    seg_wv = predictor.segment_tumor(vol, mode="whole_volume")
    assert seg_sw.shape == vol.shape[:3]
    assert seg_wv.shape == vol.shape[:3]
    labels, conf = predictor.segment_with_confidence(vol)
    assert conf.min() >= 0.0 and conf.max() <= 1.0 + 1e-6

    # trained weights produce the same labels through both trainer-eval
    # and predictor whole-volume paths on the model's native size
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(1, *IMG, 4)).astype(np.float32))
    out_direct = model.apply(
        {"params": restored.params, "batch_stats": restored.batch_stats},
        x, train=False)["logits"]
    # predictor uses freshly-initialized batch_stats; force them equal
    predictor.seg_variables = {
        "params": restored.params,
        "batch_stats": restored.batch_stats}
    out_pred = predictor.seg_model.apply(
        predictor.seg_variables, x, train=False)["logits"]
    np.testing.assert_allclose(np.asarray(out_direct),
                               np.asarray(out_pred), atol=1e-6)
