"""Sliding-window inference tests: grid coverage, blending correctness
(a constant-output model must reproduce its output exactly), equivalence
to a single forward when the volume == ROI, and the Predictor facade."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu import (
    config as cfg_mod, models)
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.inference import (
    Predictor, compute_patch_starts, gaussian_importance_map,
    sliding_window_inference)


def test_patch_starts_cover():
    starts = compute_patch_starts(240, 128, 0.5)
    assert starts[0] == 0 and starts[-1] == 112
    # full coverage
    covered = np.zeros(240, bool)
    for s in starts:
        covered[s:s + 128] = True
    assert covered.all()
    assert compute_patch_starts(100, 128, 0.5) == [0]
    assert compute_patch_starts(128, 128, 0.5) == [0]


def test_gaussian_map_properties():
    g = np.asarray(gaussian_importance_map((16, 16, 16)))
    assert g.shape == (16, 16, 16, 1)
    assert g.max() == pytest.approx(1.0)
    assert g.min() > 0.0
    c = g[8, 8, 8, 0]
    assert c > g[0, 0, 0, 0]     # peaked at center


def test_constant_model_blends_to_constant():
    """Any positive blending of a constant field must return it exactly."""
    const = jnp.asarray(np.arange(4, dtype=np.float32))

    def apply_fn(params, patches):
        b = patches.shape[0]
        return jnp.broadcast_to(const, (b, *patches.shape[1:4], 4))

    vol = jnp.zeros((20, 24, 18, 1), jnp.float32)
    out = sliding_window_inference(
        {}, vol, apply_fn, roi_size=(8, 8, 8), overlap=0.5,
        sw_batch_size=3, out_channels=4)
    assert out.shape == (20, 24, 18, 4)
    np.testing.assert_allclose(
        np.asarray(out), np.broadcast_to(const, (20, 24, 18, 4)),
        atol=1e-5)


def test_single_patch_equals_direct_forward(rng):
    model = models.UNet3D(out_channels=4, features=(8, 16),
                          dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(16, 16, 16, 2)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x[None], train=False)

    def apply_fn(v, p):
        return model.apply(v, p, train=False)["logits"]

    out_sw = sliding_window_inference(
        variables, x, apply_fn, roi_size=(16, 16, 16), overlap=0.5,
        sw_batch_size=1, out_channels=4)
    out_direct = apply_fn(variables, x[None])[0]
    np.testing.assert_allclose(np.asarray(out_sw), np.asarray(out_direct),
                               atol=1e-4, rtol=1e-4)


def test_pad_and_crop_small_volume(rng):
    """Volumes smaller than the ROI are edge-padded and cropped back."""
    def apply_fn(params, patches):
        return patches[..., :1] * 2.0    # 1-channel 'logits'

    vol = jnp.asarray(rng.normal(size=(5, 6, 7, 1)).astype(np.float32))
    out = sliding_window_inference(
        {}, vol, apply_fn, roi_size=(8, 8, 8), overlap=0.5,
        sw_batch_size=1, out_channels=1)
    assert out.shape == (5, 6, 7, 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(vol) * 2.0,
                               atol=1e-5)


@pytest.fixture(scope="module")
def tiny_predictor():
    import dataclasses
    cfg = cfg_mod.Config()
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, features=(8, 16),
                                  in_channels=1,
                                  compute_dtype="float32", remat=False),
        data=dataclasses.replace(cfg.data, image_size=(16, 16, 16)),
        inference=dataclasses.replace(
            cfg.inference, roi_size=(16, 16, 16), sw_batch_size=2))
    return Predictor(cfg)


def test_predictor_segment_modes(tiny_predictor, rng):
    vol = rng.normal(size=(20, 20, 20)).astype(np.float32)
    seg_sw = tiny_predictor.segment_tumor(vol, mode="sliding_window")
    seg_whole = tiny_predictor.segment_tumor(vol, mode="whole_volume")
    assert seg_sw.shape == (20, 20, 20)
    assert seg_whole.shape == (20, 20, 20)
    assert seg_sw.dtype == np.int8
    assert set(np.unique(seg_sw)) <= {0, 1, 2, 3}


def test_predictor_tta_flip_equivariant(tiny_predictor, rng):
    """Mirror TTA averages over the full flip group, so its output is
    exactly equivariant: tta(flip(v)) == flip(tta(v)). Single-pass
    inference does NOT have this property — it is the point of TTA."""
    vol = rng.normal(size=(16, 16, 16)).astype(np.float32)
    lab, conf = tiny_predictor.segment_with_confidence(
        vol, mode="whole_volume", tta=True)
    lab_f, conf_f = tiny_predictor.segment_with_confidence(
        np.ascontiguousarray(np.flip(vol, axis=0)),
        mode="whole_volume", tta=True)
    np.testing.assert_allclose(np.flip(conf_f, axis=0), conf,
                               atol=1e-5)
    assert lab.shape == (16, 16, 16) and lab.dtype == np.int8
    assert conf.min() >= 0.0 and conf.max() <= 1.0


def test_predictor_tta_sliding_window(tiny_predictor, rng):
    vol = rng.normal(size=(20, 20, 20)).astype(np.float32)
    lab = tiny_predictor.segment_tumor(vol, mode="sliding_window",
                                       tta=True)
    assert lab.shape == (20, 20, 20)
    assert set(np.unique(lab)) <= {0, 1, 2, 3}


def test_predictor_classify(tiny_predictor, rng):
    vol = rng.normal(size=(16, 16, 16)).astype(np.float32)
    name, conf = tiny_predictor.classify_tumor(vol)
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.config import CLASS_NAMES
    assert name in CLASS_NAMES
    assert 0.0 <= conf <= 1.0
    # empty segmentation short-circuit (reference main.py:404-406)
    name2, conf2 = tiny_predictor.classify_tumor(
        vol, segmentation=np.zeros((16, 16, 16)))
    assert name2 == "No Tumor Detected" and conf2 == pytest.approx(0.95)
