"""Foreground-crop inference: bbox plan, round trip, predictor parity.

The cropped mode is the nnU-Net-style production path for skull-stripped
volumes (zero background); labels inside the foreground window must match
the plain sliding-window labels computed on the same window.
"""

import numpy as np
import pytest

from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.inference import (
    bucket_shape, crop_offsets, extract_crop, nonzero_bbox, paste_full,
    plan_crop)


def _brain(shape=(64, 72, 56), lo=(10, 14, 8), hi=(50, 60, 44), c=4,
           seed=0):
    rng = np.random.default_rng(seed)
    vol = np.zeros((*shape, c), np.float32)
    sl = tuple(slice(l, h) for l, h in zip(lo, hi))
    vol[sl] = rng.uniform(0.2, 1.0,
                          tuple(h - l for l, h in zip(lo, hi)) + (c,))
    return vol


def test_nonzero_bbox_exact():
    vol = _brain()
    lo, hi = nonzero_bbox(vol)
    assert lo == (10, 14, 8) and hi == (50, 60, 44)


def test_nonzero_bbox_empty_volume_is_full_extent():
    lo, hi = nonzero_bbox(np.zeros((8, 9, 10), np.float32))
    assert lo == (0, 0, 0) and hi == (8, 9, 10)


def test_bucket_shape_rounding_and_caps():
    # extent 40 -> 48 (multiple 16); min_size floors; cap at rounded full
    assert bucket_shape((40, 5, 300), (64, 64, 155), multiple=16,
                        min_size=16) == (48, 16, 160)


def test_crop_offsets_centred_and_clamped():
    box = ((10, 14, 8), (50, 60, 44))
    full = (64, 72, 56)
    bucket = (48, 48, 48)
    offs = crop_offsets(box, bucket, full)
    # centred: centre of box 30,37,26 minus 24 -> 6,13,2; all fit
    assert offs == (6, 13, 2)
    # clamped when the bucket hits the far edge
    assert crop_offsets(((30, 0, 0), (64, 8, 8)), (48, 16, 16),
                        full) == (16, 0, 0)


def test_extract_paste_round_trip():
    vol = _brain()
    offs, bucket = plan_crop(vol, multiple=16, min_size=16)
    crop = extract_crop(vol, offs, bucket)
    assert crop.shape[:3] == bucket
    back = paste_full(crop, offs, vol.shape[:3], fill=0.0)
    np.testing.assert_array_equal(back, vol)   # zero background restored


def test_extract_pads_past_edge():
    vol = _brain(shape=(32, 32, 20), lo=(0, 0, 0), hi=(32, 32, 20))
    offs, bucket = plan_crop(vol, multiple=16, min_size=16)
    assert bucket == (32, 32, 32)        # W rounds past the volume
    crop = extract_crop(vol, offs, bucket)
    assert crop.shape[:3] == (32, 32, 32)
    # EDGE padding (the sliding-window engine's pad mode — after
    # z-scoring, exact zeros are a value the network never sees):
    # overhang replicates the last in-volume slice
    for k in range(20, 32):
        np.testing.assert_array_equal(crop[:, :, k], crop[:, :, 19])


@pytest.mark.slow
def test_predictor_cropped_matches_sliding_window_in_foreground():
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.config import (
        get_config)
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.inference import (
        Predictor)

    cfg = get_config("lightweight")
    pred = Predictor(config=cfg)
    vol = _brain(shape=(48, 48, 48), lo=(4, 6, 8), hi=(40, 42, 44),
                 c=cfg.model.in_channels)

    offs, bucket = plan_crop(vol, multiple=16,
                             min_size=min(cfg.inference.roi_size))
    crop = extract_crop(vol, offs, bucket)

    lab_crop = pred.segment_tumor(vol, mode="cropped")
    lab_ref = pred.segment_tumor(crop, mode="sliding_window")

    sl = tuple(slice(o, min(o + b, s))
               for o, b, s in zip(offs, bucket, vol.shape[:3]))
    src = tuple(slice(0, s.stop - s.start) for s in sl)
    np.testing.assert_array_equal(lab_crop[sl], lab_ref[src])
    # outside the window: background
    mask = np.ones(vol.shape[:3], bool)
    mask[sl] = False
    assert np.all(lab_crop[mask] == 0)

    labs, conf = pred.segment_with_confidence(vol, mode="cropped")
    np.testing.assert_array_equal(labs, lab_crop)
    assert np.all(conf[mask] == 1.0)


def test_corner_background_bbox_after_zscore():
    """z-score maps the zero background to a nonzero constant; the
    corner-background rule must still find the same bbox."""
    vol = _brain()
    z = (vol - vol.mean()) / vol.std()
    assert nonzero_bbox(z) == nonzero_bbox(vol)
    # no constant background (noise everywhere): full extent, no crop
    noisy = np.random.default_rng(1).normal(size=(8, 9, 10, 2))
    lo, hi = nonzero_bbox(noisy)
    assert lo == (0, 0, 0) and hi == (8, 9, 10)


def test_bucket_ladder_canonicalizes_shapes():
    """With a ladder, nearby extents land on the same canonical bucket
    (one compiled program instead of one per multiple-of-16 shape)."""
    ladder = (96, 128, 160, 192, 224, 256)
    full = (240, 240, 155)
    # extents 130..160 all snap to rung 160 (multiple-16 would give
    # 144, 160 — two shapes)
    for e in (130, 144, 150, 160):
        assert bucket_shape((e, e, e), full, ladder=ladder) == \
            (160, 160, 160)
    # caps still apply: W axis full=155 -> cap 160
    assert bucket_shape((150, 181, 200), full, ladder=ladder) == \
        (160, 192, 160)
    # past the last rung: falls back to multiple rounding, capped
    assert bucket_shape((300, 64, 64), (400, 240, 155),
                        ladder=ladder) == (304, 96, 96)
    # ladder=None preserves the original behaviour
    assert bucket_shape((130, 130, 130), full) == (144, 144, 144)


def test_plan_crop_uses_ladder():
    vol = _brain(shape=(200, 200, 120), lo=(10, 10, 10),
                 hi=(150, 160, 110))
    offs, bucket = plan_crop(vol, ladder=(96, 128, 160, 192, 224))
    assert bucket == (160, 160, 128)   # W capped at ceil(120/16)*16
    # offsets keep the window inside the volume
    assert all(0 <= o and o + b <= max(f, b)
               for o, b, f in zip(offs, bucket, vol.shape[:3]))
