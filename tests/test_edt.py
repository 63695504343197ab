"""On-device EDT / Hausdorff vs scipy ground truth."""

import numpy as np
import pytest
from scipy import ndimage

from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops.edt import (
    edt_squared, hausdorff_distance_device)
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu import metrics


def test_edt_matches_scipy_3d(rng):
    mask = rng.random((12, 14, 10)) > 0.85
    mask[0, 0, 0] = True   # ensure non-empty
    got = np.asarray(edt_squared(mask))
    want = ndimage.distance_transform_edt(~mask) ** 2
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_edt_2d_and_full_mask(rng):
    mask = np.ones((8, 8), bool)
    assert np.all(np.asarray(edt_squared(mask)) == 0)
    mask2 = np.zeros((8, 8), bool)
    mask2[3, 4] = True
    got = np.asarray(edt_squared(mask2))
    want = ndimage.distance_transform_edt(~mask2) ** 2
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_device_hausdorff_matches_host(rng):
    pred = np.zeros((16, 16, 12), bool)
    target = np.zeros((16, 16, 12), bool)
    pred[2:7, 3:8, 2:6] = True
    target[5:12, 6:13, 4:9] = True
    got = float(hausdorff_distance_device(pred, target))
    want = metrics.hausdorff_distance(pred, target)
    assert got == pytest.approx(want, abs=1e-4)
    got95 = float(hausdorff_distance_device(pred, target,
                                            percentile=95.0))
    want95 = metrics.hausdorff_distance_95(pred, target)
    assert got95 == pytest.approx(want95, abs=0.75)  # discrete quantile


def test_device_hausdorff_empty_inf():
    a = np.zeros((6, 6, 6), bool)
    b = np.ones((6, 6, 6), bool)
    assert np.isinf(float(hausdorff_distance_device(a, b)))
