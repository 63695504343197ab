"""Metrics tests: binary metric identities, per-class dice vs the reference
loop semantics (training.py:351-364), Hausdorff vs scipy coordinate-cloud
definition (utils/metrics.py:62-83)."""

import numpy as np
import pytest
from scipy.spatial.distance import directed_hausdorff

from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu import (
    metrics)


@pytest.fixture
def masks(rng):
    pred = (rng.random((16, 16, 16)) > 0.7).astype(np.float32)
    target = (rng.random((16, 16, 16)) > 0.7).astype(np.float32)
    return pred, target


def test_dice_perfect():
    m = np.ones((4, 4, 4), np.float32)
    assert float(metrics.dice_coefficient(m, m)) == pytest.approx(1.0)
    assert float(metrics.iou_score(m, m)) == pytest.approx(1.0)


def test_jaccard_dice_identity(masks):
    """IoU = D / (2 - D) (cf. reference main.py:506)."""
    pred, target = masks
    d = float(metrics.dice_coefficient(pred, target))
    iou = float(metrics.iou_score(pred, target))
    assert iou == pytest.approx(d / (2.0 - d), abs=1e-4)


def test_sensitivity_specificity(masks):
    pred, target = masks
    tp = np.sum(pred * target)
    fn = np.sum((1 - pred) * target)
    tn = np.sum((1 - pred) * (1 - target))
    fp = np.sum(pred * (1 - target))
    assert float(metrics.sensitivity(pred, target)) == \
        pytest.approx((tp + 1e-6) / (tp + fn + 1e-6), rel=1e-5)
    assert float(metrics.specificity(pred, target)) == \
        pytest.approx((tn + 1e-6) / (tn + fp + 1e-6), rel=1e-5)


def test_per_class_dice_matches_loop(rng):
    pred = rng.integers(0, 4, size=(8, 8, 8))
    target = rng.integers(0, 4, size=(8, 8, 8))
    got = np.asarray(metrics.per_class_dice(pred, target))
    per = []
    for c in range(1, 4):
        p = (pred == c).astype(np.float64)
        t = (target == c).astype(np.float64)
        per.append(2 * (p * t).sum() / (p.sum() + t.sum() + 1e-8))
    assert np.allclose(got[1:], per, atol=1e-5)
    assert float(metrics.mean_foreground_dice(pred, target)) == \
        pytest.approx(np.mean(per), abs=1e-5)


def test_mean_foreground_dice_from_logits(rng):
    logits = rng.normal(size=(2, 8, 8, 8, 4)).astype(np.float32)
    target = rng.integers(0, 4, size=(2, 8, 8, 8))
    labels = np.argmax(logits, axis=-1)
    assert float(metrics.mean_foreground_dice(logits, target)) == \
        pytest.approx(float(metrics.mean_foreground_dice(labels, target)))


def test_hausdorff_vs_scipy(rng):
    pred = np.zeros((12, 12, 12), bool)
    target = np.zeros((12, 12, 12), bool)
    pred[2:6, 2:6, 2:6] = True
    target[4:9, 4:9, 4:9] = True
    got = metrics.hausdorff_distance(pred, target)
    pc = np.column_stack(np.where(pred))
    tc = np.column_stack(np.where(target))
    want = max(directed_hausdorff(pc, tc)[0], directed_hausdorff(tc, pc)[0])
    assert got == pytest.approx(want, abs=1e-6)


def test_hausdorff_empty_is_inf():
    empty = np.zeros((4, 4, 4))
    full = np.ones((4, 4, 4))
    assert metrics.hausdorff_distance(empty, full) == float("inf")
    assert metrics.hausdorff_distance_95(empty, full) == float("inf")


def test_hd95_leq_hd(rng):
    pred = rng.random((16, 16, 16)) > 0.6
    target = rng.random((16, 16, 16)) > 0.6
    assert metrics.hausdorff_distance_95(pred, target) <= \
        metrics.hausdorff_distance(pred, target) + 1e-9


def test_region_dice_keys(rng):
    pred = rng.integers(0, 4, size=(8, 8, 8))
    target = rng.integers(0, 4, size=(8, 8, 8))
    rd = metrics.region_dice(pred, target)
    assert set(rd) == {"WT", "TC", "ET"}
    # WT dice == binary dice over any-tumor masks
    import numpy.testing as npt
    p = (pred > 0).astype(np.float32)
    t = (target > 0).astype(np.float32)
    npt.assert_allclose(float(rd["WT"]),
                        float(metrics.dice_coefficient(p, t)), rtol=1e-5)


def test_compute_all_metrics_contract(masks):
    pred, target = masks
    out = metrics.compute_all_metrics(pred, target)
    assert set(out) == {"dice", "iou", "sensitivity", "specificity",
                        "hausdorff"}
    facade = metrics.SegmentationMetrics.compute_all_metrics(pred, target)
    assert facade["dice"] == pytest.approx(out["dice"])


def test_percentile_axiswise_matches_numpy(rng):
    import jax.numpy as jnp
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops.stats import (
        percentile)
    x = rng.normal(size=(5, 100)).astype(np.float32)
    for q, ax in [(75.0, 1), (30.0, 0), (1.0, 1), (99.0, 0)]:
        got = np.asarray(percentile(jnp.asarray(x), q, axis=ax))
        np.testing.assert_allclose(got, np.percentile(x, q, axis=ax),
                                   rtol=1e-5, atol=1e-5)
