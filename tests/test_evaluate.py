"""Cohort evaluation CLI (inference/evaluate.py): metric math,
NaN/inf exclusion semantics, and pairing against a BraTS-style GT
tree. Standalone scorer the reference lacks (its quality metrics live
only inside the training loop, training.py:341-369)."""

import json
import math

import numpy as np
import pytest

from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.data import (
    nifti)
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.inference import (
    discover_pairs, evaluate_case, evaluate_main)
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.inference.evaluate import (
    aggregate)


def _cube(shape=(16, 16, 16), lo=4, hi=10, label=1):
    v = np.zeros(shape, np.int32)
    v[lo:hi, lo:hi, lo:hi] = label
    return v


def test_perfect_prediction():
    gt = _cube(label=2)
    m = evaluate_case(gt.copy(), gt)
    assert m["dice_c2"] == pytest.approx(1.0)
    assert math.isnan(m["dice_c1"])          # absent in both => excluded
    assert m["dice_WT"] == pytest.approx(1.0)
    assert m["hd95_WT"] == pytest.approx(0.0)
    assert m["iou"] == pytest.approx(1.0)
    assert m["sensitivity"] == pytest.approx(1.0)


def test_known_overlap_dice_and_hd():
    gt = _cube(lo=4, hi=10)                  # 6^3 cube
    pred = _cube(lo=4, hi=10)
    pred[:, :, 9] = 0                        # shave one z-plane: 6*6*5 left
    m = evaluate_case(pred, gt)
    inter, ps, ts = 180.0, 180.0, 216.0
    assert m["dice_c1"] == pytest.approx(2 * inter / (ps + ts))
    assert m["iou"] == pytest.approx(inter / ts)
    assert m["sensitivity"] == pytest.approx(inter / ts)
    # worst pred-surface point is 1 voxel from GT surface
    assert m["hd95_WT"] <= 1.0 + 1e-6
    # empty-vs-present region: HD inf, dice 0
    gt_et = _cube(label=3)
    m2 = evaluate_case(_cube(label=1), gt_et)
    assert math.isinf(m2["hd95_ET"])
    assert m2["dice_ET"] == pytest.approx(0.0)


def test_spacing_scales_hd():
    gt = _cube(lo=4, hi=10)
    pred = np.roll(gt, 2, axis=0)            # 2-voxel z shift
    m1 = evaluate_case(pred, gt, spacing=(1.0, 1.0, 1.0))
    m3 = evaluate_case(pred, gt, spacing=(3.0, 1.0, 1.0))
    assert m3["hd95_WT"] == pytest.approx(3.0 * m1["hd95_WT"], rel=0.3)


def test_aggregate_excludes_nonfinite():
    agg = aggregate({"a": {"x": 1.0}, "b": {"x": float("nan")},
                     "c": {"x": float("inf")}, "d": {"x": 3.0}})
    assert agg["x"]["mean"] == pytest.approx(2.0)
    assert agg["x"]["n"] == 2 and agg["x"]["n_excluded"] == 2


def test_shape_mismatch_raises():
    with pytest.raises(ValueError):
        evaluate_case(np.zeros((8, 8, 8), np.int32),
                      np.zeros((8, 8, 9), np.int32))


@pytest.fixture()
def cohort_with_preds(tmp_path):
    gt_root = tmp_path / "gt"
    pred_dir = tmp_path / "pred"
    pred_dir.mkdir()
    for cid, shift in [("case_a", 0), ("case_b", 1)]:
        d = gt_root / cid
        d.mkdir(parents=True)
        gt = _cube(label=1) + _cube(lo=6, hi=8, label=2)
        nifti.save(str(d / f"{cid}_seg.nii.gz"), gt.astype(np.uint8))
        nifti.save(str(pred_dir / f"{cid}_seg.nii.gz"),
                   np.roll(gt, shift, axis=1).astype(np.uint8))
    (pred_dir / "orphan_seg.nii.gz").write_bytes(b"")  # no GT: skipped
    return gt_root, pred_dir


def test_discover_pairs(cohort_with_preds):
    gt_root, pred_dir = cohort_with_preds
    pairs = discover_pairs(str(pred_dir), str(gt_root))
    assert [p["case_id"] for p in pairs] == ["case_a", "case_b"]
    assert all("seg" in p["gt"] for p in pairs)


def test_evaluate_main_end_to_end(cohort_with_preds, capsys):
    gt_root, pred_dir = cohort_with_preds
    out = pred_dir / "eval.json"
    csv_path = pred_dir / "eval.csv"
    result = evaluate_main(["--pred", str(pred_dir),
                            "--gt", str(gt_root),
                            "--output", str(out),
                            "--csv", str(csv_path)])
    assert result["n_cases"] == 2
    assert result["cases"]["case_a"]["dice_c1"] == pytest.approx(1.0)
    assert result["cases"]["case_b"]["dice_c1"] < 1.0
    on_disk = json.load(open(out))
    assert on_disk["aggregate"]["dice_WT"]["n"] == 2
    assert "dice_WT" in capsys.readouterr().out
    import csv as _csv
    rows = list(_csv.reader(open(csv_path)))
    assert rows[0][0] == "case_id" and "dice_WT" in rows[0]
    assert [r[0] for r in rows[1:]] == ["case_a", "case_b"]


def test_hd95_uses_gt_header_spacing(tmp_path):
    """Without --spacing, HD95 comes out in real mm from the GT NIfTI
    header: doubling the z spacing must scale a pure-z surface offset's
    HD accordingly."""
    import numpy as np
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.data import (
        nifti)
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.inference import (
        evaluate_main)

    gt = np.zeros((16, 16, 16), np.uint8)
    gt[4:8, 4:12, 4:12] = 1
    pred = np.zeros_like(gt)
    pred[6:10, 4:12, 4:12] = 1     # shifted 2 voxels along axis 0

    def run(spacing_z, tag):
        pdir = tmp_path / f"pred_{tag}"
        gdir = tmp_path / f"gt_{tag}" / "case_x"
        pdir.mkdir(); gdir.mkdir(parents=True)
        aff = np.diag([spacing_z, 1.0, 1.0, 1.0])
        nifti.save(str(gdir / "case_x_seg.nii.gz"), gt, affine=aff)
        nifti.save(str(pdir / "case_x_seg.nii.gz"), pred, affine=aff)
        res = evaluate_main(["--pred", str(pdir),
                             "--gt", str(tmp_path / f"gt_{tag}")])
        return res["cases"]["case_x"]["hd95_WT"]

    hd1 = run(1.0, "a")
    hd2 = run(2.0, "b")
    assert hd2 == pytest.approx(2.0 * hd1, rel=0.05)


def test_raw_brats_label_convention_scores_correctly(tmp_path):
    """A raw BraTS GT (enhancing tumor = 4 on disk) scored against a
    contiguous-label prediction (ET = 3) must give perfect ET/TC dice
    for identical masks — both sides normalize to one convention."""
    import numpy as np
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.inference.evaluate import (
        evaluate_case)

    gt = np.zeros((12, 12, 12), np.int32)
    gt[2:6, 2:6, 2:6] = 1        # necrotic
    gt[6:9, 6:9, 6:9] = 2        # edema
    gt[9:11, 9:11, 9:11] = 4     # enhancing, raw on-disk label
    pred = np.where(gt == 4, 3, gt)   # the model's contiguous output

    m = evaluate_case(pred, gt)
    assert m["dice_ET"] == pytest.approx(1.0)
    assert m["dice_TC"] == pytest.approx(1.0)
    assert m["dice_WT"] == pytest.approx(1.0)
    assert m["dice_c3"] == pytest.approx(1.0)


def test_label4_not_remapped_beyond_brats_classes():
    """num_classes > 4 means label 4 is a genuine class: no silent
    merge into class 3."""
    import numpy as np
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.inference.evaluate import (
        evaluate_case)

    gt = np.zeros((8, 8, 8), np.int32)
    gt[0:4] = 3
    gt[4:8] = 4
    m = evaluate_case(gt.copy(), gt, num_classes=5)
    assert m["dice_c3"] == pytest.approx(1.0)
    assert m["dice_c4"] == pytest.approx(1.0)
