"""Batch-predict CLI (inference/cli.py): case discovery + end-to-end
mask/report emission (the headless counterpart of the reference's
``/upload`` route, main.py:829-910)."""

import json
import os

import numpy as np
import pytest

from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.config import (
    BRATS_MODALITIES)
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.data import (
    nifti)
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.inference import (
    discover_cases, predict_main)


def _ball(shape=(24, 24, 24), r=6):
    zz, yy, xx = np.mgrid[:shape[0], :shape[1], :shape[2]]
    c = np.array(shape) // 2
    return ((zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2
            <= r * r)


def _write_case(case_dir, with_seg, rng, n_modalities=4):
    case_dir.mkdir(parents=True)
    ball = _ball()
    for m in BRATS_MODALITIES[:n_modalities]:
        vol = rng.random((24, 24, 24)).astype(np.float32) + 2.0 * ball
        nifti.save(str(case_dir / f"{case_dir.name}_{m}.nii.gz"), vol)
    if with_seg:
        nifti.save(str(case_dir / f"{case_dir.name}_seg.nii.gz"),
                   ball.astype(np.uint8))


@pytest.fixture(scope="module")
def cohort(tmp_path_factory):
    rng = np.random.default_rng(0)
    root = tmp_path_factory.mktemp("cohort")
    _write_case(root / "case_a", with_seg=True, rng=rng)
    _write_case(root / "case_b", with_seg=False, rng=rng,
                n_modalities=2)
    return root


def test_discover_cohort(cohort):
    cases = discover_cases(str(cohort), BRATS_MODALITIES)
    assert [c["case_id"] for c in cases] == ["case_a", "case_b"]
    assert len(cases[0]["images"]) == 4 and cases[0]["seg"]
    assert len(cases[1]["images"]) == 2 and cases[1]["seg"] is None


def test_discover_single_file(tmp_path):
    p = tmp_path / "vol.npy"
    np.save(p, np.zeros((8, 8, 8), np.float32))
    cases = discover_cases(str(p), BRATS_MODALITIES)
    assert cases == [{"case_id": "vol", "images": [str(p)],
                      "seg": None}]


def test_discover_case_dir(cohort):
    cases = discover_cases(str(cohort / "case_a"), BRATS_MODALITIES)
    assert len(cases) == 1 and len(cases[0]["images"]) == 4


def test_discover_loose_files(tmp_path):
    for n in ("p1.npy", "p2.npy"):
        np.save(tmp_path / n, np.zeros((8, 8, 8), np.float32))
    cases = discover_cases(str(tmp_path), BRATS_MODALITIES)
    assert sorted(c["case_id"] for c in cases) == ["p1", "p2"]


def test_predict_end_to_end(cohort, tmp_path):
    out = tmp_path / "pred"
    summaries = predict_main([
        "--input", str(cohort), "--output", str(out),
        "--mode", "whole_volume", "--report", "--checkpoint", "none",
        "--image_size", "16", "16", "16", "--features", "8", "16",
        "--roi_size", "16", "16", "16"])
    assert len(summaries) == 2

    # masks decode to the native case shape with valid labels
    seg = nifti.load_volume(str(out / "case_a_seg.nii.gz"))
    assert seg.shape == (24, 24, 24)
    assert set(np.unique(seg)) <= {0, 1, 2, 3}

    # case_a has GT: real quality metrics; case_b: estimated
    rep_a = json.load(open(out / "case_a_report.json"))
    rep_b = json.load(open(out / "case_b_report.json"))
    assert rep_a["quality_metrics"]["estimated"] is False
    assert rep_b["quality_metrics"]["estimated"] is True
    assert rep_a["classification"]["primary_diagnosis"]
    assert "tumor_type" in rep_a
    assert rep_a["weights"] == "random_init"

    idx = json.load(open(out / "predictions.json"))
    assert [c["case_id"] for c in idx["cases"]] == ["case_a", "case_b"]
    assert all(os.path.exists(c["mask"]) for c in idx["cases"])


@pytest.mark.slow
def test_data_parallel_matches_sequential(cohort, tmp_path):
    """--data_parallel shards the cohort over the virtual 8-device CPU
    mesh (conftest) and must reproduce the sequential whole-volume
    path per case."""
    common = ["--input", str(cohort), "--mode", "whole_volume",
              "--checkpoint", "none", "--format", "npy",
              "--save_confidence",
              "--image_size", "16", "16", "16", "--features", "8",
              "16", "--roi_size", "16", "16", "16"]
    predict_main(["--output", str(tmp_path / "seq")] + common)
    predict_main(["--output", str(tmp_path / "dp"),
                  "--data_parallel"] + common)
    for cid in ("case_a", "case_b"):
        seq = np.load(tmp_path / "seq" / f"{cid}_seg.npy")
        dp = np.load(tmp_path / "dp" / f"{cid}_seg.npy")
        # identical up to bf16 fusion-order ties at class boundaries
        assert (seq != dp).mean() < 0.01
        cseq = np.load(tmp_path / "seq" / f"{cid}_conf.npy")
        cdp = np.load(tmp_path / "dp" / f"{cid}_conf.npy")
        np.testing.assert_allclose(cseq, cdp, atol=0.05)


@pytest.mark.slow
def test_window_parallel_matches_sequential(cohort, tmp_path):
    """--window_parallel splits each volume's window grid over the
    virtual 8-device mesh and must reproduce the sequential
    sliding-window path per case (same Gaussian blend, psum-merged)."""
    common = ["--input", str(cohort), "--mode", "sliding_window",
              "--checkpoint", "none", "--format", "npy",
              "--save_confidence",
              "--image_size", "16", "16", "16", "--features", "8",
              "16", "--roi_size", "16", "16", "16"]
    predict_main(["--output", str(tmp_path / "seq")] + common)
    predict_main(["--output", str(tmp_path / "wp"),
                  "--window_parallel"] + common)
    for cid in ("case_a", "case_b"):
        seq = np.load(tmp_path / "seq" / f"{cid}_seg.npy")
        wp = np.load(tmp_path / "wp" / f"{cid}_seg.npy")
        # identical up to fp32 accumulation-order ties at boundaries
        assert (seq != wp).mean() < 0.01
        cseq = np.load(tmp_path / "seq" / f"{cid}_conf.npy")
        cwp = np.load(tmp_path / "wp" / f"{cid}_conf.npy")
        np.testing.assert_allclose(cseq, cwp, atol=0.05)


@pytest.mark.slow
def test_cli_adopts_trained_checkpoint(cohort, tmp_path):
    """Auto-discovery of the newest compatible best_* checkpoint under
    --models_dir (the serving handoff, shared via
    train.checkpoints.adopt_trained_weights)."""
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.config import (
        get_config)
    import dataclasses
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.inference.predictor import (
        Predictor)
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.train.checkpoints import (
        save_params_only)

    cfg = get_config("standard")
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, features=(8, 16)),
        data=dataclasses.replace(cfg.data, image_size=(16, 16, 16)))
    params = Predictor(cfg).seg_variables["params"]
    models_dir = tmp_path / "models"
    models_dir.mkdir()
    ckpt = save_params_only(str(models_dir / "best_t"), params)

    out = tmp_path / "pred"
    predict_main([
        "--input", str(cohort / "case_a"), "--output", str(out),
        "--mode", "whole_volume", "--report",
        "--models_dir", str(models_dir),
        "--image_size", "16", "16", "16", "--features", "8", "16",
        "--roi_size", "16", "16", "16"])
    idx = json.load(open(out / "predictions.json"))
    assert idx["weights"] == ckpt
    rep = json.load(open(out / "case_a_report.json"))
    assert rep["weights"] == ckpt


def test_data_parallel_rejects_sliding_window(cohort, tmp_path):
    with pytest.raises(SystemExit):
        predict_main(["--input", str(cohort),
                      "--output", str(tmp_path / "x"),
                      "--mode", "cropped", "--data_parallel",
                      "--checkpoint", "none"])


def test_predicted_mask_preserves_input_affine(tmp_path):
    """Output masks must carry the scan's voxel->world affine (sform)
    so they overlay correctly on the original in viewers — the codec
    writes identity when none is given, which silently de-registers
    masks for any scan with real spacing/orientation."""
    rng = np.random.default_rng(3)
    case_dir = tmp_path / "in" / "case_aff"
    case_dir.mkdir(parents=True)
    affine = np.array([
        [0.0, -1.0, 0.0, 12.5],
        [0.9, 0.0, 0.0, -7.0],
        [0.0, 0.0, 2.4, 30.0],
        [0.0, 0.0, 0.0, 1.0],
    ])
    ball = _ball()
    for m in BRATS_MODALITIES:
        vol = rng.random((24, 24, 24)).astype(np.float32) + 2.0 * ball
        nifti.save(str(case_dir / f"case_aff_{m}.nii.gz"), vol,
                   affine=affine)

    # header-only affine read matches the full decode
    p0 = str(case_dir / f"case_aff_{BRATS_MODALITIES[0]}.nii.gz")
    np.testing.assert_allclose(nifti.load_affine(p0),
                               nifti.load(p0).affine, atol=1e-5)

    out = tmp_path / "out"
    predict_main([
        "--input", str(tmp_path / "in"), "--output", str(out),
        "--mode", "whole_volume", "--checkpoint", "none",
        "--image_size", "16", "16", "16", "--features", "8", "16",
        "--roi_size", "16", "16", "16", "--save_confidence", "--report",
    ])
    for suffix in ("seg", "conf"):
        got = nifti.load(str(out / f"case_aff_{suffix}.nii.gz")).affine
        np.testing.assert_allclose(got, affine, atol=1e-5)

    # clinical volumes use the real voxel volume (|det| of the 3x3
    # affine block = 0.9*1.0*2.4 mm^3), not the reference's 1 mm^3
    # assumption (main.py:473)
    report = json.load(open(out / "case_aff_report.json"))
    labels = nifti.load(str(out / "case_aff_seg.nii.gz")).data
    vol_mm3 = float(report["measurements"]["tumor_volume"].split()[0])
    want = float((labels > 0).sum()) * abs(np.linalg.det(affine[:3, :3]))
    assert vol_mm3 == pytest.approx(want, rel=0.01)


def test_brats_labels_export(cohort, tmp_path):
    """--brats_labels writes enhancing tumor as raw label 4 (on-disk
    BraTS convention, config.py BRATS_LABEL_REMAP inverse); default
    output keeps the model's contiguous 0..3."""
    out_a = tmp_path / "contig"
    out_b = tmp_path / "brats"
    common = ["--input", str(cohort / "case_a"),
              "--mode", "whole_volume", "--checkpoint", "none",
              "--image_size", "16", "16", "16", "--features", "8", "16",
              "--roi_size", "16", "16", "16"]
    predict_main(common + ["--output", str(out_a)])
    predict_main(common + ["--output", str(out_b), "--brats_labels"])
    a = nifti.load(str(out_a / "case_a_seg.nii.gz")).data
    b = nifti.load(str(out_b / "case_a_seg.nii.gz")).data
    assert a.max() <= 3 and 4 not in np.unique(a)
    assert 3 not in np.unique(b)
    np.testing.assert_array_equal(b == 4, a == 3)
    np.testing.assert_array_equal(b[b != 4], a[a != 3])


def test_discover_flat_multicase_directory(tmp_path):
    """A flat directory holding several cases' modality files (no
    subdirs) yields one case per prefix — previously only the
    alphabetically-first case survived, silently dropping the rest."""
    for cid in ("caseA", "caseB"):
        for m in ("t1c", "t2f"):
            np.save(tmp_path / f"{cid}_{m}.npy",
                    np.zeros((8, 8, 8), np.float32))
    np.save(tmp_path / "caseB_seg.npy", np.zeros((8, 8, 8), np.uint8))
    cases = discover_cases(str(tmp_path), BRATS_MODALITIES)
    assert [c["case_id"] for c in cases] == ["caseA", "caseB"]
    assert all(len(c["images"]) == 2 for c in cases)
    assert cases[0]["seg"] is None and cases[1]["seg"]


def test_flat_discovery_seg_prefix_collision(tmp_path):
    """case_1 must not claim case_10's seg file: the seg match needs
    the ``cid + "_"`` separator, else sorted() hands case_1 the wrong
    ground truth and --report metrics silently corrupt."""
    for cid in ("case_1", "case_10"):
        for m in ("t1c", "t2f"):
            np.save(tmp_path / f"{cid}_{m}.npy",
                    np.zeros((8, 8, 8), np.float32))
    np.save(tmp_path / "case_10_seg.npy", np.zeros((8, 8, 8), np.uint8))
    cases = {c["case_id"]: c
             for c in discover_cases(str(tmp_path), BRATS_MODALITIES)}
    assert cases["case_1"]["seg"] is None
    assert cases["case_10"]["seg"].endswith("case_10_seg.npy")


def test_flat_discovery_orders_by_modality_sequence(tmp_path):
    """Flat-dir grouping must order channels by the ``modalities``
    sequence (like _case_from_dir), not by filename sort — a
    non-alphabetical modality tuple previously shuffled channels
    between the two discovery paths."""
    mods = ("t2w", "t1c")          # deliberately non-alphabetical
    for cid in ("pA", "pB"):
        for m in mods:
            np.save(tmp_path / f"{cid}_{m}.npy",
                    np.zeros((8, 8, 8), np.float32))
    cases = discover_cases(str(tmp_path), mods)
    for c in cases:
        names = [os.path.basename(p) for p in c["images"]]
        assert names == [f"{c['case_id']}_{m}.npy" for m in mods]


def test_dotted_case_ids_survive_stemming(tmp_path):
    """Case ids containing dots (BIDS-style) must not truncate at the
    first dot — distinct cases previously collided."""
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.inference._files import (
        volume_stem)
    assert volume_stem("sub-01.ses-02_seg.nii.gz") == "sub-01.ses-02_seg"
    assert volume_stem("plain.npy") == "plain"
    p = tmp_path / "sub-01.ses-02.nii"
    import numpy as _np
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.data import (
        nifti)
    nifti.save(str(p), _np.zeros((4, 4, 4), _np.float32))
    cases = discover_cases(str(p), BRATS_MODALITIES)
    assert cases[0]["case_id"] == "sub-01.ses-02"


def test_partial_modalities_tile_not_collapse():
    """A 2-of-4-modality volume uses BOTH channels (cyclic tiling), not
    channel 0 repeated — real modalities were silently discarded."""
    import dataclasses
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.config import (
        Config)
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.inference import (
        Predictor)
    cfg = Config()
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, features=(8, 16),
                                  in_channels=4,
                                  compute_dtype="float32", remat=False),
        data=dataclasses.replace(cfg.data, image_size=(16, 16, 16)))
    pred = Predictor(cfg)
    two = np.stack([np.full((8, 8, 8), 1.0, np.float32),
                    np.full((8, 8, 8), 2.0, np.float32)], axis=-1)
    out = pred._canon(two)
    assert out.shape[-1] == 4
    np.testing.assert_array_equal(out[..., 2], two[..., 0])
    np.testing.assert_array_equal(out[..., 3], two[..., 1])


def test_weight_adoption_keeps_sliding_window_program(tmp_path):
    """load_seg_params swaps weights through the predictor's mutable
    slot — the sliding-window callable identity (jit's static key) must
    survive, and the new weights must take effect."""
    import dataclasses
    import jax
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.config import (
        Config)
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.inference import (
        Predictor)
    cfg = Config()
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, features=(8, 16),
                                  in_channels=1,
                                  compute_dtype="float32", remat=False),
        data=dataclasses.replace(cfg.data, image_size=(16, 16, 16)),
        inference=dataclasses.replace(cfg.inference,
                                      roi_size=(16, 16, 16)))
    pred = Predictor(cfg)
    sw_before = pred._sw
    vol = np.random.default_rng(0).normal(
        0.5, 0.2, (16, 16, 16)).astype(np.float32)
    c1 = pred.segment_with_confidence(vol, mode="sliding_window")[1]
    new_params = jax.tree_util.tree_map(
        lambda p: p + 0.05, pred.seg_variables["params"])
    pred.load_seg_params(new_params)
    assert pred._sw is sw_before          # no retrace-forcing rebuild
    c2 = pred.segment_with_confidence(vol, mode="sliding_window")[1]
    assert not np.allclose(np.asarray(c1), np.asarray(c2))
