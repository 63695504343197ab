"""Tests for the bootstrap scripts, data_utils library, LossMetrics,
and the native voxel mesher."""

import numpy as np
import pytest

from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu import (
    environment, metrics, setup_project)
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.data import (
    data_utils, nifti)
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.utils.mesh import (
    mesh_surface_area, surface_area_voxel, voxel_surface_mesh)


def test_validate_dependencies():
    ok, status = environment.validate_dependencies(verbose=False)
    assert ok, f"missing deps: {status}"
    assert status["jax"] and status["flax"]


def test_validate_modules():
    ok, failures = setup_project.validate_modules()
    assert ok, failures


def test_setup_and_validate_dirs(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    setup_project.create_directories(".")
    ok, missing = setup_project.validate_directories(".")
    assert ok, missing
    assert (tmp_path / "data" / "raw").is_dir()


def test_preprocess_volume_interpolates(rng):
    """Must be real interpolation, not np.resize tiling
    (reference bug, data_utils.py:21-31)."""
    vol = np.zeros((8, 8, 8), np.float32)
    vol[4:, :, :] = 1.0   # step function
    out = data_utils.preprocess_volume(vol, (16, 16, 16),
                                       normalize=False)
    assert out.shape == (16, 16, 16)
    # tiling would scramble the step; interpolation preserves monotone
    # structure along axis 0
    profile = out.mean(axis=(1, 2))
    assert profile[0] < 0.1 and profile[-1] > 0.9


def test_augment_volume_3d_shapes(rng):
    vol = rng.normal(size=(8, 8, 8)).astype(np.float32)
    seg = rng.integers(0, 4, (8, 8, 8)).astype(np.uint8)
    v2, s2 = data_utils.augment_volume_3d(vol, seg, rng=rng)
    assert v2.shape == vol.shape and s2.shape == seg.shape
    assert v2.flags["C_CONTIGUOUS"]


def test_2d_slices_and_augs(rng):
    vol = rng.normal(size=(4, 8, 8)).astype(np.float32)
    seg = np.zeros((4, 8, 8), np.uint8)
    seg[2, 2:6, 2:6] = 1
    slices = data_utils.create_2d_slices_from_3d(vol, seg)
    assert len(slices) == 4
    fg_only = data_utils.create_2d_slices_from_3d(vol, seg,
                                                  min_foreground=1)
    assert len(fg_only) == 1 and fg_only[0]["index"] == 2
    aug = data_utils.get_2d_augmentations()
    img, m = aug(slices[0]["image"], slices[0]["segmentation"], rng=rng)
    assert img.shape == (8, 8) and m.shape == (8, 8)


def test_class_weights():
    seg = np.zeros((10, 10, 10), np.uint8)
    seg[:2] = 1
    w = data_utils.calculate_class_weights([seg], num_classes=4)
    assert w.shape == (4,)
    assert w[1] > w[0] > 0     # rarer class 1 weighted higher
    assert w[2] == 0 and w[3] == 0   # absent classes


def test_validate_data_integrity(tmp_path, rng):
    a = rng.normal(size=(4, 4, 4)).astype(np.float32)
    nifti.save(str(tmp_path / "img.nii"), a)
    nifti.save(str(tmp_path / "seg.nii"), np.zeros((4, 4, 4), np.uint8))
    nifti.save(str(tmp_path / "seg_bad.nii"),
               np.zeros((5, 4, 4), np.uint8))
    rep = data_utils.validate_data_integrity(
        [str(tmp_path / "img.nii")] * 2 + ["missing.nii"],
        [str(tmp_path / "seg.nii"), str(tmp_path / "seg_bad.nii"),
         str(tmp_path / "seg.nii")])
    assert len(rep["valid"]) == 1
    assert len(rep["shape_mismatch"]) == 1
    assert len(rep["load_error"]) == 1


def test_train_val_split_deterministic():
    items = list(range(20))
    t1, v1 = data_utils.create_train_val_split(items, 0.25, seed=42)
    t2, v2 = data_utils.create_train_val_split(items, 0.25, seed=42)
    assert t1 == t2 and v1 == v2
    assert len(v1) == 5 and sorted(t1 + v1) == items


def test_dataset_statistics(rng):
    vols = [rng.normal(size=(4, 4, 4)) for _ in range(3)]
    s = data_utils.get_dataset_statistics(vols)
    assert s["count"] == 3 and len(s["shapes"]) == 3
    assert "global_mean" in s


def test_loss_metrics_variants(rng):
    import jax.numpy as jnp
    logits = rng.normal(size=(1, 4, 4, 4, 2)).astype(np.float32)
    onehot = np.eye(2)[rng.integers(0, 2, (1, 4, 4, 4))]
    d = float(metrics.LossMetrics.dice_loss(logits, onehot))
    assert 0.0 <= d <= 1.0
    c = float(metrics.LossMetrics.combined_loss(logits, onehot))
    assert np.isfinite(c)


def test_voxel_mesh_cube():
    mask = np.zeros((6, 6, 6), bool)
    mask[1:4, 1:4, 1:4] = True     # 3x3x3 cube
    verts, faces = voxel_surface_mesh(mask)
    # surface area of a 3-cube = 6 faces * 9 = 54
    assert surface_area_voxel(mask) == 54.0
    assert mesh_surface_area(verts, faces) == pytest.approx(54.0)
    assert len(verts) == 56        # (4^3 - 2^3) cube-surface corner grid
    empty_v, empty_f = voxel_surface_mesh(np.zeros((3, 3, 3), bool))
    assert len(empty_v) == 0 and len(empty_f) == 0


def test_isosurface_area_sphere_accuracy():
    """Smooth surface estimator within a few % of the analytic value
    (VERDICT round-1 item 8: voxel faces overestimated ~1.5x, skewing
    compactness -> risk_score vs the reference's marching cubes)."""
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.utils.mesh import (
        isosurface_area)
    for r in (6, 10, 16):
        n = 2 * r + 10
        g = np.mgrid[:n, :n, :n] - n // 2
        mask = (g ** 2).sum(0) <= r * r
        analytic = 4.0 * np.pi * r * r
        got = isosurface_area(mask)
        assert abs(got / analytic - 1.0) < 0.03, (r, got, analytic)


def test_marching_tetrahedra_watertight_and_smooth_mesh():
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.utils.mesh import (
        marching_tetrahedra, smooth_surface_mesh, mesh_surface_area)
    g = np.mgrid[:24, :24, :24] - 12
    mask = (g ** 2).sum(0) <= 64
    verts, faces = marching_tetrahedra(mask.astype(np.float32), 0.5)
    assert len(faces) > 0
    edges = np.sort(np.concatenate(
        [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]]), axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()          # closed surface
    sv, sf = smooth_surface_mesh(mask)
    assert len(sf) > 0
    # the smooth mesh area is close to analytic, unlike the voxel mesh
    analytic = 4.0 * np.pi * 64
    assert abs(mesh_surface_area(sv, sf) / analytic - 1.0) < 0.12
    # empty mask
    ev, ef = smooth_surface_mesh(np.zeros((4, 4, 4), bool))
    assert len(ev) == 0 and len(ef) == 0


def test_mesh_work_cap_bounds_pathological_masks():
    """A speckled high-volume mask (a degenerate segmentation) must mesh
    in bounded time/memory via the max_voxels downsampling cap, with
    vertices scaled back to the input grid."""
    import time
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.utils.mesh import (
        downsample_mask, smooth_surface_mesh)
    rng = np.random.default_rng(0)
    mask = rng.random((120, 120, 96)) < 0.3    # ~415k speckled voxels
    t0 = time.time()
    verts, faces = smooth_surface_mesh(mask, max_voxels=50_000)
    dt = time.time() - t0
    assert len(faces) > 0
    assert dt < 30.0
    # vertices live on the original grid's extent, not the pooled one
    assert verts.max() > 60
    assert verts.max() <= 122 * 2   # scaled by the pool factor, bounded
    # the any-pool keeps thin structures
    thin = np.zeros((8, 8, 8), bool)
    thin[4, :, :] = True
    assert downsample_mask(thin, 2).any()
    assert downsample_mask(thin, 2).shape == (4, 4, 4)
