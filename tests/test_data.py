"""Data layer tests: NIfTI codec round-trip, synthetic generators,
dataset scanning (.npy AND .nii.gz — the reference's format mismatch bug
must not reproduce), on-device preprocessing, and the prefetch loader."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu import (
    config)
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.data import (
    BraTS2024Dataset, BrainTumorDataset, DeviceDataLoader,
    create_brats_data_loaders, create_enhanced_synthetic_data,
    create_synthetic_data, nifti, preprocess_batch, preprocess_image,
    preprocess_segmentation, synthesize_volume)

SMALL = (24, 24, 16)


# ---------------- NIfTI codec ----------------

@pytest.mark.parametrize("ext", ["nii", "nii.gz"])
@pytest.mark.parametrize("dtype", [np.float32, np.uint8, np.int16])
def test_nifti_roundtrip(tmp_path, rng, ext, dtype):
    if np.issubdtype(dtype, np.floating):
        data = rng.normal(size=(7, 9, 5)).astype(dtype)
    else:
        data = rng.integers(0, 100, size=(7, 9, 5)).astype(dtype)
    p = str(tmp_path / f"vol.{ext}")
    nifti.save(p, data, spacing=(1.0, 2.0, 3.0))
    img = nifti.load(p)
    np.testing.assert_array_equal(img.data, data)
    assert img.spacing == pytest.approx((1.0, 2.0, 3.0))
    np.testing.assert_allclose(np.diag(img.affine)[:3], (1, 2, 3))


def test_nifti_decompression_cap(tmp_path, rng, monkeypatch):
    """A .nii.gz whose decompressed size exceeds the cap is rejected
    instead of expanding into host memory (gzip bombs expand ~1000x, so
    the upload-size cap alone does not bound the allocation)."""
    data = np.zeros((64, 64, 64), np.float32)   # ~1 MB, compresses tiny
    p = str(tmp_path / "vol.nii.gz")
    nifti.save(p, data)
    monkeypatch.setattr(nifti, "MAX_DECOMPRESSED_BYTES", 100_000)
    with pytest.raises(ValueError, match="decompressed size exceeds"):
        nifti.load(p)
    monkeypatch.setattr(nifti, "MAX_DECOMPRESSED_BYTES", 2 << 30)
    assert nifti.load(p).data.shape == (64, 64, 64)


def test_nifti_scl_slope(tmp_path, rng):
    """scl_slope/inter scaling is applied on load."""
    import struct
    data = rng.integers(0, 50, size=(4, 4, 4)).astype(np.int16)
    p = str(tmp_path / "v.nii")
    nifti.save(p, data)
    with open(p, "r+b") as f:
        f.seek(112)
        f.write(struct.pack("<ff", 2.0, 10.0))   # slope=2, inter=10
    img = nifti.load(p)
    np.testing.assert_allclose(img.data, data * 2.0 + 10.0)


# ---------------- synthetic generators ----------------

def test_create_synthetic_data(tmp_path):
    paths = create_synthetic_data(3, str(tmp_path / "raw"), shape=SMALL)
    assert len(paths) == 3
    v = np.load(paths[0])
    assert v.shape == SMALL and v.dtype == np.float32
    assert 0.0 <= v.min() and v.max() <= 1.0


def test_synthesize_volume_labels():
    vol, seg = synthesize_volume(SMALL, seed=0)
    assert vol.shape == SMALL and seg.shape == SMALL
    assert set(np.unique(seg)) <= {0, 1, 2, 3}
    assert (seg > 0).any()


@pytest.mark.parametrize("fmt", ["nii.gz", "npy"])
def test_enhanced_synthetic_layout(tmp_path, fmt):
    d = create_enhanced_synthetic_data(
        5, str(tmp_path / "BraTS"), shape=SMALL, fmt=fmt, seed=1)
    train = BraTS2024Dataset(d, mode="train")
    val = BraTS2024Dataset(d, mode="val")
    assert len(train) == 4 and len(val) == 1   # 80/20 split
    item = train[0]
    assert item["image"].shape == (*SMALL, 4)
    assert item["mask"].shape == SMALL
    # raw BraTS labels on disk include 4, never 3
    labels = set(np.unique(item["mask"]))
    assert 3 not in labels and labels <= {0, 1, 2, 4}


def test_enhanced_synthetic_skull_stripped(tmp_path):
    """skull_stripped=True zeroes outside the brain mask (real BraTS is
    skull-stripped), enabling foreground cropping (bench.py --e2e)."""
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.inference import (
        cropping)
    d = create_enhanced_synthetic_data(
        1, str(tmp_path / "B"), shape=SMALL, fmt="npy", seed=3,
        tumor_prob=1.0, skull_stripped=True)
    item = BraTS2024Dataset(d, mode="train")[0]
    img = np.asarray(item["image"])
    assert img[0, 0, 0].max() == 0.0                 # corner is air
    lo, hi = cropping.nonzero_bbox(img)
    assert all(h - l < s for (l, h, s) in zip(lo, hi, SMALL))


def test_enhanced_synthetic_size_range_and_start_index(tmp_path):
    """size_range controls tumor burden (grade-ladder cohorts,
    benchmarks/quality_joint.py); start_index lets several calls fill
    one cohort dir without pid collisions."""
    d = str(tmp_path / "B")
    create_enhanced_synthetic_data(2, d, shape=SMALL, fmt="npy", seed=5,
                                   tumor_prob=1.0, size_range=(3, 4))
    create_enhanced_synthetic_data(2, d, shape=SMALL, fmt="npy", seed=6,
                                   tumor_prob=1.0, size_range=(9, 10),
                                   start_index=2)
    import glob
    cases = sorted(p.split("/")[-1] for p in glob.glob(d + "/*/*"))
    assert cases == [f"BraTS-Synth-{i:04d}" for i in range(4)]
    burden = {}
    for pid in cases:
        seg = glob.glob(f"{d}/*/{pid}/{pid}_seg.npy")[0]
        burden[pid] = (np.load(seg) > 0).mean()
    # radius 9 vs 3 => ~27x the burden (sphere volume), well separated
    assert min(burden["BraTS-Synth-0002"], burden["BraTS-Synth-0003"]) \
        > 5 * max(burden["BraTS-Synth-0000"], burden["BraTS-Synth-0001"])


def test_dataset_cache_serves_hits(tmp_path):
    """Reference bug (training.py:77-113): cache stops serving once full."""
    d = create_enhanced_synthetic_data(2, str(tmp_path / "B"), shape=SMALL,
                                       seed=2)
    ds = BraTS2024Dataset(d, mode="train", cache_size=1)
    a1 = ds[0]
    a2 = ds[0]
    assert a1 is a2          # identity => cache hit even at capacity


# ---------------- preprocessing ----------------

def test_preprocess_image_chain(rng):
    vol = jnp.asarray(rng.normal(10, 5, SMALL).astype(np.float32))
    out = preprocess_image(vol, out_size=(16, 16, 16))
    assert out.shape == (16, 16, 16)
    # z-scored: near-zero mean; trilinear downsampling of noise shrinks std
    assert abs(float(out.mean())) < 0.3
    assert 0.2 < float(out.std()) < 1.5


def test_preprocess_segmentation_remap():
    seg = jnp.asarray(np.array([[[0, 1], [2, 4]]], np.uint8))
    out = preprocess_segmentation(seg, out_size=(1, 2, 2))
    assert set(np.unique(np.asarray(out))) <= {0, 1, 2, 3}
    assert np.asarray(out)[0, 1, 1] == 3    # 4 -> 3


def test_preprocess_batch_augment_deterministic(rng):
    imgs = jnp.asarray(rng.normal(size=(2, *SMALL, 4)).astype(np.float32))
    segs = jnp.asarray(rng.integers(0, 5, size=(2, *SMALL)).astype(np.int32))
    k = jax.random.PRNGKey(7)
    b1 = preprocess_batch(imgs, segs, k, out_size=(16, 16, 16),
                          augment=True)
    b2 = preprocess_batch(imgs, segs, k, out_size=(16, 16, 16),
                          augment=True)
    np.testing.assert_array_equal(np.asarray(b1["image"]),
                                  np.asarray(b2["image"]))
    assert b1["image"].shape == (2, 16, 16, 16, 4)
    assert b1["mask"].shape == (2, 16, 16, 16)
    # different key => different augmentation
    b3 = preprocess_batch(imgs, segs, jax.random.PRNGKey(8),
                          out_size=(16, 16, 16), augment=True)
    assert not np.array_equal(np.asarray(b1["image"]),
                              np.asarray(b3["image"]))


def test_gamma_augmentation(rng):
    """Gamma warp: monotone per-volume contrast change that preserves
    the value range and never touches the segmentation."""
    import dataclasses
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.config import (
        AugmentConfig)
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.data.preprocess import (
        augment_pair)
    img = jnp.asarray(rng.normal(size=(8, 8, 8, 2)).astype(np.float32))
    seg = jnp.asarray(rng.integers(0, 4, size=(8, 8, 8)).astype(np.int32))
    only_gamma = AugmentConfig(rot90_prob=0.0, flip_prob=0.0,
                               noise_prob=0.0, intensity_prob=0.0,
                               gamma_prob=1.0)
    out, seg_out = augment_pair(jax.random.PRNGKey(3), img, seg,
                                only_gamma)
    np.testing.assert_array_equal(np.asarray(seg_out), np.asarray(seg))
    a, b = np.asarray(img), np.asarray(out)
    assert not np.array_equal(a, b)
    np.testing.assert_allclose(b.min(), a.min(), atol=1e-4)
    np.testing.assert_allclose(b.max(), a.max(), atol=1e-4)
    # monotone: ordering of voxel intensities is preserved
    flat_a, flat_b = a.ravel(), b.ravel()
    order = np.argsort(flat_a)
    assert (np.diff(flat_b[order]) >= -1e-6).all()
    # prob 0 => identity
    off = dataclasses.replace(only_gamma, gamma_prob=0.0)
    out2, _ = augment_pair(jax.random.PRNGKey(3), img, seg, off)
    np.testing.assert_array_equal(np.asarray(out2), a)


# ---------------- loaders ----------------

def test_device_data_loader_e2e(tmp_path):
    d = create_enhanced_synthetic_data(5, str(tmp_path / "B"), shape=SMALL,
                                       seed=3)
    train, val = create_brats_data_loaders(
        d, batch_size=2, num_workers=2, image_size=(16, 16, 16))
    assert len(train) == 2      # 4 samples, drop_last
    batches = list(iter(train))
    assert len(batches) == 2
    b = batches[0]
    assert isinstance(b["image"], jax.Array)
    assert b["image"].shape == (2, 16, 16, 16, 4)
    assert b["mask"].dtype == jnp.int32
    assert int(b["mask"].max()) <= 3    # remapped on device
    vb = list(iter(val))
    assert len(vb) == 1 and vb[0]["image"].shape[0] == 1


def test_brain_tumor_dataset_single_file(tmp_path, rng):
    p = str(tmp_path / "vol.nii.gz")
    nifti.save(p, rng.normal(size=(10, 12, 8)).astype(np.float32))
    ds = BrainTumorDataset([p], target_size=(16, 16, 16))
    item = ds[0]
    assert item["image"].shape == (16, 16, 16)
    assert float(item["image"].min()) >= 0.0
    assert float(item["image"].max()) <= 1.0 + 1e-6
    assert not item["segmentation"].any()
    assert item["path"] == p


def test_flat_layout_split_no_leak(tmp_path):
    """Flat (split-less) data dirs get a deterministic 80/20 split with
    disjoint patients between train and val."""
    import shutil
    src = create_enhanced_synthetic_data(5, str(tmp_path / "B"),
                                         shape=SMALL, seed=9)
    flat = tmp_path / "flat"
    flat.mkdir()
    for split in ("train", "val"):
        for p in (tmp_path / "B" / split).iterdir():
            shutil.move(str(p), str(flat / p.name))
    train = BraTS2024Dataset(str(flat), mode="train")
    val = BraTS2024Dataset(str(flat), mode="val")
    assert len(train) == 4 and len(val) == 1
    t_ids = {s["patient_id"] for s in train.samples}
    v_ids = {s["patient_id"] for s in val.samples}
    assert not (t_ids & v_ids)


def test_split_layout_missing_val_is_empty(tmp_path):
    d = create_enhanced_synthetic_data(2, str(tmp_path / "B"),
                                       shape=SMALL, seed=9)
    import shutil
    shutil.rmtree(str(tmp_path / "B" / "val"))
    val = BraTS2024Dataset(d, mode="val")
    assert len(val) == 0   # no silent reuse of train patients


def test_elastic_transform_2d_displacement_behaviour(rng):
    """Elastic warp (VERDICT round-1 item 9): identity at alpha=0,
    measurable displacement at alpha>0, mask warped with nearest
    (labels preserved), shapes unchanged."""
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.data.data_utils import (
        elastic_transform_2d, get_2d_augmentations)
    img = rng.normal(size=(48, 48)).astype(np.float32)
    mask = (rng.random((48, 48)) > 0.7).astype(np.int32) * 2

    out = elastic_transform_2d(img, alpha=0.0, rng=np.random.default_rng(0))
    np.testing.assert_allclose(out, img, atol=1e-5)

    # a grid image reveals the displacement field
    grid = np.zeros((64, 64), np.float32)
    grid[::8, :] = 1.0
    grid[:, ::8] = 1.0
    warped = elastic_transform_2d(grid, alpha=30.0, sigma=5.0,
                                  rng=np.random.default_rng(1))
    assert warped.shape == grid.shape
    assert np.abs(warped - grid).mean() > 0.01      # actually moved
    assert warped.min() >= -1e-4 and warped.max() <= 1.0 + 1e-4  # interp

    wi, wm = elastic_transform_2d(img, mask, alpha=20.0, sigma=5.0,
                                  rng=np.random.default_rng(2))
    assert wi.shape == img.shape and wm.shape == mask.shape
    assert set(np.unique(wm)) <= set(np.unique(mask))   # nearest labels
    assert wm.dtype == mask.dtype

    aug = get_2d_augmentations(flip_prob=0.0, rot_prob=0.0,
                               brightness=0.0, noise_sigma=0.0,
                               elastic_prob=1.0)
    ai, am = aug(img, mask, rng=np.random.default_rng(3))
    assert ai.shape == img.shape and am.shape == mask.shape
    assert np.abs(ai - img).mean() > 1e-4


def test_patch_sampling_loader(tmp_path):
    """nnU-Net-style patch mode: native-res bbox crop + foreground-biased
    random patches; patches containing tumor must appear."""
    d = create_enhanced_synthetic_data(4, str(tmp_path / "P"), shape=SMALL,
                                       seed=5, tumor_prob=1.0)
    ds = BraTS2024Dataset(d, mode="train")
    ps = (16, 16, 16)
    loader = DeviceDataLoader(ds, batch_size=2, patch_size=ps,
                              fg_patch_prob=1.0, shuffle=True, seed=7,
                              num_workers=2, drop_last=True)
    batches = list(iter(loader))
    assert len(batches) == len(ds) // 2
    fg_seen = 0
    for b in batches:
        assert b["image"].shape == (2, *ps, 4)
        assert b["mask"].shape == (2, *ps)
        fg_seen += int((np.asarray(b["mask"]) > 0).sum())
    # fg_patch_prob=1.0 with tumors in every volume: every patch is
    # centred on a tumor voxel
    assert fg_seen > 0
    # determinism within an epoch index: fresh loader, same seed
    loader2 = DeviceDataLoader(ds, batch_size=2, patch_size=ps,
                               fg_patch_prob=1.0, shuffle=True, seed=7,
                               num_workers=2, drop_last=True)
    b2 = list(iter(loader2))
    np.testing.assert_array_equal(np.asarray(batches[0]["image"]),
                                  np.asarray(b2[0]["image"]))


def test_patch_sampling_uniform_and_padding(tmp_path):
    """Patch larger than the foreground bbox must zero-pad, and
    fg_patch_prob=0 must still produce valid in-bounds patches."""
    d = create_enhanced_synthetic_data(2, str(tmp_path / "Q"), shape=SMALL,
                                       seed=9, tumor_prob=0.0)
    ds = BraTS2024Dataset(d, mode="train")
    loader = DeviceDataLoader(ds, batch_size=1, patch_size=(32, 32, 32),
                              fg_patch_prob=0.0, num_workers=1)
    b = next(iter(loader))
    assert b["image"].shape == (1, 32, 32, 32, 4)


def test_augment_rectangular_hw_traces_and_preserves_shape(rng):
    """rot90 k=1/3 swap H and W; rectangular volumes must still trace
    (k=2 only) instead of dying with a lax.cond branch-shape mismatch
    (the shipped high_quality preset is (192,192,128): H != W)."""
    import dataclasses
    import jax
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.config import (
        AugmentConfig)
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.data.preprocess import (
        augment_pair)

    cfg = dataclasses.replace(AugmentConfig(), rot90_prob=1.0)
    img = jnp.asarray(rng.normal(size=(8, 12, 8, 2)).astype(np.float32))
    seg = jnp.zeros((8, 12, 8), jnp.int32)
    out_i, out_s = jax.jit(
        lambda k, i, s: augment_pair(k, i, s, cfg))(
        jax.random.PRNGKey(0), img, seg)
    assert out_i.shape == img.shape and out_s.shape == seg.shape
    # square volumes still get shape-preserving rotations
    img_sq = jnp.asarray(rng.normal(size=(8, 12, 12, 2)).astype(np.float32))
    seg_sq = jnp.zeros((8, 12, 12), jnp.int32)
    oi, os_ = jax.jit(
        lambda k, i, s: augment_pair(k, i, s, cfg))(
        jax.random.PRNGKey(1), img_sq, seg_sq)
    assert oi.shape == img_sq.shape and os_.shape == seg_sq.shape


def test_patch_mode_bboxes_bucket_to_bounded_shapes(tmp_path):
    """Patch-mode normalization shapes round to multiples of 32
    (clamped to the volume), bounding the per-patient XLA compile
    count."""
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.data.pipeline import (
        DeviceDataLoader)
    d = create_enhanced_synthetic_data(2, str(tmp_path), shape=(70, 60, 50),
                                       seed=11)
    ds = BraTS2024Dataset(d, mode="train")
    loader = DeviceDataLoader(ds, batch_size=1, num_workers=1,
                              patch_size=(16, 16, 16))
    for idx in range(len(loader.dataset)):
        entry = loader._get_normalized(idx)
        shape = entry[1].shape
        for s, f in zip(shape, (70, 60, 50)):
            assert s % 32 == 0 or s == f, (shape, idx)


def test_abandoned_loader_does_not_deadlock_producer(tmp_path):
    """Dropping the epoch iterator mid-epoch must release the producer
    thread (it previously blocked forever on a full bounded queue,
    pinning every assembled batch)."""
    import threading
    import time as _time
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.data.pipeline import (
        DeviceDataLoader)
    d = create_enhanced_synthetic_data(6, str(tmp_path), shape=(24, 24, 16),
                                       seed=3)
    ds = BraTS2024Dataset(d, mode="train")
    loader = DeviceDataLoader(ds, batch_size=1, num_workers=2,
                              image_size=(16, 16, 16), prefetch=1)
    before = {t.ident for t in threading.enumerate()}
    it = iter(loader)
    next(it)
    it.close()      # abandon mid-epoch
    deadline = _time.time() + 15
    while _time.time() < deadline:
        extra = [t for t in threading.enumerate()
                 if t.ident not in before and t.is_alive()
                 and "ThreadPoolExecutor" not in (t.name or "")]
        if not extra:
            break
        _time.sleep(0.25)
    assert not extra, f"leaked threads: {extra}"


def test_stratified_band_cohort_covers_all_grades(tmp_path):
    """The r4 grade-accuracy stall was a degenerate val split (no
    grade 2, half grade 0) from stochastic tumor presence. The r5
    recipe — one deterministic band per grade, tumor_prob 0/1 —
    must put every grade in BOTH splits (the per-band 80/20 index
    split lands each band's tail in val)."""
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.data.dataset import (
        BraTS2024Dataset)
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.models.joint import (
        grade_from_volume)

    d = str(tmp_path / "cohort")
    shape = (96, 96, 64)
    # grade bands at this grid (ladder 0.1/1/5% -> r 5.2/11.2/19.2)
    bands = [(None, 0.0, 0), ((6, 10), 1.0, 8),
             ((12, 17), 1.0, 16), ((21, 26), 1.0, 24)]
    for band, p, start in bands:
        create_enhanced_synthetic_data(
            8, d, shape=shape, seed=11 + start, size_range=band,
            tumor_prob=p, start_index=start)

    total = int(np.prod(shape))
    for mode in ("train", "val"):
        ds = BraTS2024Dataset(d, mode=mode, augment=False)
        grades = []
        for i in range(len(ds)):
            s = ds[i]
            burden = int((np.asarray(s["mask"]) > 0).sum())
            grades.append(int(grade_from_volume(
                jnp.asarray(burden), total)))
        hist = np.bincount(grades, minlength=4)
        assert (hist > 0).all(), f"{mode} split missing a grade: {hist}"
