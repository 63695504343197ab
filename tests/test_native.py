"""Native C++ host-preprocess library: build, decode parity with the
Python NIfTI codec, resample and clip/z-score correctness."""

import numpy as np
import pytest

from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.data import (
    native, nifti)


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return native.get_lib()


@pytest.mark.parametrize("ext", ["nii", "nii.gz"])
@pytest.mark.parametrize("dtype", [np.float32, np.int16, np.uint8])
def test_native_nifti_matches_python(tmp_path, rng, lib, ext, dtype):
    if np.issubdtype(dtype, np.floating):
        data = rng.normal(size=(9, 7, 5)).astype(dtype)
    else:
        data = rng.integers(0, 90, size=(9, 7, 5)).astype(dtype)
    p = str(tmp_path / f"v.{ext}")
    nifti.save(p, data)
    got = native.read_nifti(p)
    assert got is not None
    want = nifti.load(p).data
    np.testing.assert_allclose(got, want.astype(np.float32), atol=1e-6)


def test_native_scl_slope(tmp_path, rng, lib):
    import struct
    data = rng.integers(0, 50, size=(4, 4, 4)).astype(np.int16)
    p = str(tmp_path / "v.nii")
    nifti.save(p, data)
    with open(p, "r+b") as f:
        f.seek(112)
        f.write(struct.pack("<ff", 3.0, -1.0))
    got = native.read_nifti(p)
    np.testing.assert_allclose(got, data * 3.0 - 1.0, atol=1e-5)


def test_native_zoom_matches_jax(rng, lib):
    """Native trilinear zoom uses half-pixel centers == jax.image.resize."""
    import jax.numpy as jnp
    import jax
    vol = rng.normal(size=(7, 9, 5)).astype(np.float32)
    got = native.zoom(vol, (14, 13, 8), order=1)
    want = np.asarray(jax.image.resize(jnp.asarray(vol), (14, 13, 8),
                                       method="trilinear"))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_native_zoom_nearest(rng, lib):
    vol = rng.integers(0, 5, size=(6, 6, 6)).astype(np.float32)
    got = native.zoom(vol, (12, 12, 12), order=0)
    # nearest upsample by 2 with half-pixel centers = repeat each voxel
    want = vol.repeat(2, 0).repeat(2, 1).repeat(2, 2)
    np.testing.assert_array_equal(got, want)


def test_native_clip_zscore_matches_numpy(rng, lib):
    x = (rng.normal(size=(20, 20, 20)) * 30 + 5).astype(np.float32)
    got = native.clip_zscore(x, 1.0, 99.0)
    c = np.clip(x, np.percentile(x, 1), np.percentile(x, 99))
    want = (c - c.mean()) / (c.std() + 1e-8)
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


def test_native_clip_zscore_failure_falls_back(rng, lib, monkeypatch):
    """When the C clip_zscore reports failure (nonzero rc, e.g.
    bad_alloc on the tmp copy) the wrapper must return None so callers
    use the Python path — NOT hand back an unnormalized buffer."""
    class FakeLib:
        def clip_zscore_f32(self, *a):
            return 1
    monkeypatch.setattr(native, "get_lib", lambda: FakeLib())
    x = rng.normal(size=(4, 4, 4)).astype(np.float32)
    assert native.clip_zscore(x) is None


def test_native_clip_zscore_reports_success(rng, lib):
    """The rebuilt library returns rc=0 on the happy path (the binding
    declares restype c_int; a stale void-returning .so would fail)."""
    import ctypes
    x = (rng.normal(size=(8, 8, 8)) * 10).astype(np.float32)
    buf = np.array(x, np.float32, order="C")
    rc = lib.clip_zscore_f32(buf.ctypes.data_as(ctypes.c_void_p),
                             buf.size, 1.0, 99.0,
                             ctypes.c_float(1e-8))
    assert rc == 0


def test_dataset_uses_native(tmp_path, rng, lib):
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.data.dataset import (
        load_any_volume)
    data = rng.normal(size=(8, 6, 4)).astype(np.float32)
    p = str(tmp_path / "x.nii.gz")
    nifti.save(p, data)
    got = load_any_volume(p)
    np.testing.assert_allclose(got, data, atol=1e-6)


def test_native_rejects_corrupt_headers(tmp_path, rng, lib):
    """Malformed NIfTI headers must yield None (Python-codec fallback),
    never an OOB read or an exception across the C ABI: a lying bitpix
    (smaller than the datatype's element size), negative dims, and
    truncated/garbage files."""
    import struct

    vol = rng.normal(size=(6, 6, 6)).astype(np.float64)
    good = tmp_path / "good.nii"
    nifti.save(str(good), vol)          # float64 -> datatype 64
    raw = bytearray(good.read_bytes())

    # 1) bitpix lies small (8) while datatype stays float64 (8 bytes):
    #    the old size check believed bitpix and read 8x out of bounds
    lying = bytearray(raw)
    struct.pack_into("<h", lying, 72, 8)
    # truncate the data section so the honest check must fail
    lying = lying[:352 + 6 * 6 * 6 * 1]
    p = tmp_path / "lying.nii"
    p.write_bytes(bytes(lying))
    assert native.read_nifti(str(p)) is None

    # 2) negative dims
    neg = bytearray(raw)
    struct.pack_into("<h", neg, 42, -6)          # dim[1] = -6
    p2 = tmp_path / "neg.nii"
    p2.write_bytes(bytes(neg))
    assert native.read_nifti(str(p2)) is None

    # 3) absurd ndim (dim[0] = 30000) — used to read past the header
    nd = bytearray(raw)
    struct.pack_into("<h", nd, 40, 30000)
    p3 = tmp_path / "ndim.nii"
    p3.write_bytes(bytes(nd))
    assert native.read_nifti(str(p3)) is None

    # 4) plain garbage
    p4 = tmp_path / "junk.nii"
    p4.write_bytes(b"definitely not a nifti file")
    assert native.read_nifti(str(p4)) is None

    # sanity: the untouched file still decodes
    out = native.read_nifti(str(good))
    assert out is not None and out.shape == (6, 6, 6)
