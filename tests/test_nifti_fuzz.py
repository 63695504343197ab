"""Property-based malformed-input fuzz over BOTH NIfTI decoders
(VERDICT r2 item 8): the pure-Python codec (data/nifti.py) and the
native C++ reader (csrc/host_preprocess.cpp via data/native.py).

Invariants under arbitrary header lies, truncations, corrupt gz and
garbage bytes:
  * ``native.read_nifti`` returns an ndarray or None — it must NEVER
    raise (exceptions crossing the C ABI would std::terminate the
    serving process) and never crash/OOM the host.
  * ``nifti.load`` returns a NiftiImage or raises a CONTROLLED error
    (ValueError/OSError/EOFError/zlib.error/struct.error) — nothing
    else, no hang, no crash.
  * when BOTH succeed they agree (same shape, allclose values) — the
    two decoders must not silently interpret the same bytes
    differently.

The round-2 hardening sweep fixed 4 decoder bugs found by review;
this generator covers the remaining mutation space mechanically.
"""

import gzip
import struct
import zlib

import numpy as np
import pytest

from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.data import (
    native, nifti)

CONTROLLED = (ValueError, OSError, EOFError, zlib.error, struct.error)


def _base_bytes(rng, dtype=np.float32, shape=(6, 5, 4)):
    import io
    import os
    import tempfile
    if np.issubdtype(dtype, np.floating):
        data = rng.normal(size=shape).astype(dtype)
    else:
        data = rng.integers(0, 90, size=shape).astype(dtype)
    fd, p = tempfile.mkstemp(suffix=".nii")
    os.close(fd)
    nifti.save(p, data)
    with open(p, "rb") as f:
        raw = f.read()
    os.unlink(p)
    return bytearray(raw)


def _run_both(path):
    """Exercise both decoders; return (native_out, python_out) where
    python_out is None when a controlled error was raised."""
    got_native = native.read_nifti(str(path))     # must never raise
    try:
        got_py = nifti.load(str(path)).data
    except CONTROLLED:
        got_py = None
    return got_native, got_py


def _check_agreement(a, b, ctx):
    if a is None or b is None:
        return
    assert a.shape == tuple(b.shape)[:3] or a.shape == b.shape, ctx
    np.testing.assert_allclose(
        np.asarray(a, np.float32).ravel(),
        np.asarray(b, np.float32).ravel()[:a.size],
        rtol=1e-4, atol=1e-4, equal_nan=True, err_msg=str(ctx))


@pytest.mark.slow
def test_fuzz_random_header_corruption(tmp_path, rng):
    """Random byte flips across the 352-byte header."""
    raw = _base_bytes(rng)
    for trial in range(120):
        mut = bytearray(raw)
        for _ in range(int(rng.integers(1, 6))):
            off = int(rng.integers(0, 352))
            mut[off] = int(rng.integers(0, 256))
        p = tmp_path / f"h{trial}.nii"
        p.write_bytes(bytes(mut))
        got_native, got_py = _run_both(p)
        _check_agreement(got_native, got_py, ("header", trial))


@pytest.mark.slow
def test_fuzz_truncation(tmp_path, rng):
    """Truncation at every interesting length regime."""
    raw = _base_bytes(rng)
    cuts = sorted(set(
        [0, 1, 4, 40, 107, 347, 348, 351, 352, 353, len(raw) - 1]
        + [int(rng.integers(0, len(raw))) for _ in range(40)]))
    for i, cut in enumerate(cuts):
        p = tmp_path / f"t{i}.nii"
        p.write_bytes(bytes(raw[:cut]))
        got_native, got_py = _run_both(p)
        _check_agreement(got_native, got_py, ("trunc", cut))


@pytest.mark.slow
def test_fuzz_targeted_field_lies(tmp_path, rng):
    """Adversarial values in the security-relevant header fields."""
    raw = _base_bytes(rng)
    cases = []
    # dim[0] (ndim) at 40, dim[1..3] at 42/44/46 (int16)
    for v in (-1, 0, 1, 3, 7, 8, 999, 32767, -32768):
        for off in (40, 42, 44, 46):
            cases.append(("h", off, v))
    # datatype (70) / bitpix (72)
    for v in (-1, 0, 1, 2, 3, 4, 16, 64, 255, 512, 1024, 32767):
        cases.append(("h", 70, v))
        cases.append(("h", 72, v))
    # vox_offset (108), scl_slope (112), scl_inter (116) (float32)
    for v in (-1.0, 0.0, 1.5, 351.0, 352.0, 1e9, -1e9,
              float("nan"), float("inf")):
        for off in (108, 112, 116):
            cases.append(("f", off, v))
    for i, (fmt, off, v) in enumerate(cases):
        mut = bytearray(raw)
        struct.pack_into("<h" if fmt == "h" else "<f", mut, off,
                         v if fmt == "f" else int(v))
        p = tmp_path / f"l{i}.nii"
        p.write_bytes(bytes(mut))
        got_native, got_py = _run_both(p)
        _check_agreement(got_native, got_py, (off, v))


@pytest.mark.slow
def test_fuzz_gz_layer(tmp_path, rng):
    """Corrupt/nested/odd gzip containers around a valid .nii."""
    raw = bytes(_base_bytes(rng))
    good_gz = gzip.compress(raw)

    variants = {
        "valid": good_gz,
        "double": gzip.compress(good_gz),
        "trunc_small": good_gz[:10],
        "trunc_mid": good_gz[: len(good_gz) // 2],
        "flipped_crc": good_gz[:-4] + bytes(4),
        "garbage": bytes(rng.integers(0, 256, 500).astype(np.uint8)),
        "empty": b"",
        "header_only_gz": gzip.compress(raw[:352]),
    }
    for i in range(30):
        mut = bytearray(good_gz)
        off = int(rng.integers(0, len(mut)))
        mut[off] = int(rng.integers(0, 256))
        variants[f"flip{i}"] = bytes(mut)

    for name, payload in variants.items():
        p = tmp_path / f"{name}.nii.gz"
        p.write_bytes(payload)
        got_native, got_py = _run_both(p)
        _check_agreement(got_native, got_py, name)
        if name == "valid":
            assert got_native is not None and got_py is not None


@pytest.mark.slow
def test_fuzz_huge_dim_lie_is_bounded(tmp_path, rng):
    """A header claiming 32767^3 voxels must be rejected quickly by
    both decoders, not attempted as a ~140 TB allocation."""
    raw = _base_bytes(rng)
    for dims in ((32767, 32767, 32767), (20000, 20000, 1),
                 (1 << 14, 1 << 14, 8)):
        mut = bytearray(raw)
        struct.pack_into("<hhh", mut, 42, *dims)
        p = tmp_path / "huge.nii"
        p.write_bytes(bytes(mut))
        assert native.read_nifti(str(p)) is None
        with pytest.raises(CONTROLLED):
            nifti.load(str(p))
