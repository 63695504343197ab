"""End-to-end bench path (bench.py run_e2e): wire formats + pipeline.

Covers the round-5 e2e transfer attack: uint8 affine-quantized H2D ship
(dequantized on device before clip+z-score), 2-bit packed crop-only
label return with host unpack+paste, and the depth-2 pipelined device
loop. The attach tunnel (~35 MB/s) makes wire bytes the e2e floor on
the real rig — these tests pin the *correctness* of the byte-reduction
machinery on CPU so the on-chip A/B only has to measure speed.

Reference analogue: upload->segmentation->result in
``/root/reference/main.py:828-910`` (always end-to-end from bytes, never
HBM-resident).
"""

import argparse
import json
import tempfile

import jax.numpy as jnp
import numpy as np
import pytest

import bench
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.models import (
    UNet3D,
)


def _tiny_setup():
    model = UNet3D(out_channels=4, features=(8, 16), dtype=jnp.float32)
    import jax

    x_init = jnp.zeros((1, 32, 32, 32, 4), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x_init, train=False)

    def apply_fn(v, patches):
        return model.apply(v, patches, train=False)["logits"]

    return variables, apply_fn


def _args(n, fmt, ship, workers=2, group=1):
    return argparse.Namespace(
        e2e=n, e2e_fmt=fmt, e2e_workers=workers, e2e_ship=ship,
        e2e_group=group, verbose=True, roi=None, overlap=0.5,
        sw_batch=1, bucket_multiple=16)


@pytest.fixture(scope="module")
def small_world(tmp_path_factory, monkeypatch_module):
    """Shrink the e2e world so the flagship flow runs in seconds on CPU:
    a (64, 64, 40) 'full' volume, a 2-case npy fixture, a 2-level net."""
    tmp = tmp_path_factory.mktemp("e2e_fixture_root")
    monkeypatch_module.setattr(bench, "VOLUME_SHAPE", (64, 64, 40))
    monkeypatch_module.setattr(tempfile, "tempdir", str(tmp))
    variables, apply_fn = _tiny_setup()
    return variables, apply_fn


@pytest.fixture(scope="module")
def monkeypatch_module():
    from _pytest.monkeypatch import MonkeyPatch

    mp = MonkeyPatch()
    yield mp
    mp.undo()


def test_e2e_bf16_and_u8_agree(small_world, capsys):
    variables, apply_fn = small_world
    ref = bench.run_e2e(_args(2, "npy", "bf16"), variables, apply_fn)
    got = bench.run_e2e(_args(2, "npy", "u8"), variables, apply_fn)
    # both produced a full label map per case and a JSON line each
    lines = [l for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    assert len(lines) == 2
    for l in lines:
        d = json.loads(l)
        assert d["value"] > 0
        assert "volumes/sec end-to-end" in d["metric"]
    assert ref["ship"] == "bf16" and "u8_label_agreement" not in ref
    # the margin-envelope gate passed: flips happen only at genuine
    # decision-boundary voxels, never at wide margins
    assert got["ship"] == "u8"
    assert got["u8_wide_margin_flips"] == 0
    assert got["u8_label_agreement"] >= 0.99
    # on the clean synthetic fixture quantization flips (almost) no
    # labels: full-cohort checksums stay within 0.5% of lossless
    assert ref["_checksum"] > 0
    assert abs(got["_checksum"] - ref["_checksum"]) <= 0.005 * ref["_checksum"]


def test_e2e_grouped_dispatch_matches_per_case(small_world, capsys):
    """--e2e_group stages G cases into one jit'd scan launch (amortizes
    the attach's fixed per-dispatch cost). The grouped path must produce
    byte-identical label maps to per-case dispatch, including the padded
    final group (3 cases at G=2 exercises the repeat-last-case pad)."""
    variables, apply_fn = small_world
    ref = bench.run_e2e(_args(3, "npy", "u8", group=1), variables,
                        apply_fn)
    got = bench.run_e2e(_args(3, "npy", "u8", group=2), variables,
                        apply_fn)
    capsys.readouterr()
    assert ref["group"] == 1 and got["group"] == 2
    assert got["_checksum"] == ref["_checksum"]


def test_bench_watchdog_fires_and_disarms():
    """The mid-run wedge guard: a disarmed watchdog stays silent; an
    armed one that times out emits a self-describing tpu_unavailable
    JSON line and exits 1 (so the driver's unattended run records the
    outage instead of an unexplained rc=124)."""
    import subprocess
    import sys
    import time

    done = bench.arm_watchdog(5.0)
    done.set()
    time.sleep(0.2)  # must not fire

    r = subprocess.run(
        [sys.executable, "-c",
         "import sys, time; sys.path.insert(0, '.');"
         "import bench; bench.arm_watchdog(0.5); time.sleep(10)"],
        capture_output=True, text=True, timeout=30)
    assert r.returncode == 1
    d = json.loads(r.stdout.strip().splitlines()[-1])
    assert d["error"] == "tpu_unavailable"
    assert "wedged" in d["detail"]


def test_e2e_u8_quant_roundtrip_error_bound():
    """Host-side affine quantization: worst-case dequant error is
    step/2 = (hi-lo)/510 of the modality range (the device multiplies
    q * step + lo exactly as decode's inverse)."""
    rng = np.random.default_rng(0)
    v = rng.uniform(-37.0, 1912.0, size=(17, 13, 11)).astype(np.float32)
    lo = float(v.min())
    step = (float(v.max()) - lo) / 255.0
    q = np.clip((v - lo) * (1.0 / step) + 0.5, 0, 255).astype(np.uint8)
    back = q.astype(np.float32) * step + lo
    assert np.abs(back - v).max() <= step / 2 + 1e-3


def test_e2e_pack_unpack_roundtrip():
    """2-bit pack (device) and the host unpack used by unpack_paste are
    exact inverses for label values 0-3."""
    rng = np.random.default_rng(1)
    seg = rng.integers(0, 4, size=(8, 6, 12)).astype(np.uint8)
    s = seg.reshape(8, 6, 3, 4)
    packed = (s[..., 0] | (s[..., 1] << 2) | (s[..., 2] << 4)
              | (s[..., 3] << 6))
    lab = np.empty((8, 6, 3, 4), np.uint8)
    for k in range(4):
        lab[..., k] = (packed >> (2 * k)) & 3
    np.testing.assert_array_equal(lab.reshape(8, 6, 12), seg)
