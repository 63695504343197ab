"""CPU fallback evidence for the learnable-ET fix (VERDICT r3 item 3).

The r3 quality run's ET dice was floored by fixture geometry (27-81
ET voxels/case); the r4 cohort default ``size_range=(14, 22)`` lifts
ET to ~310-1200 voxels. The full 96^3 flagship rerun needs the TPU
attach; THIS script is the attach-independent sanity check: a small
UNet on a small-grid cohort with the SAME absolute ET radii (size_range
is in voxels, so a smaller grid keeps the ET voxel count) must reach
ET dice well above the old 0.014 floor. Run niced in the background on
the 1-CPU host.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")   # axon attach may be down
sys.path.insert(0, "/root/repo")

# generate the cohort at the NATIVE training grid (convergence_check's
# own generation call is pinned to the 96^3 grid, which --size would
# then downscale, shrinking ET below the intended count); the script
# reuses a populated --data_dir as-is
import os  # noqa: E402

data_dir = "/root/repo/.et_check_data"
if not (os.path.isdir(data_dir)
        and sum(1 for e in os.scandir(data_dir) if e.is_dir())):
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.data import (  # noqa: E402,E501
        create_enhanced_synthetic_data)
    create_enhanced_synthetic_data(16, data_dir, shape=(64, 64, 48),
                                   seed=7, size_range=(14, 22))

sys.argv = [
    "convergence_check",
    "--samples", "16",
    "--epochs", "60",
    "--size", "64", "64", "48",
    "--features", "8", "16", "32",
    "--size_range", "14", "22",
    "--scheduler", "cosine_warm_restarts",
    "--ema", "0.999",
    "--val_interval", "2",
    "--hausdorff_every", "10000",
    "--data_dir", "/root/repo/.et_check_data",
]

import importlib.util  # noqa: E402

spec = importlib.util.spec_from_file_location(
    "convergence_check", "/root/repo/benchmarks/convergence_check.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)
mod.main()
