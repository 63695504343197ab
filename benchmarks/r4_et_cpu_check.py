"""CPU fallback evidence for the learnable-ET fix (VERDICT r3 item 3).

The r3 quality run's ET dice was floored by fixture geometry (27-81
ET voxels/case); the r4 cohort default ``size_range=(14, 22)`` lifts
ET to ~310-1200 voxels at the 96^3 generation grid. The full 96^3
flagship rerun needs the TPU attach; THIS script is the
attach-independent check: the r3-PASSING quick-convergence config
(16 samples, 64^3 train grid, features 16/32/64/128 — the only delta
is the new size_range, so the result isolates the cohort change) must
clear the script's best-val-dice > 0.3 assert, with ET dice reported.
Run niced in the background on the 1-CPU host.

Attempt 1 (journal): a much weaker config (features 8/16/32, 64x64x48
generation grid) stalled at val dice 0.068 — and, by using the default
experiment name, OVERWROTE results/models/best_convergence_check, the
r3 long run's resume checkpoint (epoch 89, mean val dice 0.556). That
checkpoint is unrecoverable (results/ is untracked); the on-chip
quality rerun starts from scratch on the r4 cohort. Both mistakes are
fixed here: r3-validated config + --experiment_name isolation.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")   # axon attach may be down
sys.path.insert(0, "/root/repo")

# cohort at the standard 96^3 generation grid with the r4 size_range;
# the 64^3 training resize keeps ET at ~92-355 voxels (3-12x the r3
# floor). Generated here so the script reuses it on restarts.
import os  # noqa: E402

data_dir = "/root/repo/.et_check_r4b_data"


def _case_count(d):
    # count CASES below the split dirs — counting the split dirs
    # themselves (the r4 bug, VERDICT r4 weak #6) would silently reuse
    # a partially-generated cohort
    n = 0
    for split in ("train", "val"):
        sd = os.path.join(d, split)
        if os.path.isdir(sd):
            n += sum(1 for e in os.scandir(sd) if e.is_dir())
    return n


if _case_count(data_dir) < 16:
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.data import (  # noqa: E402,E501
        create_enhanced_synthetic_data)
    create_enhanced_synthetic_data(16, data_dir, shape=(96, 96, 64),
                                   seed=7, size_range=(14, 22))

sys.argv = [
    "convergence_check",
    "--samples", "16",
    "--epochs", "120",
    "--size", "64", "64", "64",
    "--features", "16", "32", "64", "128",
    "--size_range", "14", "22",
    "--val_interval", "2",
    "--hausdorff_every", "10000",
    "--experiment_name", "et_check_r4",
    "--data_dir", data_dir,
]

import importlib.util  # noqa: E402

spec = importlib.util.spec_from_file_location(
    "convergence_check", "/root/repo/benchmarks/convergence_check.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)
mod.main()
