"""Pre-generate round-4 fixtures on the 1-CPU host while the TPU
attach is down, so the on-chip session spends zero wall-clock on
untimed data generation:

  * e2e fixture cohorts (bench.py --e2e) in all three on-disk formats,
    at the exact paths run_e2e() probes (/tmp/e2e_fixture_<N>_<fmt>).
  * the round-4 quality cohort for convergence_check --long with the
    learnable-ET size_range (VERDICT r3 item 3) at
    /root/repo/.quality_data_r4 — generated with the IDENTICAL call
    convergence_check.py would make (shape/seed/size_range), so the
    run reuses it byte-for-byte.
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")   # env var alone is not
#                                             enough on this rig
sys.path.insert(0, "/root/repo")

from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.data import (  # noqa: E402
    create_enhanced_synthetic_data)

N_E2E = 16

quality_dir = "/root/repo/.quality_data_r4"
if not (os.path.isdir(quality_dir)
        and sum(1 for e in os.scandir(quality_dir) if e.is_dir())):
    print("generating quality cohort (32 cases, size_range (14,22))",
          flush=True)
    # mirrors convergence_check.py --long (shape/seed/size_range)
    create_enhanced_synthetic_data(32, quality_dir, shape=(96, 96, 64),
                                   seed=7, size_range=(14, 22))
else:
    print("quality cohort already present", flush=True)

for fmt in ("nii.gz", "nii", "npy"):
    tmp = f"/tmp/e2e_fixture_{N_E2E}_{fmt}"
    if os.path.isdir(tmp):
        print(f"{tmp} already present", flush=True)
        continue
    print(f"generating {tmp}", flush=True)
    # mirrors bench.py run_e2e (shape/fmt/seed/tumor_prob/skull_stripped)
    create_enhanced_synthetic_data(N_E2E, tmp, shape=(240, 240, 155),
                                   fmt=fmt, seed=0, tumor_prob=1.0,
                                   skull_stripped=True)
print("pregen done", flush=True)
