"""CPU fallback for the grade-accuracy record (VERDICT r3 item 4).

The full quality_joint run (32 cases, 64^3, features 16/32/64/128)
belongs on the chip (`r4_onchip.sh` phase A runs it when the attach
recovers); THIS is the attach-independent reduced record so round 4
has a grade-accuracy number either way: same band-ladder cohort
machinery, 48^3 training grid, features 16/32/64. Grade ground truth
derives from tumor burden, which the resize preserves, so the task is
the same — the caveat is model scale, journaled with the result.
Run niced on the 1-CPU host (~1.5-2 h).
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo")

sys.argv = [
    "quality_joint",
    "--samples", "32",
    "--epochs", "60",
    "--size", "48", "48", "48",
    "--features", "16", "32", "64",
]

import importlib.util  # noqa: E402

spec = importlib.util.spec_from_file_location(
    "quality_joint", "/root/repo/benchmarks/quality_joint.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)
mod.main()
