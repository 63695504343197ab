"""CPU grade-accuracy record, round 5 (VERDICT r4 item 2).

Runs the FIXED quality_joint harness (stratified 4-band cohort — one
band per grade, deterministic tumor presence — plus the burden-feature
grade head): 40 cases -> 8-case val split with 2 cases per grade,
48^3 training grid, features 16/32/64, 90 epochs (the head's accuracy
is seg-gated and takes off late; 60 was too short at tiny scale).

The full 64^3 flagship config runs on chip (`r5_onchip.sh` phase B);
this is the attach-independent record. ~2.5-3.5 h on the 1-CPU host.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"   # quality_joint re-asserts via config

sys.argv = [
    "quality_joint",
    "--samples", "40",
    "--epochs", "90",
    "--size", "48", "48", "48",
    "--features", "16", "32", "64",
]

import importlib.util  # noqa: E402

spec = importlib.util.spec_from_file_location(
    "quality_joint", "/root/repo/benchmarks/quality_joint.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)
mod.main()
