"""Spatial-geometry dependence of the zcat conv2d rate.

probe_dcbarrier.py found conv 64->32 runs at 23 TF/s at the crop
bucket (160x192x144) vs 45.5 TF/s at 240x240x160 (round-2 shootout) —
same op, ~half the voxels, almost the same wall time. The conv engine's
efficiency evidently depends on the 2D (H, W) tile geometry, which
means the crop-bucket ladder may be paying ~2x on every extremity conv
and padding UP to a friendlier geometry could win outright.

Sweeps conv3d_zcat 64->32 at fixed D=160 over (H, W) candidates and
reports TF/s + ms per Mvoxel (the decision metric for bucket design).

Usage: python benchmarks/probe_geom.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops.conv import (  # noqa: E402
    conv3d_zcat)

RTT = [0.0]


def _t(fn):
    t0 = time.time(); fn(); return time.time() - t0


def measure_rtt():
    f = jax.jit(lambda x: x + 1.0)
    float(f(jnp.float32(0)))
    RTT[0] = min(_t(lambda: float(f(jnp.float32(0)))) for _ in range(8))
    print(f"RTT ~ {RTT[0]*1e3:.1f} ms")


def timed(fn, args, iters):
    def chained(a):
        def body(c, _):
            out = fn(*jax.tree_util.tree_map(
                lambda v: v + (c * 1e-30).astype(v.dtype)
                if hasattr(v, "dtype") else v, a))
            return c + jnp.sum(out[..., :1, :1].astype(jnp.float32)), None
        tot, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return tot
    f = jax.jit(chained)
    float(f(args))
    reps = [_t(lambda: float(f(args))) for _ in range(3)]
    return (min(reps) - RTT[0]) / iters


def main():
    measure_rtt()
    rng = np.random.default_rng(0)
    ci, co = (64, 32) if len(sys.argv) < 3 else (int(sys.argv[1]),
                                                 int(sys.argv[2]))
    D = 160
    w = jnp.asarray((rng.normal(size=(3, 3, 3, ci, co)) * 0.05)
                    .astype(np.float32), jnp.bfloat16)
    cases = [
        (192, 144),   # current bucket
        (144, 192),   # transposed
        (192, 160), (192, 176), (192, 192),
        (240, 160),   # round-2 shootout geometry (fast)
        (160, 240),
        (192, 128), (192, 208), (192, 240),
        (240, 144), (144, 240),
        (128, 128), (256, 256), (240, 240),
    ]
    print(f"conv3d_zcat {ci}->{co}, D={D} (B*D={D} rows of HxW)")
    print(f"{'HxW':>10s} {'ms':>8s} {'TF/s':>7s} {'ms/Mvox':>8s}")
    for (H, W) in cases:
        x = jnp.asarray((rng.normal(size=(1, D, H, W, ci)) * 0.05)
                        .astype(np.float32), jnp.bfloat16)
        dt = timed(lambda a: conv3d_zcat(a, w), (x,), 5)
        mvox = D * H * W / 1e6
        fl = 2 * 27 * ci * co * D * H * W
        print(f"{H:4d}x{W:<4d} {dt*1e3:8.2f} {fl/dt/1e12:7.1f} "
              f"{dt*1e3/mvox:8.3f}")


if __name__ == "__main__":
    main()
