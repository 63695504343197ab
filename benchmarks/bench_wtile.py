"""wtile_conv3d vs XLA zcat at the flagship model's real shapes."""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys
sys.path.insert(0, "/root/repo")
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops.conv import (
    conv3d_zcat)
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops.pallas.conv3d import (
    make_plan, wtile_conv3d)


def bench(fn, args, iters, flops, label):
    def chained(a):
        def body(c, _):
            out = fn(*jax.tree_util.tree_map(
                lambda v: v + (c * 1e-30).astype(v.dtype)
                if v.dtype in (jnp.bfloat16, jnp.float32) else v, a))
            return c + jnp.sum(out[..., :1, :1, :1].astype(jnp.float32)
                               ), None
        tot, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return tot

    f = jax.jit(chained)
    t0 = time.time(); float(f(args)); comp = time.time() - t0
    reps = []
    for _ in range(3):
        t0 = time.time(); float(f(args)); reps.append(time.time() - t0)
    dt = min(reps) / iters
    print(f"{label:34s} {dt*1e3:8.3f} ms  {flops/dt/1e12:7.2f} TF/s "
          f"(compile {comp:.0f}s)")
    return dt


SHAPES = [
    # (ci, co, D, H, W, iters) — inference full-volume per level
    (32, 32, 240, 240, 160, 10),     # enc0.conv2 / dec0.conv2
    (64, 32, 240, 240, 160, 10),     # dec0.conv1
    (32, 64, 120, 120, 80, 20),      # enc1.conv1
    (64, 64, 120, 120, 80, 20),      # enc1.conv2
    (128, 64, 120, 120, 80, 20),     # dec1.conv1
    (64, 128, 60, 60, 40, 30),       # enc2.conv1
    (128, 128, 60, 60, 40, 30),      # enc2.conv2
    (256, 256, 30, 30, 20, 30),      # enc3.conv2
    (512, 512, 15, 15, 10, 30),      # bottleneck-ish
]


def main():
    rng = np.random.default_rng(0)
    tot_z = tot_w = 0.0
    for ci, co, D, H, W, iters in SHAPES:
        x = jnp.asarray(
            rng.normal(size=(1, D, H, W, ci)).astype(np.float32),
            jnp.bfloat16)
        w = jnp.asarray(
            rng.normal(size=(3, 3, 3, ci, co)).astype(np.float32) * .05,
            jnp.bfloat16)
        plan = make_plan(ci, co, W, H)
        flops = 2 * 27 * D * H * W * ci * co
        tz = bench(lambda v, k: conv3d_zcat(v, k), (x, w), iters, flops,
                   f"zcat  {ci:3d}->{co:3d} @({D},{H},{W})")
        if plan is None:
            print(f"wtile {ci:3d}->{co:3d}: no plan")
            continue
        tw = bench(lambda v, k: wtile_conv3d(v, k, plan), (x, w), iters,
                   flops, f"wtile {ci:3d}->{co:3d} @({D},{H},{W}) "
                   f"Tw{plan.Tw} nb{plan.nb}")
        tot_z += tz
        tot_w += tw
        print(f"   -> speedup {tz/tw:.2f}x")
    print(f"\nTOTAL sampled: zcat {tot_z*1e3:.1f} ms  wtile "
          f"{tot_w*1e3:.1f} ms  ({tot_z/max(tot_w,1e-9):.2f}x)")


if __name__ == "__main__":
    main()
