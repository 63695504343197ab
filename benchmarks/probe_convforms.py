"""Re-test conv formulations at the hot shapes: is round-1's z-cat
conv2d still the best, or has the native XLA conv3d path caught up?"""

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

RTT = [0.0]


def measure_rtt():
    f = jax.jit(lambda x: x + 1.0)
    float(f(jnp.float32(0)))
    ts = []
    for _ in range(8):
        t0 = time.time()
        float(f(jnp.float32(0)))
        ts.append(time.time() - t0)
    RTT[0] = min(ts)


def timed(fn, args, iters, label, flops):
    def chained(a):
        def body(c, _):
            out = fn(*jax.tree_util.tree_map(
                lambda v: v + (c * 1e-30).astype(v.dtype)
                if v.dtype in (jnp.bfloat16, jnp.float32) else v, a))
            # consume the FULL output: a sliced readback lets XLA
            # narrow lax.conv to one output column (verified: "587
            # TF/s"), faking the result
            return c + jnp.sum(out, dtype=jnp.float32), None
        tot, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return tot

    f = jax.jit(chained)
    t0 = time.time(); float(f(args)); comp = time.time() - t0
    reps = []
    for _ in range(3):
        t0 = time.time(); float(f(args)); reps.append(time.time() - t0)
    dt = (min(reps) - RTT[0]) / iters
    print(f"{label:40s} {dt*1e3:8.2f} ms  {flops/dt/1e12:6.1f} TF/s "
          f"(compile {comp:.0f}s)")
    return dt


def conv3d_native(x, w):
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC"))
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1, 1), "SAME", dimension_numbers=dn)


def conv3d_ycat(x, w):
    """im2col over H instead of D: concat 3 h-shifts, conv2d on (D,W)."""
    B, D, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0), (0, 0)))
    xy = jnp.concatenate([xp[:, :, k:k + H] for k in range(3)], axis=-1)
    x2 = xy.transpose(0, 2, 1, 3, 4).reshape(B * H, D, W, 3 * C)
    w2 = w.transpose(1, 0, 2, 3, 4).reshape(3, 3, 3 * C, w.shape[-1])
    dn = jax.lax.conv_dimension_numbers(
        x2.shape, w2.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x2, w2.astype(x.dtype), (1, 1), "SAME", dimension_numbers=dn)
    y = y.reshape(B, H, D, W, -1).transpose(0, 2, 1, 3, 4)
    return y


def conv3d_zcat2(x, w):
    """zcat but batching (B*D) into H of one conv2d call: identical to
    conv3d_zcat modulo reshape — sanity duplicate."""
    return conv3d_zcat(x, w)


def main():
    measure_rtt()
    print(f"RTT {RTT[0]*1e3:.1f} ms")
    rng = np.random.default_rng(0)
    for ci, co, D, H, W, iters in [
        (32, 32, 240, 240, 160, 20),
        (64, 32, 240, 240, 160, 10),
        (32, 16, 240, 240, 160, 20),    # head conv
        (64, 64, 120, 120, 80, 30),
    ]:
        x = jnp.asarray(
            rng.normal(size=(1, D, H, W, ci)).astype(np.float32),
            jnp.bfloat16)
        w = jnp.asarray(
            rng.normal(size=(3, 3, 3, ci, co)).astype(np.float32) * .05,
            jnp.bfloat16)
        fl = 2 * 27 * D * H * W * ci * co
        timed(conv3d_zcat, (x, w), iters,
              f"zcat   {ci}->{co} @({D},{H},{W})", fl)
        timed(conv3d_native, (x, w), iters,
              f"native {ci}->{co} @({D},{H},{W})", fl)
        timed(conv3d_ycat, (x, w), iters,
              f"ycat   {ci}->{co} @({D},{H},{W})", fl)


if __name__ == "__main__":
    main()
