"""Probe: kz-in-lanes conv3d formulation ("ksplit") vs zcat.

Motivation: zcat's conv2d has out-channels = co, so the N=32 convs use
only 32 of the MXU's 128 lanes (measured ceiling ~48 TF/s). ksplit runs
ONE conv2d with 3*co output channels — one co-block per z-tap kz — so
the MXU sees 3x the lanes, then reduces with a 3-slice shifted add:

    y[z', kz] = conv2d(x[z'], w[kz])          (channels = 3*co)
    out[z]    = y[z-1, 0] + y[z, 1] + y[z+1, 2]

FLOPs identical to the true conv; extra cost is materializing y
(3x the output bytes) plus the shifted-add pass. Wins iff the lane
gain beats the extra HBM traffic — measured here at the hot shapes.
"""

import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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
            return c + jnp.sum(out, dtype=jnp.float32), None
        tot, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return tot

    f = jax.jit(chained)
    t0 = time.time(); float(f(args)); comp = time.time() - t0
    reps = []
    for _ in range(3):
        t0 = time.time(); float(f(args)); reps.append(time.time() - t0)
    dt = (min(reps) - RTT[0]) / iters
    print(f"{label:44s} {dt*1e3:8.2f} ms  {flops/dt/1e12:6.1f} TF/s "
          f"(compile {comp:.0f}s)", flush=True)
    return dt


def conv3d_ksplit(x, w):
    """x: (B,D,H,W,ci); w: (3,3,3,ci,co) DHWIO. SAME padding."""
    B, D, H, W, C = x.shape
    co = w.shape[-1]
    # (kh, kw, ci, kz*co): channel block kz holds the kz-tap's 2D conv
    w2 = w.transpose(1, 2, 3, 0, 4).reshape(3, 3, C, 3 * co)
    x2 = x.reshape(B * D, H, W, C)
    dn = jax.lax.conv_dimension_numbers(
        x2.shape, w2.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x2, w2.astype(x.dtype), (1, 1), "SAME", dimension_numbers=dn)
    y = y.reshape(B, D, H, W, 3, co)
    yp = jnp.pad(y, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0), (0, 0)))
    out = (yp[:, 0:D, :, :, 0, :] + yp[:, 1:1 + D, :, :, 1, :]
           + yp[:, 2:2 + D, :, :, 2, :])
    return out


def conv3d_ksplit_chan(x, w):
    """Same but keeping y as a flat channel dim (3*co) and slicing
    channel blocks — avoids the rank-6 reshape."""
    B, D, H, W, C = x.shape
    co = w.shape[-1]
    w2 = w.transpose(1, 2, 3, 0, 4).reshape(3, 3, C, 3 * co)
    x2 = x.reshape(B * D, H, W, C)
    dn = jax.lax.conv_dimension_numbers(
        x2.shape, w2.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x2, w2.astype(x.dtype), (1, 1), "SAME", dimension_numbers=dn)
    y = y.reshape(B, D, H, W, 3 * co)
    yp = jnp.pad(y, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    out = (yp[:, 0:D, ..., 0 * co:1 * co]
           + yp[:, 1:1 + D, ..., 1 * co:2 * co]
           + yp[:, 2:2 + D, ..., 2 * co:3 * co])
    return out


def main():
    measure_rtt()
    print(f"RTT {RTT[0]*1e3:.1f} ms", flush=True)
    rng = np.random.default_rng(0)

    # exactness check at a small shape
    x = jnp.asarray(rng.normal(size=(1, 16, 24, 24, 32)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 32, 32)) * .05, jnp.bfloat16)
    ref = conv3d_zcat(x, w)
    for f in (conv3d_ksplit, conv3d_ksplit_chan):
        got = f(x, w)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        print(f"{f.__name__} max|err| vs zcat = {err:.4f}", flush=True)

    shapes = [
        (32, 32, 160, 192, 144, 20),
        (64, 32, 160, 192, 144, 10),
        (32, 16, 160, 192, 144, 20),   # head conv
        (128, 64, 80, 96, 72, 20),     # dec1 conv1
        (64, 64, 80, 96, 72, 20),
        (32, 32, 240, 240, 160, 10),
        (64, 32, 240, 240, 160, 8),
    ]
    for ci, co, D, H, W, iters in shapes:
        x = jnp.asarray(
            rng.normal(size=(1, D, H, W, ci)).astype(np.float32),
            jnp.bfloat16)
        w = jnp.asarray(
            rng.normal(size=(3, 3, 3, ci, co)).astype(np.float32) * .05,
            jnp.bfloat16)
        fl = 2 * 27 * D * H * W * ci * co
        timed(conv3d_zcat, (x, w), iters,
              f"zcat        {ci:3d}->{co:3d} @({D},{H},{W})", fl)
        timed(conv3d_ksplit_chan, (x, w), iters,
              f"ksplit_chan {ci:3d}->{co:3d} @({D},{H},{W})", fl)
        timed(conv3d_ksplit, (x, w), iters,
              f"ksplit      {ci:3d}->{co:3d} @({D},{H},{W})", fl)


if __name__ == "__main__":
    main()
