"""Probe: full DoubleConv chains at the crop-bucket shape.

probe_int8.py showed zcat's conv2d core at 32->32 @160x192x144 is
5.5 ms — the other ~14 ms of the standalone zcat number is the 3-shift
input concat. In-model that concat may fuse into the GN/ReLU epilogue.
This probe times REAL DoubleConv chains (conv-GN-ReLU-conv-GN-ReLU+res)
under each conv3d formulation, plus a GN+ReLU-only pass, to attribute
the in-model cost directly.

Variants:
  zcat   — concat 3 z-shifts (channels), one conv2d, K=3ci*9, N=co
  ksplit — one conv2d K=ci*9, N=3co, shifted 3-slice add
  zsum   — three conv2d calls on zero-copy z-windows of x (no concat,
           no 3co intermediate), summed: out = sum_dz conv2d(x_z+dz)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops.conv import (
    conv3d_ksplit, conv3d_zcat)
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops.norm import (
    group_norm)

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


def timed(fn, args, iters, label, flops=None):
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
    tf = f"  {flops/dt/1e12:6.1f} TF/s" if flops else ""
    print(f"{label:40s} {dt*1e3:8.2f} ms{tf}  (compile {comp:.0f}s)",
          flush=True)
    return dt


def conv3d_zsum(x, w, bias=None):
    """3 conv2d calls on zero-copy z-windows; accumulate in f32-free
    bf16 adds. SAME padding via an explicitly padded input."""
    B, D, H, W, C = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    out = None
    for dz in range(3):
        xi = jax.lax.slice_in_dim(xp, dz, dz + D, axis=1)
        x2 = xi.reshape(B * D, H, W, C)
        w2 = w[dz]          # (3, 3, ci, co)
        dn = jax.lax.conv_dimension_numbers(
            x2.shape, w2.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x2, w2.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=dn)
        out = y if out is None else out + y
    out = out.reshape(B, D, H, W, co)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.astype(x.dtype)


def make_dc(conv_fn):
    def dc(x, w1, g1, b1, w2, g2, b2):
        h = conv_fn(x, w1)
        h = group_norm(h, g1, b1, 8)
        h = jax.nn.relu(h)
        h = conv_fn(h, w2)
        h = group_norm(h, g2, b2, 8)
        h = jax.nn.relu(h)
        if x.shape[-1] == h.shape[-1]:
            h = h + x
        return h
    return dc


def main():
    measure_rtt()
    print(f"RTT {RTT[0]*1e3:.1f} ms", flush=True)
    rng = np.random.default_rng(0)
    D, H, W = 160, 192, 144

    # sanity: zsum exact vs zcat
    xs = jnp.asarray(rng.normal(size=(1, 8, 16, 16, 8)), jnp.float32)
    ws = jnp.asarray(rng.normal(size=(3, 3, 3, 8, 8)) * .1, jnp.float32)
    err = float(jnp.max(jnp.abs(conv3d_zsum(xs, ws)
                                - conv3d_zcat(xs, ws))))
    print(f"zsum max|err| vs zcat = {err:.2e}", flush=True)

    for ci, co, iters in [(32, 32, 8), (64, 32, 6)]:
        x = jnp.asarray(rng.normal(size=(1, D, H, W, ci)), jnp.bfloat16)
        w1 = jnp.asarray(rng.normal(size=(3, 3, 3, ci, co)) * .05,
                         jnp.bfloat16)
        w2 = jnp.asarray(rng.normal(size=(3, 3, 3, co, co)) * .05,
                         jnp.bfloat16)
        g1 = jnp.ones((co,), jnp.float32)
        b1 = jnp.zeros((co,), jnp.float32)
        fl = 2 * 27 * D * H * W * co * (ci + co)
        args = (x, w1, g1, b1, w2, g1, b1)
        timed(make_dc(conv3d_zcat), args, iters,
              f"DC-zcat   {ci}->{co} @({D},{H},{W})", fl)
        timed(make_dc(conv3d_ksplit), args, iters,
              f"DC-ksplit {ci}->{co} @({D},{H},{W})", fl)
        timed(make_dc(conv3d_zsum), args, iters,
              f"DC-zsum   {ci}->{co} @({D},{H},{W})", fl)

    # GN+ReLU alone at the L0 shape (the non-conv overhead unit)
    x = jnp.asarray(rng.normal(size=(1, D, H, W, 32)), jnp.bfloat16)
    g = jnp.ones((32,), jnp.float32)
    b = jnp.zeros((32,), jnp.float32)
    timed(lambda x, g, b: jax.nn.relu(group_norm(x, g, b, 8)),
          (x, g, b), 20, "GN8+ReLU 32ch @crop")

    # bare conv cores on pre-staged inputs (no concat/epilogue)
    xcat = jnp.asarray(rng.normal(size=(D, H, W, 96)), jnp.bfloat16)
    wcat = jnp.asarray(rng.normal(size=(3, 3, 96, 32)) * .05,
                       jnp.bfloat16)
    dn = jax.lax.conv_dimension_numbers(
        xcat.shape, wcat.shape, ("NHWC", "HWIO", "NHWC"))
    timed(lambda a, w: jax.lax.conv_general_dilated(
        a, w, (1, 1), "SAME", dimension_numbers=dn),
        (xcat, wcat), 10, "bare conv2d (pre-cat) 96->32 @crop",
        2 * 27 * D * H * W * 32 * 32)


if __name__ == "__main__":
    main()
