"""Channel-split formulation for the lane-group-bound extremity convs.

probe_geom.py showed zcat conv rates are geometry-independent and
voxel-proportional: the conv2d engine streams the input once per
(tap x lane-group) pass, so a K=3*Cin > 128 conv (e.g. 64->32: K=192,
2 groups) pays ~2x the HBM traffic of a K<=128 conv. By linearity,
  conv(cat(a, b), w) == conv(a, w[..., :C, :]) + conv(b, w[..., C:, :])
and each half is a single-lane-group conv over HALF the input — the
split should halve traffic AND let the model skip materializing the
concat entirely (dec conv1 consumes cat(x_att, x_up)).

Measures at the crop bucket (160x192x144), bf16:
  a conv 32->32 (single group, the floor unit)
  b conv 64->32 fused (2 groups)              [current dec0 conv1]
  c conv 64->32 = split sum over a cat input
  d conv 64->32 = split sum over TWO separate inputs (no concat)
  e concat materialization alone
  f dec1-scale: conv 128->64 fused vs split at (80,96,72)
  g exactness check of the split identity

Usage: python benchmarks/probe_split.py
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


def timed(fn, args, iters, label, flops=None):
    def chained(a):
        def body(c, _):
            out = fn(*jax.tree_util.tree_map(
                lambda v: v + (c * 1e-30).astype(v.dtype)
                if hasattr(v, "dtype") else v, a))
            return c + jnp.sum(out[..., :1, :1].astype(jnp.float32)), None
        tot, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return tot
    f = jax.jit(chained)
    t0 = time.time(); float(f(args)); comp = time.time() - t0
    reps = [_t(lambda: float(f(args))) for _ in range(3)]
    dt = (min(reps) - RTT[0]) / iters
    tf = f"  {flops/dt/1e12:6.1f} TF/s" if flops else ""
    print(f"{label:46s} {dt*1e3:8.2f} ms{tf}  (compile {comp:.0f}s)")
    return dt


def main():
    measure_rtt()
    rng = np.random.default_rng(0)
    D0, H0, W0 = 160, 192, 144

    def mk(shape, s=0.05):
        return jnp.asarray((rng.normal(size=shape) * s)
                           .astype(np.float32), jnp.bfloat16)

    a = mk((1, D0, H0, W0, 32))
    b = mk((1, D0, H0, W0, 32))
    w = mk((3, 3, 3, 64, 32))
    wa, wb = w[:, :, :, :32], w[:, :, :, 32:]
    w32 = mk((3, 3, 3, 32, 32))
    vox = D0 * H0 * W0

    timed(lambda x: conv3d_zcat(x, w32), (a,), 5,
          "a  conv 32->32 single group",
          2 * 27 * vox * 32 * 32)
    cat = jnp.concatenate([a, b], axis=-1)
    timed(lambda x: conv3d_zcat(x, w), (cat,), 5,
          "b  conv 64->32 fused (2 groups)",
          2 * 27 * vox * 64 * 32)
    timed(lambda x: conv3d_zcat(x[..., :32], wa)
          + conv3d_zcat(x[..., 32:], wb), (cat,), 5,
          "c  conv 64->32 split over cat input",
          2 * 27 * vox * 64 * 32)
    timed(lambda p, q: conv3d_zcat(p, wa) + conv3d_zcat(q, wb),
          (a, b), 5,
          "d  conv 64->32 split, two inputs (no cat)",
          2 * 27 * vox * 64 * 32)
    timed(lambda p, q: jnp.concatenate([p, q], axis=-1), (a, b), 5,
          "e  concat alone")

    # dec1 scale
    d1, h1, w1d = D0 // 2, H0 // 2, W0 // 2
    a1 = mk((1, d1, h1, w1d, 64))
    b1 = mk((1, d1, h1, w1d, 64))
    wf = mk((3, 3, 3, 128, 64))
    cat1 = jnp.concatenate([a1, b1], axis=-1)
    timed(lambda x: conv3d_zcat(x, wf), (cat1,), 10,
          "f1 conv 128->64 fused @dec1",
          2 * 27 * (d1 * h1 * w1d) * 128 * 64)
    timed(lambda p, q: conv3d_zcat(p, wf[:, :, :, :64])
          + conv3d_zcat(q, wf[:, :, :, 64:]), (a1, b1), 10,
          "f2 conv 128->64 split @dec1",
          2 * 27 * (d1 * h1 * w1d) * 128 * 64)

    # exactness
    want = np.asarray(jax.jit(lambda x: conv3d_zcat(x, w))(cat),
                      np.float32)
    got = np.asarray(jax.jit(
        lambda p, q: conv3d_zcat(p, wa) + conv3d_zcat(q, wb))(a, b),
        np.float32)
    err = np.max(np.abs(want - got))
    print(f"g  split exactness: max|diff| = {err:.6f} "
          f"({'OK' if err < 0.02 else 'CHECK'})")


if __name__ == "__main__":
    main()
