"""Why does the DoubleConv BLOCK run at 20.6 TF/s when its convs run
standalone at 45-48 TF/s (probe_dec0.py: dec4 DC 64->32 = 36.5 ms vs a
~17 ms sum of parts)?

Hypothesis: XLA fuses the GroupNorm statistics reductions (+ f32
normalize) into the conv epilogue and that consumer fusion DEOPTIMIZES
the conv kernel itself. Test by inserting jax.lax.optimization_barrier
at block-internal boundaries so each conv compiles exactly like the
fast standalone kernel and GN runs as a separate bandwidth-bound pass.

Variants (DoubleConv 64->32 at the 160x192x144 bucket):
  A baseline                       conv-GN-relu-conv-GN-relu + proj
  B barrier after each conv        conv |b| GN-relu-conv |b| GN-relu...
  C barrier everywhere             all five stages isolated
  D affine-only GN (no stats)      isolates the reduction cost
  E relu-only (no GN at all)       lower bound of the epilogue
  F baseline conv1 alone w/ GN     single conv + fused GN
  G conv1 alone |b| GN             single conv + isolated GN

Usage: python benchmarks/probe_dcbarrier.py [D H W]
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
    conv3d_zcat, conv1x1)
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops.norm import (  # noqa: E402
    group_norm)

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
                if hasattr(v, "dtype") and v.dtype in (jnp.bfloat16,
                                                       jnp.float32)
                else v, a))
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
    if len(sys.argv) == 4:
        D0, H0, W0 = (int(a) for a in sys.argv[1:4])
    else:
        D0, H0, W0 = 160, 192, 144
    measure_rtt()
    rng = np.random.default_rng(0)
    ci, co = 64, 32

    def mk(shape, scale=0.05):
        return jnp.asarray(
            (rng.normal(size=shape) * scale).astype(np.float32),
            jnp.bfloat16)

    x = mk((1, D0, H0, W0, ci))
    w1 = mk((3, 3, 3, ci, co))
    w2 = mk((3, 3, 3, co, co))
    wp = mk((1, 1, 1, ci, co))
    g1 = jnp.ones((co,), jnp.float32); b1 = jnp.zeros((co,), jnp.float32)
    g2 = jnp.ones((co,), jnp.float32); b2 = jnp.zeros((co,), jnp.float32)
    gp = jnp.ones((co,), jnp.float32); bp = jnp.zeros((co,), jnp.float32)
    bar = jax.lax.optimization_barrier

    flops = 2 * 27 * (D0 * H0 * W0) * co * (ci + co)

    def block(x, barrier_conv=False, barrier_all=False, gn="full"):
        def norm(h, g, b):
            if gn == "full":
                return group_norm(h, g, b, 8)
            if gn == "affine":
                return h * g.astype(h.dtype) + b.astype(h.dtype)
            return h                              # gn == "none"

        h = conv3d_zcat(x, w1)
        if barrier_conv or barrier_all:
            h = bar(h)
        h = jax.nn.relu(norm(h, g1, b1))
        if barrier_all:
            h = bar(h)
        h = conv3d_zcat(h, w2)
        if barrier_conv or barrier_all:
            h = bar(h)
        h = jax.nn.relu(norm(h, g2, b2))
        res = conv1x1(x, wp)
        if barrier_all:
            h, res = bar((h, res))
        res = norm(res, gp, bp)
        return h + res

    timed(lambda a: block(a), (x,), 5, "A baseline DC 64->32", flops)
    timed(lambda a: block(a, barrier_conv=True), (x,), 5,
          "B barrier after each conv", flops)
    timed(lambda a: block(a, barrier_all=True), (x,), 5,
          "C barrier everywhere", flops)
    timed(lambda a: block(a, gn="affine"), (x,), 5,
          "D affine-only GN (no stats)", flops)
    timed(lambda a: block(a, gn="none"), (x,), 5,
          "E relu-only (no GN)", flops)

    fl1 = 2 * 27 * (D0 * H0 * W0) * co * ci
    timed(lambda a: jax.nn.relu(group_norm(conv3d_zcat(a, w1), g1, b1,
                                           8)),
          (x,), 5, "F conv1 + fused GN-relu", fl1)
    timed(lambda a: jax.nn.relu(group_norm(bar(conv3d_zcat(a, w1)), g1,
                                           b1, 8)),
          (x,), 5, "G conv1 |barrier| GN-relu", fl1)
    timed(lambda a: conv3d_zcat(a, w1), (x,), 5,
          "H conv1 alone", fl1)


if __name__ == "__main__":
    main()
