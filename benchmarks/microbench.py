"""Microbenchmarks: per-block device time for the flagship model.

Methodology for the remote-attached TPU: N iterations are chained inside
ONE jitted scan (inputs perturbed per-step to defeat CSE), a single scalar
is read back, and tunnel RTT (measured with a trivial kernel) is
subtracted. This isolates pure device time from attach latency.
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed(fn, *args, iters=10, label=""):
    """Compile fn, then time `iters` chained applications in one jit."""

    def chained(args):
        def body(c, _):
            # carry-dependent, dtype-preserving perturbation: defeats
            # loop-invariant hoisting without promoting bf16 inputs
            eps = c * 1e-30
            out = fn(*jax.tree_util.tree_map(
                lambda a: a if a.dtype not in (jnp.float32, jnp.bfloat16)
                else a + eps.astype(a.dtype), args))
            s = sum(jnp.sum(o.astype(jnp.float32))
                    for o in jax.tree_util.tree_leaves(out))
            return c + s, None
        tot, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return tot

    jfn = jax.jit(chained)
    t0 = time.time()
    float(jfn(args))
    compile_s = time.time() - t0
    reps = []
    for _ in range(3):
        t0 = time.time()
        float(jfn(args))
        reps.append(time.time() - t0)
    per_iter = min(reps) / iters
    print(f"{label:48s} {per_iter*1e3:9.3f} ms/iter  "
          f"(compile {compile_s:.1f}s)")
    return per_iter


def rtt():
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0)
    float(f(x))
    ts = []
    for _ in range(10):
        t0 = time.time()
        float(f(x))
        ts.append(time.time() - t0)
    print(f"tunnel RTT ~ {min(ts)*1e3:.2f} ms")
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    import sys
    sys.path.insert(0, "/root/repo")
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.models import (
        UNet3D, DoubleConv3D, AttentionGate3D)

    rtt()
    S, B = args.size, args.batch
    key = jax.random.PRNGKey(0)

    # single conv levels
    import flax.linen as nn
    for (cin, cout, res) in [(4, 32, S), (32, 32, S), (32, 64, S // 2),
                             (64, 64, S // 2), (128, 128, S // 4),
                             (256, 256, S // 8), (512, 512, S // 16)]:
        m = nn.Conv(cout, (3, 3, 3), padding="SAME", use_bias=False,
                    dtype=jnp.bfloat16)
        x = jnp.zeros((B, res, res, res, cin), jnp.bfloat16)
        v = jax.jit(m.init)(key, x)
        flops = 2 * 27 * cin * cout * B * res**3
        t = timed(lambda v, x: m.apply(v, x), v, x,
                  label=f"conv3 {cin:4d}->{cout:4d} @{res}^3 b{B}")
        print(f"    -> {flops/t/1e12:7.1f} TFLOP/s")

    # DoubleConv blocks
    for (cin, cout, res) in [(4, 32, S), (64, 32, S), (32, 64, S // 2)]:
        m = DoubleConv3D(cout, dtype=jnp.bfloat16)
        x = jnp.zeros((B, res, res, res, cin), jnp.bfloat16)
        v = jax.jit(m.init)(key, x)
        flops = 2 * 27 * (cin * cout + cout * cout) * B * res**3
        t = timed(lambda v, x: m.apply(v, x), v, x,
                  label=f"DoubleConv {cin}->{cout} @{res}^3 b{B}")
        print(f"    -> {flops/t/1e12:7.1f} TFLOP/s (conv flops only)")

    if args.full:
        m = UNet3D(out_channels=4, dtype=jnp.bfloat16, remat=False)
        x = jnp.zeros((B, S, S, S, 4), jnp.float32)
        v = jax.jit(m.init, static_argnames=("train",))(
            key, x, train=False)
        t = timed(lambda v, x: m.apply(v, x, train=False)["logits"],
                  v, x, iters=5, label=f"UNet3D fwd @{S}^3 b{B}")


if __name__ == "__main__":
    main()
