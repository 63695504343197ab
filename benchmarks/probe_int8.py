"""Probe: int8 MXU throughput for the conv hot shapes.

v5e's MXU is rated 2x bf16 throughput for int8 x int8 -> int32. If
XLA's conv2d (zcat formulation) hits that path, a quantized inference
mode can nearly halve the N<=64 conv time that dominates the forward.
Measures: int8 matmul vs bf16 matmul, int8 zcat-conv2d vs bf16.
"""

import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

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
    """Integer inputs can't take the +c*1e-30 carry bump (XLA would
    hoist the whole op out of the scan as loop-invariant — observed as
    negative/absurd TF/s). Instead the first arg is extended by one
    leading row and the slice origin alternates with the iteration
    parity, which defeats hoisting for any dtype."""
    first, rest = args[0], args[1:]
    pad = jnp.concatenate([first, first[:1]], axis=0)

    def chained(pad, rest):
        def body(c, i):
            a0 = jax.lax.dynamic_slice_in_dim(
                pad, i % 2, first.shape[0], axis=0)
            out = fn(a0, *rest)
            return c + jnp.sum(out.astype(jnp.float32)), None
        tot, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(iters, dtype=jnp.int32))
        return tot

    f = jax.jit(chained)
    t0 = time.time(); float(f(pad, rest)); comp = time.time() - t0
    reps = []
    for _ in range(3):
        t0 = time.time(); float(f(pad, rest)); reps.append(time.time() - t0)
    dt = (min(reps) - RTT[0]) / iters
    print(f"{label:46s} {dt*1e3:8.2f} ms  {flops/dt/1e12:6.1f} TF/s "
          f"(compile {comp:.0f}s)", flush=True)
    return dt


def mm_bf16(a, b):
    return jax.lax.dot(a, b, preferred_element_type=jnp.float32)


def mm_int8(a, b):
    return jax.lax.dot(a, b, preferred_element_type=jnp.int32)


def conv2d(x, w, ptype):
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=dn,
        preferred_element_type=ptype)


def main():
    measure_rtt()
    print(f"RTT {RTT[0]*1e3:.1f} ms", flush=True)
    rng = np.random.default_rng(0)

    # --- matmul: M = spatial, K = 3*ci*9ish, N = co ---
    for M, K, N in [(4096, 864, 32), (4096, 864, 128),
                    (4096, 1728, 128), (2048, 2048, 512)]:
        a8 = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
        b8 = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)
        ab = a8.astype(jnp.bfloat16)
        bb = b8.astype(jnp.bfloat16)
        fl = 2 * M * K * N
        it = min(200, max(10, int(2e10 / fl)))
        timed(mm_bf16, (ab, bb), it, f"matmul bf16 ({M},{K},{N})", fl)
        timed(mm_int8, (a8, b8), it, f"matmul int8 ({M},{K},{N})", fl)

    # --- zcat conv2d shapes: (B*D, H, W, 3ci) -> co ---
    for D, H, W, ci, co, iters in [
            (160, 192, 144, 32, 32, 10),
            (160, 192, 144, 64, 32, 6),
            (80, 96, 72, 128, 64, 10)]:
        x8 = jnp.asarray(
            rng.integers(-127, 127, (D, H, W, 3 * ci)), jnp.int8)
        w8 = jnp.asarray(
            rng.integers(-127, 127, (3, 3, 3 * ci, co)), jnp.int8)
        xb = x8.astype(jnp.bfloat16)
        wb = w8.astype(jnp.bfloat16)
        fl = 2 * 27 * D * H * W * ci * co
        timed(lambda x, w: conv2d(x, w, jnp.float32), (xb, wb), iters,
              f"zcat-conv2d bf16 {ci}->{co} @({D},{H},{W})", fl)
        try:
            timed(lambda x, w: conv2d(x, w, jnp.int32), (x8, w8), iters,
                  f"zcat-conv2d int8 {ci}->{co} @({D},{H},{W})", fl)
        except Exception as e:
            print(f"int8 conv2d {ci}->{co}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
