"""Pure in-VMEM MXU rate at conv-kernel shapes: a fori_loop of
dependency-chained dots inside ONE pallas kernel (no HBM traffic in the
loop). This is the real compute ceiling for any VMEM-resident conv
formulation on this chip.

  y = a @ b   (M,K)@(K,N) -> (M,N)
  a'= y @ c   (M,N)@(N,K) -> (M,K)      keeps the chain shape-stable
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


RTT = [0.0]


def rate(M, K, N, iters=4000, dtype=jnp.bfloat16):
    def kernel(a_ref, b_ref, c_ref, o_ref, a_scr):
        a_scr[:] = a_ref[:]

        def body(i, _):
            y = jnp.dot(a_scr[:], b_ref[:],
                        preferred_element_type=jnp.float32)
            a_scr[:] = jnp.dot(y.astype(dtype), c_ref[:],
                               preferred_element_type=jnp.float32
                               ).astype(dtype) * 1e-3
            return _

        jax.lax.fori_loop(0, iters, body, 0)
        o_ref[:] = a_scr[:, :128]

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(M, K)) * 0.1, dtype)
    b = jnp.asarray(rng.normal(size=(K, N)) * 0.1, dtype)
    c = jnp.asarray(rng.normal(size=(N, K)) * 0.1, dtype)

    f = jax.jit(lambda a, b, c: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, 128), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((M, K), dtype)],
    )(a, b, c))

    g = jax.jit(lambda a, b, c: jnp.sum(f(a, b, c).astype(jnp.float32)))
    float(g(a, b, c))   # compile + warm
    reps = []
    for _ in range(3):
        t0 = time.time()
        float(g(a, b, c))   # host readback forces completion
        reps.append(time.time() - t0)
    dt = max(min(reps) - RTT[0], 1e-9)
    flops = 2 * 2 * M * K * N * iters
    print(f"M={M:6d} K={K:5d} N={N:4d}  {dt/iters*1e6:9.1f} us/pair  "
          f"{flops/dt/1e12:7.1f} TF/s")


def main():
    ap = argparse.ArgumentParser()
    args = ap.parse_args()
    # tunnel RTT via trivial readback
    h = jax.jit(lambda x: x + 1.0)
    float(h(jnp.float32(0)))
    ts = []
    for _ in range(10):
        t0 = time.time()
        float(h(jnp.float32(0)))
        ts.append(time.time() - t0)
    RTT[0] = min(ts)
    print(f"RTT ~ {RTT[0]*1e3:.1f} ms")
    # conv-kernel candidate shapes
    for (M, K, N) in [
        (672, 1728, 128),    # wtile T=4, ci=32, h_t=16
        (2016, 1728, 128),   # h_t=48
        (672, 864, 32),      # plain im2col N=32 (no width tiling)
        (2016, 864, 32),
        (672, 3456, 128),    # wtile ci=64 (dec0 input)
        (512, 1024, 256),    # generic
        (1024, 1024, 1024),  # square reference
    ]:
        rate(M, K, N)


if __name__ == "__main__":
    main()
