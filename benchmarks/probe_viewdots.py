"""Kernel-strategy ablation (VMEM-resident, no HBM DMA): per-depth-slice
cost of
  (a) im2col build (27 copies) + one big (M,K)@(K,N) dot   [current]
  (b) width-expanded buffer + 9 row-shifted view dots + adds
  (c) the big dot alone (ceiling)
at the dec1-conv1-like shape ci=128, co=64 (Tw=2) and the L0 shape
ci=32..64.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def run(ci, co, Tw, Hp, nb, iters=200):
    ws = Tw * ci
    N = Tw * co
    K = 9 * (Tw + 2) * ci
    Kz = 3 * (Tw + 2) * ci       # per-dz K for variant (b)... per (dz,dy)
    Kv = (Tw + 2) * ci           # per-(dz,dy) view K
    nsp = nb + 2
    M = Hp * nsp
    R = (Hp + 2) * nsp + 2
    print(f"ci={ci} co={co} Tw={Tw} ws={ws} N={N} K={K} M={M}")

    rng = np.random.default_rng(0)
    xs_host = jnp.asarray(rng.normal(size=(3, R, ws)) * .1, jnp.bfloat16)
    wb_host = jnp.asarray(rng.normal(size=(K, N)) * .1, jnp.bfloat16)
    wv_host = jnp.asarray(rng.normal(size=(9, Kv, N)) * .1, jnp.bfloat16)

    def kern_a(xs, wbig, o_ref, col, xv):
        xv[:] = xs[:]
        def body(i, _):
            # loop-carried dependency: defeats hoisting of the body
            fb = jnp.sum(o_ref[0:8], axis=1, keepdims=True) * 1e-30
            xv[0, 0:8] = xv[0, 0:8] + fb.astype(xv.dtype)
            c = 0
            for dz in range(3):
                for dy in range(3):
                    col[:, c:c + ws] = xv[dz, 1 + dy * nsp:
                                          1 + dy * nsp + M]
                    c += ws
            for dz in range(3):
                for dy in range(3):
                    col[:, c:c + ci] = xv[dz, dy * nsp: dy * nsp + M,
                                          ws - ci:]
                    c += ci
            for dz in range(3):
                for dy in range(3):
                    col[:, c:c + ci] = xv[dz, 2 + dy * nsp:
                                          2 + dy * nsp + M, :ci]
                    c += ci
            y = jnp.dot(col[:], wbig[:],
                        preferred_element_type=jnp.float32)
            o_ref[:] = y.astype(o_ref.dtype)
            return _
        jax.lax.fori_loop(0, iters, body, 0)

    def kern_b(xs, wv, o_ref, ex, xv):
        # ex: width-expanded ring: rows (Hp+2)*nsp + 2, cols (Tw+2)*ci
        # built ONCE per slice per dz (3 copies: A|B|C)
        rows = R - 2
        xv[:] = xs[:]
        def body(i, _):
            fb = jnp.sum(o_ref[0:8], axis=1, keepdims=True) * 1e-30
            xv[0, 0:8] = xv[0, 0:8] + fb.astype(xv.dtype)
            for dz in range(3):   # per-slice expansion (once per depth)
                ex[dz, 1:1 + rows, ci:ci + ws] = xv[dz, 1:1 + rows]
                ex[dz, 1:1 + rows, :ci] = xv[dz, 0:rows, ws - ci:]
                ex[dz, 1:1 + rows, ci + ws:] = xv[dz, 2:2 + rows, :ci]
            y = None
            for dz in range(3):
                for dy in range(3):
                    d = jnp.dot(ex[dz, 1 + dy * nsp: 1 + dy * nsp + M],
                                wv[3 * dz + dy],
                                preferred_element_type=jnp.float32)
                    y = d if y is None else y + d
            o_ref[:] = y.astype(o_ref.dtype)
            return _
        jax.lax.fori_loop(0, iters, body, 0)

    def kern_c(xs, wbig, o_ref, col, xv):
        def body(i, _):
            fb = jnp.sum(o_ref[0:8], axis=1, keepdims=True) * 1e-30
            col[0:8] = col[0:8] + fb.astype(col.dtype)
            y = jnp.dot(col[:], wbig[:],
                        preferred_element_type=jnp.float32)
            o_ref[:] = y.astype(o_ref.dtype)
            return _
        jax.lax.fori_loop(0, iters, body, 0)

    def call(kern, w, scratch):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=list(scratch),
        )(xs_host, w)

    flops_pad = 2 * M * K * N * iters
    for name, kern, w, scratch in [
        ("a: build col + 1 dot", kern_a,  wb_host,
         [pltpu.VMEM((M, K), jnp.bfloat16),
          pltpu.VMEM((3, R, ws), jnp.bfloat16)]),
        ("b: expand + 9 view dots", kern_b, wv_host,
         [pltpu.VMEM((3, R, (Tw + 2) * ci), jnp.bfloat16),
          pltpu.VMEM((3, R, ws), jnp.bfloat16)]),
        ("c: dot only (ceiling)", kern_c, wb_host,
         [pltpu.VMEM((M, K), jnp.bfloat16),
          pltpu.VMEM((3, R, ws), jnp.bfloat16)]),
    ]:
        f = jax.jit(lambda xs, w, kern=kern, scratch=scratch:
                    jnp.sum(call(kern, w, scratch), dtype=jnp.float32))
        try:
            float(f(xs_host, w))
        except Exception as e:
            print(f"  {name:28s} FAILED: {str(e)[:120]}")
            continue
        reps = []
        for _ in range(3):
            t0 = time.time()
            float(f(xs_host, w))
            reps.append(time.time() - t0)
        dt = (min(reps) - 0.028) / iters
        print(f"  {name:28s} {dt*1e6:8.1f} us/slice  "
              f"{flops_pad/iters/dt/1e12:6.1f} padded TF/s")


if __name__ == "__main__":
    run(128, 64, 2, 120, 2)      # dec1 conv1 shape (Hp=120, nb=2)
    run(32, 32, 4, 240, 4)       # L0 shape
    run(64, 32, 4, 240, 1)       # dec0 conv1
