"""Round-2 probe 1: does MANUAL double-buffered DMA break the ~165 GB/s
Pallas streaming cap measured in round 1 (where the automatic BlockSpec
pipeline appeared to serialize input-DMA / compute / output-DMA)?

Kernel: y = 2*x over a large array. Input/output stay in HBM (pl.ANY);
chunks are DMA'd to/from VMEM scratch through 2 slots with explicit
semaphores, overlapping: load[i+1] || compute[i] || store[i-1].

Compare against jax.jit(lambda x: 2*x) (XLA fusion, ~500 GB/s r1).
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def manual_stream(x, chunk_rows):
    rows, cols = x.shape
    n_chunks = rows // chunk_rows
    assert rows % chunk_rows == 0

    def kernel(x_hbm, o_hbm):
        def body(in_scr, out_scr, in_sem, out_sem):
            def load(slot, i):
                return pltpu.make_async_copy(
                    x_hbm.at[pl.ds(i * chunk_rows, chunk_rows), :],
                    in_scr.at[slot], in_sem.at[slot])

            def store(slot, i):
                return pltpu.make_async_copy(
                    out_scr.at[slot],
                    o_hbm.at[pl.ds(i * chunk_rows, chunk_rows), :],
                    out_sem.at[slot])

            load(0, 0).start()

            def loop(i, carry):
                slot = jax.lax.rem(i, 2)
                nslot = jax.lax.rem(i + 1, 2)

                @pl.when(i + 1 < n_chunks)
                def _():
                    load(nslot, i + 1).start()

                load(slot, i).wait()

                @pl.when(i >= 2)
                def _():
                    store(slot, i - 2).wait()

                out_scr[slot] = in_scr[slot] * 2.0
                store(slot, i).start()
                return carry

            jax.lax.fori_loop(0, n_chunks, loop, 0)

            @pl.when(n_chunks >= 2)
            def _():
                store(jax.lax.rem(n_chunks - 2, 2), n_chunks - 2).wait()

            store(jax.lax.rem(n_chunks - 1, 2), n_chunks - 1).wait()

        pl.run_scoped(
            body,
            in_scr=pltpu.VMEM((2, chunk_rows, cols), x.dtype),
            out_scr=pltpu.VMEM((2, chunk_rows, cols), x.dtype),
            in_sem=pltpu.SemaphoreType.DMA((2,)),
            out_sem=pltpu.SemaphoreType.DMA((2,)),
        )

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x)


def auto_stream(x, chunk_rows):
    """Round-1 style: automatic BlockSpec pipelining."""
    rows, cols = x.shape

    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(rows // chunk_rows,),
        in_specs=[pl.BlockSpec((chunk_rows, cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((chunk_rows, cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(x)


def bench(fn, x, iters=20, label=""):
    """Chained-scan methodology (see microbench.py): output feeds the
    next iteration so the compiler cannot elide or overlap dispatches;
    one host readback amortizes the tunnel RTT."""

    def chained(v):
        def body(c, _):
            return fn(c), None
        out, _ = jax.lax.scan(body, v, None, length=iters)
        return jnp.sum(out[:1, :1])

    f = jax.jit(chained)
    float(f(x))  # compile
    reps = []
    for _ in range(3):
        t0 = time.time()
        float(f(x))
        reps.append(time.time() - t0)
    dt = min(reps) / iters
    nbytes = x.size * x.dtype.itemsize * 2  # read + write
    gbps = nbytes / dt / 1e9
    print(f"{label:44s} {dt*1e3:8.3f} ms  {gbps:7.1f} GB/s")
    return gbps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=512)
    args = ap.parse_args()

    cols = 1024
    rows = args.mb * 1024 * 1024 // (4 * cols)
    x = jnp.asarray(np.random.rand(rows, cols).astype(np.float32))
    print(f"array {args.mb} MB f32 ({rows}x{cols})")

    bench(lambda v: v * 2.0, x, label="XLA fusion (reference)")
    for chunk in (256, 512, 1024):
        bench(functools.partial(auto_stream, chunk_rows=chunk), x,
              label=f"pallas auto pipeline chunk={chunk}")
    for chunk in (256, 512, 1024):
        bench(functools.partial(manual_stream, chunk_rows=chunk), x,
              label=f"pallas MANUAL double-buffer chunk={chunk}")

    # correctness
    y = jax.jit(functools.partial(manual_stream, chunk_rows=512))(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) * 2.0)
    print("manual stream exact: OK")


if __name__ == "__main__":
    main()
