"""Round-2 probe 2: width-tiled block-Toeplitz conv kernel viability.

The hot full-res blocks have Cout=32 -> XLA's zcat conv2d runs at
~24 TF/s (N=32 MXU lane cap). Packing T=4 adjacent width outputs into
the matmul N dim gives N = T*co = 128 full lanes at 2x padded FLOPs
(K per (dz,dy) tap-pair = (T+2)*ci instead of 3*ci), for a projected
139/2 ~ 70 TF/s effective — IF the im2col build is cheap.

Layout trick that makes every im2col piece a CONTIGUOUS VMEM copy:
  * activations stored flat as (rows = h * n_wtiles_padded, 128 lanes)
    with lanes = (w in tile, c), c minor, W padded by one 128-lane tile
    on each side;
  * im2col row m' = h * n_wtiles_padded + t  (halo tiles kept in M and
    discarded on output write) makes source strides match destination
    strides, so each (dz, dy, piece) is ONE block copy at a row offset:
      B piece (j=1..4): (M,128) copy at row offset dy*nt + dz-slice
      A piece (j=0):    (M, 32) copy, cols 96:128, row offset -1
      C piece (j=5):    (M, 32) copy, cols 0:32,  row offset +1
  * output (M,128) = (jo,co) lanes maps 1:1 onto the flat (w,c) layout:
    no output relayout.

This probe measures, on a sub-volume:
  1. XLA zcat conv (current production path)
  2. pallas width-tiled kernel (auto-pipelined overlapping-tile input,
     traffic-inflated 3.4x — compute-rate probe)
  3. the matmul alone at the kernel's shape (ceiling)
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

import sys
sys.path.insert(0, "/root/repo")
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.ops.conv import (
    conv3d_zcat)

T = 4  # width positions per matmul N-block


def build_wbig(w: np.ndarray) -> np.ndarray:
    """(3,3,3,ci,co) -> (K, T*co) block-Toeplitz, K ordered
    [9 x B(j=1..4, ci)] ++ [9 x A(j=0, ci)] ++ [9 x C(j=5, ci)]."""
    kd, kh, kw, ci, co = w.shape
    K = 9 * 6 * ci
    out = np.zeros((K, T * co), w.dtype)

    def fill(col_block, j):
        # returns rows for the (dz, dy, j) group: shape (ci, T*co)
        for jo in range(T):
            kwi = j - jo
            if 0 <= kwi < 3:
                col_block[:, jo * co:(jo + 1) * co] = w[dz, dy, kwi]

    idx = 0
    for dz in range(3):          # B pieces: j = 1..4
        for dy in range(3):
            for j in range(1, 5):
                blk = np.zeros((ci, T * co), w.dtype)
                fill(blk, j)
                out[idx:idx + ci] = blk
                idx += ci
    for dz in range(3):          # A pieces: j = 0
        for dy in range(3):
            blk = np.zeros((ci, T * co), w.dtype)
            fill(blk, 0)
            out[idx:idx + ci] = blk
            idx += ci
    for dz in range(3):          # C pieces: j = 5
        for dy in range(3):
            blk = np.zeros((ci, T * co), w.dtype)
            fill(blk, 5)
            out[idx:idx + ci] = blk
            idx += ci
    assert idx == K
    return out


def wtile_conv(x, wbig, h_t=16, mode="full"):
    """x: (D, H, W, C) bf16 with W*C % 128 == 0. Returns (D,H,W,co*T/T)."""
    D, H, W, C = x.shape
    ci = C
    nt = W * C // 128            # real w-tiles
    ntp = nt + 2                 # + halo tile each side
    K = wbig.shape[0]
    co_t = wbig.shape[1]         # T*co = 128
    co = co_t // T
    assert H % h_t == 0
    M = h_t * ntp

    # pad: one zero d-slice each side, one zero h-row each side,
    # one zero w-tile each side -> flatten (w,c)
    xp = jnp.pad(x, ((1, 1), (1, 1), (T, T), (0, 0)))
    xp = xp.reshape(D + 2, H + 2, ntp * 128)

    # overlapping tiles gathered OUTSIDE the kernel (probe only):
    # tile (d, hb) needs xp[d:d+3, hb*h_t : hb*h_t+h_t+2, :]
    d_idx = jnp.arange(D)[:, None] + jnp.arange(3)[None, :]
    tiles = xp[d_idx]                          # (D, 3, H+2, ntp*128)
    hb = H // h_t
    h_idx = (jnp.arange(hb)[:, None] * h_t
             + jnp.arange(h_t + 2)[None, :])   # (hb, h_t+2)
    tiles = tiles[:, :, h_idx]                 # (D, 3, hb, h_t+2, ntp*128)
    tiles = tiles.transpose(0, 2, 1, 3, 4)     # (D, hb, 3, h_t+2, lanes)
    tiles = tiles.reshape(D * hb, 3, h_t + 2, ntp * 128)

    rows = (h_t + 2) * ntp

    def kernel(x_ref, w_ref, o_ref, col_ref, xs_ref):
        # xs: x tile flattened to ((h_t+2)*ntp, 128) rows, with one zero
        # guard row before and after so the A (-1) / C (+1) row-offset
        # copies stay in bounds (the values they'd read there belong to
        # discarded halo output tiles anyway).
        xf = x_ref[:].reshape(3, rows, 128)
        if mode != "nobuild":
            xs_ref[:, 0] = jnp.zeros((3, 128), xf.dtype)
            xs_ref[:, rows + 1] = jnp.zeros((3, 128), xf.dtype)
            xs_ref[:, 1:rows + 1] = xf
            col = 0
            for dz in range(3):   # B pieces (j = 1..4): full 128 lanes
                for dy in range(3):
                    col_ref[:, col:col + 128] = \
                        xs_ref[dz, dy * ntp + 1: dy * ntp + 1 + M]
                    col += 128
            if mode != "bonly":
                for dz in range(3):   # A pieces (j=0): row -1, lanes 96:
                    for dy in range(3):
                        col_ref[:, col:col + 32] = \
                            xs_ref[dz, dy * ntp: dy * ntp + M, 96:128]
                        col += 32
                for dz in range(3):   # C pieces (j=5): row +1, lanes :32
                    for dy in range(3):
                        col_ref[:, col:col + 32] = \
                            xs_ref[dz, dy * ntp + 2: dy * ntp + 2 + M,
                                   0:32]
                        col += 32
        if mode == "buildonly":
            o_ref[0] = col_ref[:, :co_t] + xf[0, :M]
        else:
            y = jnp.dot(col_ref[:], w_ref[:],
                        preferred_element_type=jnp.float32)
            o_ref[0] = y.astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((D * hb, M, co_t), jnp.bfloat16),
        grid=(D * hb,),
        in_specs=[
            pl.BlockSpec((1, 3, h_t + 2, ntp * 128),
                         lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, co_t), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, M, co_t), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((M, K), jnp.bfloat16),
                        pltpu.VMEM((3, rows + 2, 128), jnp.bfloat16)],
    )(tiles, wbig)

    # (D*hb, M=h_t*ntp, 128) -> (D, H, ntp, 128) -> drop halo tiles
    out = out.reshape(D, hb, h_t, ntp, 128).reshape(D, H, ntp, 128)
    out = out[:, :, 1:-1]                       # drop halo tiles
    return out.reshape(D, H, nt * T, co)[:, :, :W]


def bench(fn, args, iters, flops, label):
    def chained(a):
        def body(c, _):
            out = fn(*jax.tree_util.tree_map(
                lambda v: v + (c * 1e-30).astype(v.dtype)
                if v.dtype in (jnp.bfloat16, jnp.float32) else v, a))
            return c + jnp.sum(out[..., :1, :1].astype(jnp.float32)), None
        tot, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return tot

    f = jax.jit(chained)
    t0 = time.time(); float(f(args)); comp = time.time() - t0
    reps = []
    for _ in range(3):
        t0 = time.time(); float(f(args)); reps.append(time.time() - t0)
    dt = min(reps) / iters
    print(f"{label:46s} {dt*1e3:8.3f} ms  {flops/dt/1e12:7.2f} TF/s "
          f"(compile {comp:.0f}s)")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--D", type=int, default=24)
    ap.add_argument("--H", type=int, default=48)
    ap.add_argument("--W", type=int, default=160)
    ap.add_argument("--C", type=int, default=32)
    ap.add_argument("--co", type=int, default=32)
    ap.add_argument("--ht", type=int, default=16)
    args = ap.parse_args()

    D, H, W, C, co = args.D, args.H, args.W, args.C, args.co
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(D, H, W, C)).astype(np.float32),
                    jnp.bfloat16)
    w = rng.normal(size=(3, 3, 3, C, co)).astype(np.float32) * 0.1
    wbig = jnp.asarray(build_wbig(w.astype(np.float32)), jnp.bfloat16)
    wj = jnp.asarray(w, jnp.bfloat16)

    real_flops = D * H * W * co * 27 * C * 2
    pad_flops = real_flops * 2 * (W // T + 2) / (W // T)

    # 1. XLA zcat (production)
    xb = x[None]
    bench(lambda v: conv3d_zcat(v, wj), (xb,), 30, real_flops,
          f"XLA zcat conv {C}->{co}")

    # 2. pallas width-tiled, full + ablations
    for mode in ("full", "bonly", "buildonly", "nobuild"):
        f = functools.partial(wtile_conv, h_t=args.ht, mode=mode)
        bench(lambda v, f=f: f(v, wbig), (x,), 30, real_flops,
              f"pallas wtile {C}->{co} [{mode}]")

    # 3. matmul ceiling at kernel shape: batch all tiles into one dot
    #    chain so the perturbation cost amortizes
    nt = W * C // 128
    M = args.ht * (nt + 2)
    K = 9 * 6 * C
    n_tiles = D * (H // args.ht)
    a = jnp.asarray(rng.normal(size=(n_tiles * M, K)), jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(K, 128)), jnp.bfloat16)
    bench(lambda aa: jnp.dot(aa, b, preferred_element_type=jnp.float32
                             ).astype(jnp.bfloat16),
          (a,), 30, 2 * n_tiles * M * K * 128,
          f"XLA matmul ceiling ({n_tiles*M}x{K}x128)")

    # correctness vs zcat
    y_ref = np.asarray(conv3d_zcat(xb, wj)[0], np.float32)
    y = np.asarray(jax.jit(f)(x, wbig), np.float32)
    err = np.abs(y - y_ref).max() / (np.abs(y_ref).max() + 1e-9)
    print(f"max rel err vs zcat: {err:.2e}")


if __name__ == "__main__":
    main()
