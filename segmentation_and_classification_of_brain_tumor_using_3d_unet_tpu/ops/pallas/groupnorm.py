"""Fused GroupNorm (+ReLU, +residual) Pallas kernel.

The DoubleConv tail — GroupNorm -> ReLU -> (+residual) (reference
``main.py:215-242``) — is HBM-bandwidth-bound. This kernel does it in
exactly two passes over the activation:

  pass 1 (stats):  one read  -> per-channel partial sums (fp32)
  pass 2 (apply):  one read (+ residual read) -> one write, with the
                   affine/ReLU/add fused

Lane packing: for C < 128 channels, ``p = 128 // C`` consecutive voxels
are viewed as one row of ``p*C`` lanes (a free reshape on channels-last
layout), so the VPU runs with full 128-lane tiles; the per-channel
moments are folded from the packed sums in a tiny XLA epilogue.

Stats are accumulated across sequential grid steps into a revisited
output block (TPU grids run in order), masked for the ragged tail tile.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stats_kernel(x_ref, s1_ref, s2_ref, *, tm: int, m_total: int):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        s1_ref[...] = jnp.zeros_like(s1_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    x = x_ref[0].astype(jnp.float32)            # (TM, PC)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + i * tm
    valid = row < m_total
    x = jnp.where(valid, x, 0.0)
    s1_ref[0, :] += jnp.sum(x, axis=0)
    s2_ref[0, :] += jnp.sum(x * x, axis=0)


def _apply_kernel(x_ref, scale_ref, shift_ref, o_ref, *, relu: bool):
    x = x_ref[0].astype(jnp.float32)
    y = x * scale_ref[0] + shift_ref[0]
    if relu:
        y = jnp.maximum(y, 0.0)
    o_ref[0] = y.astype(o_ref.dtype)


def _apply_res_kernel(x_ref, scale_ref, shift_ref, r_ref, o_ref, *,
                      relu: bool):
    x = x_ref[0].astype(jnp.float32)
    y = x * scale_ref[0] + shift_ref[0]
    if relu:
        y = jnp.maximum(y, 0.0)
    y = y + r_ref[0].astype(jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_groups", "eps", "relu", "tile_m", "interpret"))
def fused_group_norm(x: jax.Array, gamma: jax.Array, beta: jax.Array,
                     num_groups: int, eps: float = 1e-5,
                     residual: Optional[jax.Array] = None,
                     relu: bool = False, tile_m: int = 512,
                     interpret: bool = False) -> jax.Array:
    """GroupNorm over (N, ..., C) + optional fused ReLU and residual add
    (``y = relu(norm(x)) + residual``, the DoubleConv tail order)."""
    orig_shape = x.shape
    n, c = x.shape[0], x.shape[-1]
    if c % num_groups != 0:
        raise ValueError(f"channels {c} % groups {num_groups} != 0")
    m = 1
    for s in x.shape[1:-1]:
        m *= s

    # lane packing: p voxels per row so p*c fills the 128-lane registers
    p = max(1, 128 // c)
    while p > 1 and m % p != 0:
        p //= 2
    pc, mp = p * c, m // p

    x2 = x.reshape(n, mp, pc)
    tm = min(tile_m, max(8, mp))
    grid_m = pl.cdiv(mp, tm)

    s1p, s2p = pl.pallas_call(
        functools.partial(_stats_kernel, tm=tm, m_total=mp),
        grid=(n, grid_m),
        in_specs=[pl.BlockSpec((1, tm, pc), lambda ni, mi: (ni, mi, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((1, pc), lambda ni, mi: (ni, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pc), lambda ni, mi: (ni, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, pc), jnp.float32),
            jax.ShapeDtypeStruct((n, pc), jnp.float32),
        ],
        interpret=interpret,
    )(x2)

    # tiny epilogue: fold packed sums -> per-channel -> group stats
    s1 = jnp.sum(s1p.reshape(n, p, c), axis=1) / m
    s2 = jnp.sum(s2p.reshape(n, p, c), axis=1) / m
    mean_c = jnp.repeat(
        jnp.mean(s1.reshape(n, num_groups, -1), axis=-1),
        c // num_groups, axis=-1)
    ex2_c = jnp.repeat(
        jnp.mean(s2.reshape(n, num_groups, -1), axis=-1),
        c // num_groups, axis=-1)
    var_c = jnp.maximum(ex2_c - mean_c * mean_c, 0.0)
    rstd = jax.lax.rsqrt(var_c + eps)
    scale_c = rstd * gamma.astype(jnp.float32)[None]
    shift_c = beta.astype(jnp.float32)[None] - mean_c * scale_c
    scale = jnp.tile(scale_c, (1, p))           # (N, PC)
    shift = jnp.tile(shift_c, (1, p))

    x_spec = pl.BlockSpec((1, tm, pc), lambda ni, mi: (ni, mi, 0),
                          memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, pc), lambda ni, mi: (ni, 0),
                            memory_space=pltpu.VMEM)
    if residual is None:
        out = pl.pallas_call(
            functools.partial(_apply_kernel, relu=relu),
            grid=(n, grid_m),
            in_specs=[x_spec, vec_spec, vec_spec],
            out_specs=x_spec,
            out_shape=jax.ShapeDtypeStruct((n, mp, pc), x.dtype),
            interpret=interpret,
        )(x2, scale, shift)
    else:
        out = pl.pallas_call(
            functools.partial(_apply_res_kernel, relu=relu),
            grid=(n, grid_m),
            in_specs=[x_spec, vec_spec, vec_spec, x_spec],
            out_specs=x_spec,
            out_shape=jax.ShapeDtypeStruct((n, mp, pc), x.dtype),
            interpret=interpret,
        )(x2, scale, shift, residual.reshape(n, mp, pc))
    return out.reshape(orig_shape)


# Status note (measured on v5e via remote attach, 240x240x160x32 bf16):
# XLA's fused reduce+elementwise pipeline for GN+ReLU+residual already
# runs at ~500 GB/s effective — at the practical HBM roofline — while
# this kernel pays ~17us/grid-step dispatch overhead under the remote
# runtime and lands at ~120 GB/s. It is therefore NOT wired into the
# model by default (models use ops.norm.group_norm); it remains here,
# correctness-tested in interpret mode, as the substrate for a future
# conv+GN epilogue fusion where a single pass genuinely saves traffic.
