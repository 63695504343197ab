"""Normalization ops (NDHWC layout).

Functional core so that the Pallas fused variant
(``ops.pallas.groupnorm``) can be swapped in transparently.

Parity target: ``torch.nn.GroupNorm(groups, C, eps=1e-5)`` as used by the
reference blocks (``main.py:217,230,253,259,265`` — groups of 8 / 4 / 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def group_norm(x: jax.Array, gamma: jax.Array, beta: jax.Array,
               num_groups: int, eps: float = 1e-5) -> jax.Array:
    """GroupNorm over an NDHWC (or N...C) tensor.

    Statistics are computed in fp32 regardless of input dtype (the TPU
    replacement for AMP autocast's fp32 norm islands) and the result is cast
    back to ``x.dtype``.
    """
    orig_dtype = x.dtype
    c = x.shape[-1]
    if c % num_groups != 0:
        raise ValueError(f"channels {c} not divisible by groups {num_groups}")
    # Lane-friendly formulation: never reshape the minor (lane) dim.
    # Per-channel spatial moments first (lane-preserving reductions),
    # then combine channels into group stats on a tiny (N, C) array and
    # broadcast back per channel.
    spatial_axes = tuple(range(1, x.ndim - 1))
    # NOTE(perf, measured): fused-cast f32-accumulating reductions +
    # bf16 apply were A/B'd here (benchmarks/profile_ps2d.py) and LOSE
    # in the flagship forward (+3.5 ms): XLA fuses this shared-f32-copy
    # form into the zcat conv pipeline better than the "optimized"
    # single-consumer-cast form. Keep the materialized xf32.
    xf32 = x.astype(jnp.float32)
    s1 = jnp.mean(xf32, axis=spatial_axes)                  # (N, C)
    s2 = jnp.mean(jnp.square(xf32), axis=spatial_axes)      # (N, C)
    n = x.shape[0]
    g1 = jnp.mean(s1.reshape(n, num_groups, -1), axis=-1)   # (N, G)
    g2 = jnp.mean(s2.reshape(n, num_groups, -1), axis=-1)
    mean_c = jnp.repeat(g1, c // num_groups, axis=-1)       # (N, C)
    # one-pass moments cancel catastrophically for near-constant groups;
    # clamp so rsqrt stays real (torch two-pass would give var ~ 0 here)
    var_c = jnp.maximum(
        jnp.repeat(g2, c // num_groups, axis=-1) - jnp.square(mean_c),
        0.0)
    rstd_c = jax.lax.rsqrt(var_c + eps)
    shape = (n,) + (1,) * (x.ndim - 2) + (c,)
    scale = (rstd_c * gamma.astype(jnp.float32)).reshape(shape)
    shift = (beta.astype(jnp.float32)
             - mean_c * rstd_c * gamma.astype(jnp.float32)).reshape(shape)
    return (xf32 * scale + shift).astype(orig_dtype)


def batch_norm_infer(x: jax.Array, gamma: jax.Array, beta: jax.Array,
                     mean: jax.Array, var: jax.Array,
                     eps: float = 1e-5) -> jax.Array:
    """Inference-mode BatchNorm (running stats), NDHWC.

    Used by the final head (reference ``main.py:131``); training-mode batch
    stats are handled by the model module.
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    scale = gamma.astype(jnp.float32) * jax.lax.rsqrt(
        var.astype(jnp.float32) + eps)
    out = (xf - mean.astype(jnp.float32)) * scale + beta.astype(jnp.float32)
    return out.astype(orig_dtype)
