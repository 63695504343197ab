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
    spatial = x.shape[1:-1]
    n = x.shape[0]
    xf = x.astype(jnp.float32).reshape(n, -1, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    xn = xn.reshape(n, *spatial, c)
    out = xn * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return out.astype(orig_dtype)


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
