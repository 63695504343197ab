"""Pooling ops (NDHWC). Parity: ``nn.MaxPool3d(2,2)`` (reference
``main.py:109,309,312``) and ``nn.AdaptiveAvgPool3d(1)`` (``main.py:271``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def max_pool3d(x: jax.Array, window: int = 2, stride: int | None = None
               ) -> jax.Array:
    """Max pool over the three spatial dims of an NDHWC tensor."""
    stride = stride or window
    init = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else (
        jnp.iinfo(x.dtype).min)
    return jax.lax.reduce_window(
        x, init, jax.lax.max,
        window_dimensions=(1, window, window, window, 1),
        window_strides=(1, stride, stride, stride, 1),
        padding="VALID",
    )


def global_avg_pool(x: jax.Array, keepdims: bool = True) -> jax.Array:
    """Mean over spatial dims of NDHWC (AdaptiveAvgPool3d(1)).

    f32 accumulation: a bf16-accumulated mean over millions of voxels
    loses most of its mantissa; the cast fuses into the reduce."""
    return jnp.mean(x, axis=tuple(range(1, x.ndim - 1)),
                    keepdims=keepdims, dtype=jnp.float32).astype(x.dtype)
