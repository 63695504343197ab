"""Volumetric resize ops (NDHWC).

Parity targets:
  * ``F.interpolate(mode='trilinear', align_corners=False)`` — the in-model
    upsampling of the reference (``main.py:165-170, 190-191, 286-287``).
    ``jax.image.resize(method='trilinear')`` uses half-pixel centers, which
    is exactly the align_corners=False convention.
  * ``scipy.ndimage.zoom(order=0)`` — label resizing
    (``training.py:140-145``): nearest neighbour.
  * ``nn.AdaptiveAvgPool3d`` — classifier head (``main.py:271,315``).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _spatial_shape(x: jax.Array, size: Sequence[int]) -> Tuple[int, ...]:
    if x.ndim != len(size) + 2:
        raise ValueError(
            f"expected N{'x'.join('S' * len(size))}C tensor, got {x.shape}")
    return (x.shape[0], *size, x.shape[-1])


def resize_trilinear(x: jax.Array, size: Sequence[int]) -> jax.Array:
    """Trilinear (half-pixel / align_corners=False) resize of NDHWC."""
    if tuple(x.shape[1:-1]) == tuple(size):
        return x
    orig_dtype = x.dtype
    out = jax.image.resize(x.astype(jnp.float32), _spatial_shape(x, size),
                           method="trilinear")
    return out.astype(orig_dtype)


def resize_nearest(x: jax.Array, size: Sequence[int]) -> jax.Array:
    """Nearest-neighbour resize of NDHWC (labels / masks)."""
    if tuple(x.shape[1:-1]) == tuple(size):
        return x
    return jax.image.resize(x, _spatial_shape(x, size), method="nearest")


def adaptive_avg_pool(x: jax.Array, out_size: Sequence[int]) -> jax.Array:
    """AdaptiveAvgPool over NDHWC to ``out_size`` spatial dims.

    Matches torch semantics when input dims are divisible by output dims
    (the only case exercised by the reference: 128->4 after pooling, and
    global 1x1x1); falls back to torch's bin formula otherwise.
    """
    spatial = x.shape[1:-1]
    if all(s % o == 0 for s, o in zip(spatial, out_size)):
        shape = [x.shape[0]]
        for s, o in zip(spatial, out_size):
            shape += [o, s // o]
        shape.append(x.shape[-1])
        xr = x.reshape(shape)
        axes = tuple(2 + 2 * i for i in range(len(out_size)))
        return jnp.mean(xr, axis=axes)
    # general torch bins: start=floor(i*s/o), end=ceil((i+1)*s/o)
    out = x
    for dim, (s, o) in enumerate(zip(spatial, out_size)):
        axis = dim + 1
        starts = [int(i * s // o) for i in range(o)]
        ends = [int(-(-((i + 1) * s) // o)) for i in range(o)]
        slices = [
            jnp.mean(
                jax.lax.slice_in_dim(out, st, en, axis=axis),
                axis=axis, keepdims=True)
            for st, en in zip(starts, ends)
        ]
        out = jnp.concatenate(slices, axis=axis)
    return out
