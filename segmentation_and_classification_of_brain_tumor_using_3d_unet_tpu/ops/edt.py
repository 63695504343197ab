"""On-device Euclidean distance transform + Hausdorff distance.

SURVEY.md section 7 lists this as a hard part the reference never solved
(its trainer ships a random Hausdorff stub, ``training.py:366-369``).
The exact squared EDT is separable: for each axis,

    f'(i) = min_j ( f(j) + (i - j)^2 )

a min-plus convolution with a parabola. On TPU this is expressed as a
chunked broadcast-minimum — O(n) passes of vectorized work per axis,
static shapes, no data-dependent control flow — rather than the
classic Felzenszwalb envelope scan (data-dependent, scalar-loop bound).

``hausdorff_distance_device`` computes max/percentile of surface
distances entirely on device; the host path (``metrics.py``) remains
the default for one-off evaluation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array

_BIG = 1e12


def _minplus_axis(f: Array, axis: int, chunk: int = 32) -> Array:
    """Exact 1D squared-EDT step along ``axis`` of an nD field."""
    n = f.shape[axis]
    f = jnp.moveaxis(f, axis, -1)            # (..., n)
    out = jnp.full_like(f, _BIG)
    idx_i = jnp.arange(n, dtype=jnp.float32)

    # min over j of f[..., j] + (i - j)^2, j processed in chunks
    num_chunks = -(-n // chunk)
    for c in range(num_chunks):
        j0 = c * chunk
        j = idx_i[j0:j0 + chunk]                       # (cj,)
        fj = jax.lax.slice_in_dim(f, j0, min(j0 + chunk, n),
                                  axis=-1)             # (..., cj)
        # (..., cj, n): parabola centered at each j
        par = jnp.square(idx_i[None, :] - j[:, None])  # (cj, n)
        cand = fj[..., :, None] + par                  # (..., cj, n)
        out = jnp.minimum(out, jnp.min(cand, axis=-2))
    return jnp.moveaxis(out, -1, axis)


@functools.partial(jax.jit, static_argnames=("chunk",))
def edt_squared(mask: Array, chunk: int = 32) -> Array:
    """Exact squared Euclidean distance to the nearest True voxel.

    mask: (...) bool/num. Voxels inside the mask get 0. Matches
    ``scipy.ndimage.distance_transform_edt(~mask)**2`` (isotropic unit
    spacing).
    """
    f = jnp.where(jnp.asarray(mask, bool), 0.0, _BIG).astype(jnp.float32)
    for ax in range(f.ndim):
        f = _minplus_axis(f, ax, chunk)
    return f


@functools.partial(jax.jit, static_argnames=("percentile", "chunk"))
def hausdorff_distance_device(pred: Array, target: Array,
                              percentile: float = 100.0,
                              chunk: int = 32) -> Array:
    """Symmetric (percentile-)Hausdorff between binary masks, on device.

    Returns +inf when either mask is empty (host-path semantics,
    ``metrics.hausdorff_distance``).
    """
    p = jnp.asarray(pred, bool)
    t = jnp.asarray(target, bool)
    d_to_t = jnp.sqrt(edt_squared(t, chunk))
    d_to_p = jnp.sqrt(edt_squared(p, chunk))

    def directed(dist, src):
        vals = jnp.where(src, dist, -1.0)
        if percentile >= 100.0:
            return jnp.max(vals)
        flat = jnp.sort(vals.reshape(-1))            # -1 pad sorts first
        n_src = jnp.sum(src)
        # linearly interpolated percentile over the n_src valid entries
        # (matches np.percentile's default method)
        pos = ((flat.shape[0] - n_src).astype(jnp.float32)
               + (percentile / 100.0)
               * (n_src - 1).astype(jnp.float32))
        k0 = jnp.floor(pos).astype(jnp.int32)
        frac = pos - k0.astype(jnp.float32)
        v0 = flat[jnp.clip(k0, 0, flat.shape[0] - 1)]
        v1 = flat[jnp.clip(k0 + 1, 0, flat.shape[0] - 1)]
        return v0 * (1.0 - frac) + v1 * frac

    hd = jnp.maximum(directed(d_to_t, p), directed(d_to_p, t))
    empty = (~jnp.any(p)) | (~jnp.any(t))
    return jnp.where(empty, jnp.inf, hd)
