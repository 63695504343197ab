"""On-device intensity statistics for preprocessing.

Replaces the reference's NumPy host path: percentile clip to (1, 99) then
z-score with eps=1e-8 (``training.py:117-132``), moved on-device so the
whole preprocess chain jit-compiles and runs in HBM.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def percentile(x: jax.Array, q, axis=None) -> jax.Array:
    """Linear-interpolation percentile (matches ``np.percentile`` default).

    Implemented with a full sort — on TPU this lowers to a fast bitonic
    sort and avoids data-dependent shapes.
    """
    q = jnp.asarray(q, jnp.float32)
    if axis is None:
        flat = x.reshape(-1).astype(jnp.float32)
        s = jnp.sort(flat)
        n = s.shape[0]
        idx = q / 100.0 * (n - 1)
        lo = jnp.clip(jnp.floor(idx).astype(jnp.int32), 0, n - 1)
        hi = jnp.clip(lo + 1, 0, n - 1)
        w = idx - lo.astype(jnp.float32)
        return s[lo] * (1.0 - w) + s[hi] * w
    # axis-wise: sort along the axis, linear-interpolate per slice.
    # Vector q stacks one result per quantile along a leading axis
    # (np.percentile semantics); dynamic_index_in_dim needs a scalar,
    # so the vector case maps the scalar path over q.
    if q.ndim > 0:
        return jnp.stack([percentile(x, qi, axis=axis) for qi in q])
    s = jnp.sort(x.astype(jnp.float32), axis=axis)
    n = s.shape[axis]
    idx = q / 100.0 * (n - 1)
    lo = jnp.clip(jnp.floor(idx).astype(jnp.int32), 0, n - 1)
    hi = jnp.clip(lo + 1, 0, n - 1)
    w = idx - lo.astype(jnp.float32)
    s_lo = jax.lax.dynamic_index_in_dim(s, lo, axis=axis,
                                        keepdims=False)
    s_hi = jax.lax.dynamic_index_in_dim(s, hi, axis=axis,
                                        keepdims=False)
    return s_lo * (1.0 - w) + s_hi * w


def percentile_bisect(x: jax.Array, qs, iters: int = 26) -> jax.Array:
    """Percentile values via vectorized bisection on the value domain.

    Each iteration is one cheap comparison pass (O(n) reads); 26
    iterations pin the threshold to ~range/2^26 — far below clipping
    tolerance — while a full sort of a 14M-voxel volume costs ~100x
    more on TPU. Returns one value per q in ``qs``.
    """
    flat = x.reshape(-1).astype(jnp.float32)
    n = flat.shape[0]
    qs_arr = jnp.asarray(qs, jnp.float32).reshape(-1)
    targets = qs_arr / 100.0 * (n - 1)
    lo = jnp.full_like(qs_arr, jnp.min(flat))
    hi = jnp.full_like(qs_arr, jnp.max(flat))

    def body(_, lh):
        lo, hi = lh
        mid = 0.5 * (lo + hi)
        # counts of x < mid for all qs in one pass
        cnt = jnp.sum(flat[None, :] < mid[:, None], axis=1
                      ).astype(jnp.float32)
        go_right = cnt <= targets
        return (jnp.where(go_right, mid, lo),
                jnp.where(go_right, hi, mid))

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return 0.5 * (lo + hi)


def percentile_clip(x: jax.Array, lo_q: float = 1.0, hi_q: float = 99.0,
                    exact: bool = False) -> jax.Array:
    """Clip intensities to [P_lo, P_hi] (reference ``training.py:121-123``).

    Default uses the bisection percentiles (sort-free, the preprocessing
    hot path); ``exact=True`` uses the sort-based linear-interpolation
    definition (numpy semantics)."""
    if exact:
        lo = percentile(x, lo_q)
        hi = percentile(x, hi_q)
    else:
        lh = percentile_bisect(x, (lo_q, hi_q))
        lo, hi = lh[0], lh[1]
    return jnp.clip(x, lo, hi)


def zscore_normalize(x: jax.Array, eps: float = 1e-8) -> jax.Array:
    """(x - mean) / (std + eps) in fp32 (reference ``training.py:125-126``)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf)
    std = jnp.std(xf)
    return (xf - mean) / (std + eps)


def preprocess_intensity(x: jax.Array,
                         clip: Tuple[float, float] = (1.0, 99.0),
                         eps: float = 1e-8) -> jax.Array:
    """Full intensity chain: percentile clip -> z-score (fp32 out)."""
    return zscore_normalize(percentile_clip(x, *clip), eps)
