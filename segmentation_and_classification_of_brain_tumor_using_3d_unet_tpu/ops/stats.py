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
    raise NotImplementedError("axis-wise percentile not needed yet")


def percentile_clip(x: jax.Array, lo_q: float = 1.0, hi_q: float = 99.0
                    ) -> jax.Array:
    """Clip intensities to [P_lo, P_hi] (reference ``training.py:121-123``)."""
    lo = percentile(x, lo_q)
    hi = percentile(x, hi_q)
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
