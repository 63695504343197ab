"""Spatial partitioning of volumes across the ``space`` mesh axis.

The reference has no distribution at all and handles big volumes by
destructive downsampling to 128^3 (``training.py:117-146``). Here volumes
larger than one chip's HBM are split along D across the ``space`` axis
(SURVEY.md section 2.9 — the volumetric analog of sequence/context
parallelism).

Two mechanisms:
  * GSPMD (default): annotate batches with ``P('data', 'space')`` and let
    XLA partition every conv and insert the halo exchanges over ICI
    automatically — this is what ``parallel.mesh.batch_sharding`` +
    ``with_sharding_constraint`` produce and what the multi-chip dryrun
    executes.
  * Explicit shard_map (this module): a hand-written halo exchange using
    ``lax.ppermute`` around per-shard convolution — the building block
    for Pallas-level overlap of halo DMA with compute, and a readable
    spec of what GSPMD does implicitly.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def constrain_spatial(x: jax.Array, mesh: Mesh,
                      axis: str = "space") -> jax.Array:
    """Pin an NDHWC activation's D dim to the space axis (keeps GSPMD
    from re-gathering activations between layers)."""
    if mesh.shape.get(axis, 1) == 1:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P("data", axis)))


def halo_exchange_d(x_shard: jax.Array, halo: int,
                    axis_name: str = "space",
                    boundary: str = "edge") -> jax.Array:
    """Inside shard_map: pad a (B, D_shard, H, W, C) shard with ``halo``
    slices from its D-neighbours. ``boundary`` fills the global volume
    ends: "edge" clamps with the shard's own edge slice; "zero" matches
    the zero-pad SAME convs this repo uses (``ops/conv.py``).

    Uses two ``ppermute`` rings (up and down) over ICI.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    lo = x_shard[:, :halo]          # my first slices -> right neighbour
    hi = x_shard[:, -halo:]         # my last slices  -> left neighbour

    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    from_left = jax.lax.ppermute(hi, axis_name, fwd)    # left nbr's tail
    from_right = jax.lax.ppermute(lo, axis_name, bwd)   # right nbr's head

    if boundary == "zero":
        edge_lo = edge_hi = jnp.zeros_like(lo)
    else:
        edge_lo = x_shard[:, :1].repeat(halo, 1)
        edge_hi = x_shard[:, -1:].repeat(halo, 1)
    left_pad = jnp.where(idx == 0, edge_lo, from_left)
    right_pad = jnp.where(idx == n - 1, edge_hi, from_right)
    return jnp.concatenate([left_pad, x_shard, right_pad], axis=1)


def sharded_conv3d(mesh: Mesh, conv_fn: Callable,
                   axis: str = "space") -> Callable:
    """Wrap a SAME 3x3x3 conv ``conv_fn(x) -> y`` into a D-sharded
    version with explicit halo exchange, exactly reproducing the
    global conv: global boundaries are ZERO-filled to match the
    zero-pad SAME convs this repo uses (``ops/conv.py``) — the trimmed
    first/last output rows then see [0, x0, x1] exactly as the
    unsharded conv does.

    ``conv_fn`` must be shape-preserving in D (SAME padding). The wrapper
    runs it per-shard over the halo-extended shard and trims the halo
    rows from the output.
    """

    def shard_body(x_shard):
        xh = halo_exchange_d(x_shard, halo=1, axis_name=axis,
                             boundary="zero")
        y = conv_fn(xh)
        return y[:, 1:-1]     # drop halo rows from the SAME-conv output

    spec = P("data", axis, None, None, None)
    return shard_map(shard_body, mesh=mesh, in_specs=(spec,),
                     out_specs=spec)


def zero_boundary_halo_conv(mesh: Mesh, conv_valid_fn: Callable,
                            axis: str = "space") -> Callable:
    """Variant for zero-padded (torch-style SAME) convs: boundary shards
    pad with zeros instead of edge replication."""

    def shard_body(x_shard):
        n = jax.lax.axis_size(axis)
        idx = jax.lax.axis_index(axis)
        halo = 1
        lo = x_shard[:, :halo]
        hi = x_shard[:, -halo:]
        fwd = [(i, (i + 1) % n) for i in range(n)]
        bwd = [(i, (i - 1) % n) for i in range(n)]
        from_left = jax.lax.ppermute(hi, axis, fwd)
        from_right = jax.lax.ppermute(lo, axis, bwd)
        zeros = jnp.zeros_like(lo)
        left_pad = jnp.where(idx == 0, zeros, from_left)
        right_pad = jnp.where(idx == n - 1, zeros, from_right)
        xh = jnp.concatenate([left_pad, x_shard, right_pad], axis=1)
        return conv_valid_fn(xh)

    spec = P("data", axis, None, None, None)
    return shard_map(shard_body, mesh=mesh, in_specs=(spec,),
                     out_specs=spec)
