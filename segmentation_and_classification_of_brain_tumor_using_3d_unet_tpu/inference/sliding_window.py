"""Gaussian-blended sliding-window inference over full-resolution volumes.

The reference has NO sliding window — it destructively zooms every volume
to 128^3 and forwards once (``main.py:382-398``); this module is the
north-star capability addition (BASELINE.json config 3): full
240x240x155 volumes are covered by a static grid of ROI patches, each
forwarded through the network in bf16, blended with a Gaussian importance
map, and normalized.

TPU design:
  * the patch grid is computed at trace time (static shapes; no dynamic
    shapes inside jit) and patches are gathered with
    ``lax.dynamic_slice`` under ``vmap``;
  * patches run in groups of ``sw_batch_size`` via ``lax.scan`` so the
    MXU sees large batched conv work, while the scan keeps HBM usage
    at one accumulator + one patch group;
  * accumulation is a scatter-add (``dynamic_update_slice`` of the read-
    modified window) in fp32.
"""

from __future__ import annotations

import functools
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def compute_patch_starts(dim: int, roi: int, overlap: float) -> List[int]:
    """Start offsets covering [0, dim) with ``roi``-sized windows and at
    least ``overlap`` fractional overlap; final window is clamped flush
    with the volume edge."""
    if dim <= roi:
        return [0]
    step = max(int(roi * (1.0 - overlap)), 1)
    starts = list(range(0, dim - roi + 1, step))
    if starts[-1] != dim - roi:
        starts.append(dim - roi)
    return starts


def gaussian_importance_map(roi_size: Sequence[int],
                            sigma_scale: float = 0.125,
                            dtype=jnp.float32) -> Array:
    """Separable Gaussian window, peak-normalized to 1 (nnU-Net style)."""
    maps = []
    for s in roi_size:
        coords = np.arange(s, dtype=np.float64)
        center = (s - 1) / 2.0
        sigma = max(s * sigma_scale, 1e-3)
        maps.append(np.exp(-0.5 * ((coords - center) / sigma) ** 2))
    g = maps[0][:, None, None] * maps[1][None, :, None] * \
        maps[2][None, None, :]
    g = g / g.max()
    g = np.clip(g, 1e-4, None)      # keep all weights strictly positive
    return jnp.asarray(g, dtype)[..., None]


def _pad_to_roi(vol: Array, roi: Sequence[int]) -> Tuple[Array, List[int]]:
    pads = [max(r - s, 0) for s, r in zip(vol.shape[:3], roi)]
    if any(pads):
        cfg = [(p // 2, p - p // 2) for p in pads] + [(0, 0)]
        vol = jnp.pad(vol, cfg, mode="edge")
    return vol, pads


@functools.partial(
    jax.jit,
    static_argnames=("apply_fn", "roi_size", "overlap", "sw_batch_size",
                     "blend_mode", "sigma_scale", "out_channels"))
def sliding_window_inference(params, volume: Array,
                             apply_fn: Callable,
                             roi_size: Tuple[int, int, int] = (128, 128, 128),
                             overlap: float = 0.5,
                             sw_batch_size: int = 4,
                             blend_mode: str = "gaussian",
                             sigma_scale: float = 0.125,
                             out_channels: int = 4) -> Array:
    """Blend per-patch ``apply_fn(params, patches)`` logits over a volume.

    volume: (D, H, W, C) float; returns (D, H, W, out_channels) fp32
    blended logits. ``apply_fn(params, x)`` must map (B, *roi, C) ->
    (B, *roi, out_channels).
    """
    orig_shape = volume.shape[:3]
    volume, _ = _pad_to_roi(volume, roi_size)
    D, H, W = volume.shape[:3]

    starts = [compute_patch_starts(d, r, overlap)
              for d, r in zip((D, H, W), roi_size)]
    grid = np.stack(np.meshgrid(*[np.asarray(s) for s in starts],
                                indexing="ij"), axis=-1).reshape(-1, 3)
    num_patches = grid.shape[0]

    if num_patches == 1 and tuple(roi_size) == (D, H, W):
        # single window covering the (padded) volume: blending is the
        # identity (acc/wsum == logits), so skip the accumulate pass
        out = apply_fn(params, volume[None]).astype(jnp.float32)[0]
        if (D, H, W) != tuple(orig_shape):
            off = [(p - o) // 2 for p, o in zip((D, H, W), orig_shape)]
            out = jax.lax.dynamic_slice(
                out, (*off, 0), (*orig_shape, out_channels))
        return out

    # pad patch list to a multiple of sw_batch_size (duplicates of patch 0
    # get zero weight)
    pad = (-num_patches) % sw_batch_size
    weights_valid = np.ones(num_patches + pad, np.float32)
    if pad:
        grid = np.concatenate([grid, np.repeat(grid[:1], pad, 0)], axis=0)
        weights_valid[num_patches:] = 0.0
    grid_j = jnp.asarray(grid, jnp.int32).reshape(
        -1, sw_batch_size, 3)
    valid_j = jnp.asarray(weights_valid, jnp.float32).reshape(
        -1, sw_batch_size)

    if blend_mode == "gaussian":
        imp = gaussian_importance_map(roi_size, sigma_scale)
    else:
        imp = jnp.ones((*roi_size, 1), jnp.float32)

    acc = jnp.zeros((D, H, W, out_channels), jnp.float32)
    wsum = jnp.zeros((D, H, W, 1), jnp.float32)

    def gather(start):
        return jax.lax.dynamic_slice(
            volume, (start[0], start[1], start[2], 0),
            (*roi_size, volume.shape[-1]))

    def body(carry, inp):
        acc, wsum = carry
        starts_g, valid_g = inp
        patches = jax.vmap(gather)(starts_g)
        logits = apply_fn(params, patches).astype(jnp.float32)
        weighted = logits * imp[None]

        def scatter_one(i, c):
            a, w = c
            s = starts_g[i]
            idx = (s[0], s[1], s[2], 0)
            v = valid_g[i]
            win = jax.lax.dynamic_slice(
                a, idx, (*roi_size, out_channels))
            a = jax.lax.dynamic_update_slice(
                a, win + weighted[i] * v, idx)
            wwin = jax.lax.dynamic_slice(w, idx, (*roi_size, 1))
            w = jax.lax.dynamic_update_slice(
                w, wwin + imp * v, idx)
            return a, w

        acc, wsum = jax.lax.fori_loop(
            0, sw_batch_size, scatter_one, (acc, wsum))
        return (acc, wsum), None

    (acc, wsum), _ = jax.lax.scan(body, (acc, wsum), (grid_j, valid_j))
    out = acc / jnp.maximum(wsum, 1e-8)

    # crop padding back to the original shape (centered pad)
    if (D, H, W) != tuple(orig_shape):
        off = [(p - o) // 2 for p, o in zip((D, H, W), orig_shape)]
        out = jax.lax.dynamic_slice(
            out, (*off, 0), (*orig_shape, out_channels))
    return out


def make_sw_predictor(model, variables,
                      roi_size: Tuple[int, int, int] = (128, 128, 128),
                      overlap: float = 0.5, sw_batch_size: int = 4,
                      blend_mode: str = "gaussian",
                      sigma_scale: float = 0.125):
    """Bind a flax model into a jitted volume -> logits function.

    Weights live in a mutable slot read per call (``predict
    .set_variables(new_vars)``): ``apply_fn``'s identity is a static
    jit key inside ``sliding_window_inference``, so swapping weights by
    rebuilding the closure would retrace/recompile the sliding-window
    program (30-150 s cold) even though the variables are already a
    runtime argument."""
    state = {"variables": variables}

    def apply_fn(vars_, patches):
        out = model.apply(vars_, patches, train=False)
        return out["logits"] if isinstance(out, dict) else out

    def predict(volume: Array) -> Array:
        return sliding_window_inference(
            state["variables"], volume, apply_fn,
            roi_size=tuple(roi_size),
            overlap=overlap, sw_batch_size=sw_batch_size,
            blend_mode=blend_mode, sigma_scale=sigma_scale,
            out_channels=getattr(model, "out_channels", 4))

    predict.set_variables = lambda v: state.__setitem__("variables", v)
    return predict
