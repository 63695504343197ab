"""Data-parallel batch inference over a device mesh.

The reference serves one volume at a time on one device
(``/root/reference/main.py:382-398``); this is the TPU-native scale-out
path: a batch of volumes is sharded over the mesh's ``data`` axis
(params replicated), XLA partitions the whole forward batch-wise, and
each chip segments its shard — aggregate throughput scales ~linearly
with chips since inference needs no cross-volume communication.

Used for bulk/offline segmentation (cohort processing) and by serving
deployments with more than one chip. Exactness vs the single-device
path is tested on the virtual 8-device CPU mesh
(tests/test_parallel.py).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from .mesh import batch_sharding, replicated

__all__ = ["make_dp_segmenter", "segment_cohort",
           "make_dp_whole_predictor", "segment_cohort_whole",
           "sliding_window_inference_mp"]


@functools.lru_cache(maxsize=8)
def _dp_run(model, mesh: Mesh) -> Callable:
    """One jitted program per (model config, mesh) — flax modules are
    frozen dataclasses, so this memoization keeps jax.jit's cache hot
    across repeated ``segment_cohort`` calls (a fresh closure per call
    would retrace every wave; variables stay a runtime argument, so
    weight updates do NOT invalidate it)."""
    bs, rep = batch_sharding(mesh), replicated(mesh)

    @functools.partial(jax.jit, in_shardings=(rep, bs),
                       out_shardings=bs)
    def run(v, vols):
        out = model.apply(v, vols, train=False)
        logits = out["logits"] if isinstance(out, dict) else out
        return jnp.argmax(logits, axis=-1).astype(jnp.int8)

    return run


@functools.lru_cache(maxsize=8)
def _dp_run_shard_map(model, mesh: Mesh) -> Callable:
    """DP segmenter as an explicit per-chip program (shard_map).

    GSPMD cannot partition a ``pallas_call`` — under the jit path a
    ps2d/flat-region model would be gathered and replicated per chip,
    destroying the DP scaling. shard_map runs the WHOLE local forward
    (kernels included) on each chip's batch shard with no partitioner
    in the loop; volumes never need cross-chip communication, so the
    two formulations are exactly equal label-wise."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def local(v, vols):
        out = model.apply(v, vols, train=False)
        logits = out["logits"] if isinstance(out, dict) else out
        return jnp.argmax(logits, axis=-1).astype(jnp.int8)

    # batch over 'data' only — the same contract (and padding rules) as
    # the GSPMD path; on a space>1 mesh each space row redundantly
    # computes its data row's shard (cohort work uses data-only meshes)
    # check_vma off: pallas_call out_shapes carry no varying-mesh-axes
    # annotation, and the body is per-shard local anyway
    smap = shard_map(local, mesh=mesh, in_specs=(P(), P("data")),
                     out_specs=P("data"), check_vma=False)
    return jax.jit(smap)


def make_dp_segmenter(model, variables, mesh: Mesh,
                      via_shard_map: Optional[bool] = None) -> Callable:
    """Bind ``model`` into a jitted mesh-sharded batch segmenter.

    Returns ``segment(vols) -> labels`` mapping (N, D, H, W, C) float
    volumes to (N, D, H, W) int8 label maps, with N sharded over the
    mesh's ``data`` axis. N must be divisible by the data-axis size
    (use ``segment_cohort`` for arbitrary N).

    ``via_shard_map``: run each chip's shard as an explicit local
    program instead of through the GSPMD partitioner. Defaults to
    auto: ON when the model uses the Pallas flat-region path (which
    GSPMD cannot partition), OFF otherwise (both are exact).
    """
    if via_shard_map is None:
        via_shard_map = bool(getattr(model, "ps2d_eval", False))
    run = (_dp_run_shard_map if via_shard_map else _dp_run)(model, mesh)
    return lambda vols: run(variables, vols)


def segment_cohort(model, variables, mesh: Mesh, volumes,
                   batch_per_chip: int = 1) -> np.ndarray:
    """Segment an arbitrary-length cohort of same-shape volumes.

    Pads the cohort to a multiple of ``data_axis * batch_per_chip``,
    runs the sharded segmenter in fixed-size waves (one compiled
    program), and strips the padding. Returns (N, D, H, W) int8.
    """
    vols = np.asarray(volumes)
    n = vols.shape[0]
    data = mesh.shape.get("data", mesh.devices.size)
    wave = data * batch_per_chip
    pad = (-n) % wave
    if pad:
        vols = np.concatenate([vols, np.repeat(vols[:1], pad, 0)], 0)
    seg = make_dp_segmenter(model, variables, mesh)
    outs = []
    for i in range(0, vols.shape[0], wave):
        outs.append(np.asarray(seg(jnp.asarray(vols[i:i + wave]))))
    return np.concatenate(outs, 0)[:n]


def make_dp_whole_predictor(model, variables, mesh: Mesh,
                            model_size) -> Callable:
    """Mesh-sharded whole-volume segmenter at NATIVE resolution.

    ``segment(vols) -> (labels, confidence)`` for (N, D, H, W, C)
    native-res volumes: resize to ``model_size`` -> forward -> resize
    logits back to native -> argmax/max-softmax, all inside one jitted
    program with N sharded over the ``data`` axis (the batched
    counterpart of ``Predictor._whole_volume_logits``,
    reference semantics ``main.py:382-398``).
    """
    run = _dp_whole_run(model, mesh, tuple(model_size))
    return lambda vols: run(variables, vols)


@functools.lru_cache(maxsize=8)
def _dp_whole_run(model, mesh: Mesh, model_size) -> Callable:
    """Memoized like :func:`_dp_run` (same retrace-avoidance)."""
    from ..ops.resize import resize_trilinear

    bs, rep = batch_sharding(mesh), replicated(mesh)

    @functools.partial(jax.jit, in_shardings=(rep, bs),
                       out_shardings=(bs, bs))
    def run(v, vols):
        x = resize_trilinear(vols, tuple(model_size))
        out = model.apply(v, x, train=False)
        logits = out["logits"] if isinstance(out, dict) else out
        logits = resize_trilinear(logits, vols.shape[1:4])
        probs = jax.nn.softmax(logits, axis=-1)
        return (jnp.argmax(probs, axis=-1).astype(jnp.int8),
                jnp.max(probs, axis=-1).astype(jnp.float32))

    return run


def segment_cohort_whole(model, variables, mesh: Mesh, volumes,
                         model_size, batch_per_chip: int = 1):
    """Arbitrary-length same-shape cohort through
    ``make_dp_whole_predictor`` in fixed-size waves (one compiled
    program); strips padding. Returns (labels (N,D,H,W) int8,
    confidence (N,D,H,W) float32)."""
    vols = np.asarray(volumes)
    n = vols.shape[0]
    data = mesh.shape.get("data", mesh.devices.size)
    wave = data * batch_per_chip
    pad = (-n) % wave
    if pad:
        vols = np.concatenate([vols, np.repeat(vols[:1], pad, 0)], 0)
    seg = make_dp_whole_predictor(model, variables, mesh, model_size)
    labels, confs = [], []
    for i in range(0, vols.shape[0], wave):
        lab, conf = seg(jnp.asarray(vols[i:i + wave]))
        labels.append(np.asarray(lab))
        confs.append(np.asarray(conf))
    return (np.concatenate(labels, 0)[:n],
            np.concatenate(confs, 0)[:n])


@functools.lru_cache(maxsize=8)
def _windowpar_jit(apply_fn, mesh: Mesh, axis: str, roi_size,
                   sw_batch_size: int, blend_mode: str,
                   sigma_scale: float, out_channels: int) -> Callable:
    """Memoized jitted per-chip window-accumulate program (one per
    (apply_fn, mesh, geometry) — repeated same-shape volumes reuse the
    compiled program; a fresh jit per call would retrace every
    volume). The importance map and roi are static closures; the
    volume/grid shapes key jit's own cache."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..inference.sliding_window import gaussian_importance_map

    if blend_mode == "gaussian":
        imp = gaussian_importance_map(roi_size, sigma_scale)
    else:
        imp = jnp.ones((*roi_size, 1), jnp.float32)

    def local(p, vol, g, v):
        g, v = g[0], v[0]                      # this chip's groups
        acc = jnp.zeros((*vol.shape[:3], out_channels), jnp.float32)
        wsum = jnp.zeros((*vol.shape[:3], 1), jnp.float32)

        def gather(start):
            return jax.lax.dynamic_slice(
                vol, (start[0], start[1], start[2], 0),
                (*roi_size, vol.shape[-1]))

        def body(carry, inp):
            a, w = carry
            starts_g, valid_g = inp
            patches = jax.vmap(gather)(starts_g)
            logits = apply_fn(p, patches).astype(jnp.float32)
            weighted = logits * imp[None]

            def scatter_one(i, c):
                aa, ww = c
                s = starts_g[i]
                idx = (s[0], s[1], s[2], 0)
                vv = valid_g[i]
                win = jax.lax.dynamic_slice(
                    aa, idx, (*roi_size, out_channels))
                aa = jax.lax.dynamic_update_slice(
                    aa, win + weighted[i] * vv, idx)
                wwin = jax.lax.dynamic_slice(ww, idx, (*roi_size, 1))
                ww = jax.lax.dynamic_update_slice(
                    ww, wwin + imp * vv, idx)
                return aa, ww

            a, w = jax.lax.fori_loop(0, sw_batch_size, scatter_one,
                                     (a, w))
            return (a, w), None

        (acc, wsum), _ = jax.lax.scan(body, (acc, wsum), (g, v))
        acc = jax.lax.psum(acc, axis)
        wsum = jax.lax.psum(wsum, axis)
        return acc, wsum

    smap = shard_map(local, mesh=mesh,
                     in_specs=(P(), P(), P(axis), P(axis)),
                     out_specs=(P(), P()), check_vma=False)
    return jax.jit(smap)


def sliding_window_inference_mp(params, volume, apply_fn, mesh: Mesh,
                                axis: str = "data",
                                roi_size=(128, 128, 128),
                                overlap: float = 0.5,
                                sw_batch_size: int = 1,
                                blend_mode: str = "gaussian",
                                sigma_scale: float = 0.125,
                                out_channels: int = 4):
    """WINDOW-PARALLEL sliding-window inference: single-volume LATENCY
    scaling (the third parallel axis, next to DP-over-volumes for
    throughput and GSPMD-spatial for memory).

    The static window grid is split across the mesh's ``axis``; each
    chip forwards + Gaussian-accumulates its windows into a local
    full-volume fp32 accumulator, and one ``psum`` merges accumulators
    and weight sums (windows are independent until the blend, so this
    is the whole communication). Runs as an explicit per-chip program
    (shard_map), so the ps2d Pallas path works unchanged. Matches the
    single-device engine up to fp32 accumulation order.

    volume: (D, H, W, C); returns (D, H, W, out_channels) fp32 blended
    logits, replicated across the mesh. Pass a STABLE ``apply_fn``
    (same object across calls) so the compiled program is reused.
    """
    from ..inference.sliding_window import (_pad_to_roi,
                                            compute_patch_starts)

    roi_size = tuple(roi_size)
    orig_shape = volume.shape[:3]
    volume, _ = _pad_to_roi(volume, roi_size)
    D, H, W = volume.shape[:3]
    starts = [compute_patch_starts(d, r, overlap)
              for d, r in zip((D, H, W), roi_size)]
    grid = np.stack(np.meshgrid(*[np.asarray(s) for s in starts],
                                indexing="ij"), axis=-1).reshape(-1, 3)
    num = grid.shape[0]
    n_chips = mesh.shape[axis]
    pad = (-num) % (n_chips * sw_batch_size)
    valid = np.ones(num + pad, np.float32)
    if pad:
        grid = np.concatenate([grid, np.repeat(grid[:1], pad, 0)], 0)
        valid[num:] = 0.0
    # chip-major split: chip i takes groups [i*gpc, (i+1)*gpc)
    grid_j = jnp.asarray(grid, jnp.int32).reshape(
        n_chips, -1, sw_batch_size, 3)
    valid_j = jnp.asarray(valid, jnp.float32).reshape(
        n_chips, -1, sw_batch_size)

    run = _windowpar_jit(apply_fn, mesh, axis, roi_size, sw_batch_size,
                         blend_mode, float(sigma_scale),
                         int(out_channels))
    acc, wsum = run(params, volume, grid_j, valid_j)
    out = acc / jnp.maximum(wsum, 1e-8)
    if (D, H, W) != tuple(orig_shape):
        off = [(p0 - o) // 2 for p0, o in zip((D, H, W), orig_shape)]
        out = jax.lax.dynamic_slice(
            out, (*off, 0), (*orig_shape, out_channels))
    return out
