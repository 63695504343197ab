"""On-device, jit-compiled volumetric preprocessing & augmentation.

The reference runs this chain on host CPU inside DataLoader worker
processes (``training.py:76-172``): percentile clip (1,99) -> z-score
(eps 1e-8) -> ``ndimage.zoom`` to IMAGE_SIZE -> random rot90/flip/noise/
intensity augmentations. Here the whole chain is pure JAX and runs in HBM
(static shapes, explicit PRNG keys), so it fuses with the train step and
never blocks on host workers.

Deviation note: spatial resampling uses half-pixel trilinear
(``jax.image.resize``) rather than ``ndimage.zoom``'s spline grid — the two
agree in the interior to interpolation tolerance; labels use nearest
(order-0 parity, ``training.py:140-145``).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config import AugmentConfig
from ..ops.resize import resize_nearest, resize_trilinear
from ..ops.stats import percentile_clip, zscore_normalize

Array = jax.Array


def preprocess_image(vol: Array,
                     out_size: Optional[Tuple[int, int, int]] = (128,
                                                                 128, 128),
                     clip: Tuple[float, float] = (1.0, 99.0)) -> Array:
    """Single-modality chain (reference ``training.py:117-132``):
    clip -> z-score -> resize. Input (D,H,W) or (D,H,W,1); output
    (*out_size,) float32. ``out_size=None`` keeps native resolution
    (no destructive zoom) for sliding-window inference."""
    squeeze = vol.ndim == 3
    if squeeze:
        vol = vol[..., None]
    vol = zscore_normalize(percentile_clip(vol, *clip))
    if out_size is not None and tuple(out_size) != vol.shape[:3]:
        vol = resize_trilinear(vol[None], out_size)[0]
    return vol[..., 0] if squeeze else vol


def preprocess_multimodal(vols: Array,
                          out_size: Tuple[int, int, int] = (128, 128, 128),
                          clip: Tuple[float, float] = (1.0, 99.0)) -> Array:
    """(D,H,W,M) stack — each modality normalized independently
    (reference ``training.py:82-91``)."""
    chain = lambda v: preprocess_image(v, out_size, clip)
    return jnp.stack([chain(vols[..., m]) for m in range(vols.shape[-1])],
                     axis=-1)


def preprocess_segmentation(seg: Array,
                            out_size: Optional[Tuple[int, int, int]]
                            = (128, 128, 128)) -> Array:
    """Label chain (reference ``training.py:134-146``): BraTS label 4 -> 3,
    nearest resize, int32. ``out_size=None`` keeps native resolution."""
    seg = jnp.where(seg == 4, 3, seg).astype(jnp.int32)
    if out_size is None:
        return seg
    return resize_nearest(seg[None, ..., None], out_size)[0, ..., 0]


def augment_pair(key: jax.Array, image: Array, seg: Array,
                 cfg: AugmentConfig = AugmentConfig()
                 ) -> Tuple[Array, Array]:
    """Random rot90/flips/noise/intensity on an (image, seg) pair.

    image: (D,H,W,C) float; seg: (D,H,W) int. Geometric transforms apply
    to both; intensity transforms to the image only (reference
    ``training.py:148-172``). Fully traceable: branching via lax.switch /
    jnp.where on traced bernoulli draws.
    """
    (k_rot, k_rotk, k_flip, k_noise_p, k_noise_s, k_noise, k_int_p,
     k_int, k_gam_p, k_gam) = jax.random.split(key, 10)

    # --- random rot90 in the (H, W) plane, k in {1,2,3} ---
    # k=1/3 swap H and W, so under a traced cond every branch must
    # return the same shape: only square (H == W) volumes get the full
    # k set; rectangular ones (the high_quality preset's (192,192,128)
    # has H=192, W=128) keep the shape-preserving k=2 (180 deg) only
    # instead of crashing at trace with a branch-aval mismatch
    square = image.shape[1] == image.shape[2]
    do_rot = jax.random.bernoulli(k_rot, cfg.rot90_prob)
    k_val = (jax.random.randint(k_rotk, (), 1, 4) if square
             else jnp.int32(2))

    def rotk(k):
        return (lambda pair: (jnp.rot90(pair[0], k, axes=(1, 2)),
                              jnp.rot90(pair[1], k, axes=(1, 2))))

    branches = ([rotk(1), rotk(2), rotk(3)] if square
                else [rotk(2), rotk(2), rotk(2)])
    image, seg = jax.lax.cond(
        do_rot,
        lambda pair: jax.lax.switch(k_val - 1, branches, pair),
        lambda pair: pair,
        (image, seg),
    )

    # --- random flips along D, H, W ---
    flips = jax.random.bernoulli(k_flip, cfg.flip_prob, (3,))
    for ax in range(3):
        image = jnp.where(flips[ax], jnp.flip(image, axis=ax), image)
        seg = jnp.where(flips[ax], jnp.flip(seg, axis=ax), seg)

    # --- Gaussian noise, sigma ~ U(0, noise_sigma_max) ---
    do_noise = jax.random.bernoulli(k_noise_p, cfg.noise_prob)
    sigma = jax.random.uniform(k_noise_s, (), minval=0.0,
                               maxval=cfg.noise_sigma_max)
    noise = jax.random.normal(k_noise, image.shape, image.dtype) * sigma
    image = jnp.where(do_noise, image + noise, image)

    # --- intensity scaling ~ U(lo, hi) ---
    do_int = jax.random.bernoulli(k_int_p, cfg.intensity_prob)
    scale = jax.random.uniform(k_int, (), minval=cfg.intensity_range[0],
                               maxval=cfg.intensity_range[1])
    image = jnp.where(do_int, image * scale, image)

    # --- gamma curve ~ U(lo, hi) on a min/max-normalized copy ---
    # (nnU-Net practice; monotone per-volume contrast warp that keeps
    # the value range — beyond the reference's augmentation set)
    gp = getattr(cfg, "gamma_prob", 0.0)
    if gp > 0.0:
        do_gam = jax.random.bernoulli(k_gam_p, gp)
        gamma = jax.random.uniform(
            k_gam, (), minval=cfg.gamma_range[0],
            maxval=cfg.gamma_range[1])
        mn = jnp.min(image)
        mx = jnp.max(image)
        unit = (image - mn) / (mx - mn + 1e-8)
        warped = unit ** gamma * (mx - mn) + mn
        image = jnp.where(do_gam, warped, image)

    return image, seg


@functools.partial(jax.jit, static_argnames=("out_size", "clip"))
def normalize_batch(images: Array, segs: Array,
                    out_size: Tuple[int, int, int] = (128, 128, 128),
                    clip: Tuple[float, float] = (1.0, 99.0)
                    ) -> Dict[str, Array]:
    """Deterministic half of the chain: clip -> z-score -> resize (+label
    remap). Cacheable across epochs (no randomness)."""

    def one(img, seg):
        return (preprocess_multimodal(img, out_size, clip),
                preprocess_segmentation(seg, out_size))

    imgs, sgs = jax.vmap(one)(images, segs)
    return {"image": imgs, "mask": sgs}


@functools.partial(jax.jit, static_argnames=("aug_cfg",))
def augment_batch(images: Array, segs: Array, key: jax.Array,
                  aug_cfg: AugmentConfig = AugmentConfig()
                  ) -> Dict[str, Array]:
    """Random half of the chain, applied to already-normalized batches."""
    keys = jax.random.split(key, images.shape[0])
    imgs, sgs = jax.vmap(
        lambda i, s, k: augment_pair(k, i, s, aug_cfg))(images, segs,
                                                        keys)
    return {"image": imgs, "mask": sgs}


@functools.partial(jax.jit, static_argnames=("out_size", "augment", "clip",
                                             "aug_cfg"))
def preprocess_batch(images: Array, segs: Array, key: jax.Array,
                     out_size: Tuple[int, int, int] = (128, 128, 128),
                     augment: bool = False,
                     clip: Tuple[float, float] = (1.0, 99.0),
                     aug_cfg: AugmentConfig = AugmentConfig()
                     ) -> Dict[str, Array]:
    """Batched end-to-end chain: (B,D,H,W,M) raw + (B,D,H,W) raw labels ->
    normalized/resized/(augmented) training batch. vmapped over B."""

    def one(img, seg, k):
        img = preprocess_multimodal(img, out_size, clip)
        seg = preprocess_segmentation(seg, out_size)
        if augment:
            img, seg = augment_pair(k, img, seg, aug_cfg)
        return img, seg

    keys = jax.random.split(key, images.shape[0])
    imgs, sgs = jax.vmap(one)(images, segs, keys)
    return {"image": imgs, "mask": sgs}


def create_data_transforms():
    """Parity shim (reference ``training.py:568-573``): augmentation
    on/off per split — the real transforms live on-device above."""
    return {"train": True, "val": False}
