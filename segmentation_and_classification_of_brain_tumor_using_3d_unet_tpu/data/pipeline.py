"""Async host -> HBM data pipeline.

TPU-native replacement for the reference's 4 DataLoader worker processes +
``pin_memory`` + per-batch ``.to(device)`` (``training.py:576-608, 287-288``):

  host threads decode volumes  ->  bounded queue  ->  ``jax.device_put``
  (async, double-buffered)     ->  jitted on-device preprocess/augment

The preprocessing chain is split into its deterministic half (percentile
clip -> z-score -> resize, ``preprocess.normalize_batch``) and its random
half (``preprocess.augment_batch``). Normalized volumes are cached on
host after first touch (LRU), so epochs 2+ only pay H2D + augmentation —
the expensive normalization no longer competes with train steps for the
device every epoch.
"""

from __future__ import annotations

import queue
import threading
from collections import OrderedDict
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional, Tuple

import jax
import numpy as np

from ..config import AugmentConfig
from ..inference import cropping
from .dataset import BraTS2024Dataset
from .preprocess import augment_batch, normalize_batch

_STOP = object()


class DeviceDataLoader:
    """Iterates device-resident, preprocessed batches.

    Yields ``{'image': (B, *image_size, M) float32,
    'mask': (B, *image_size) int32}`` already on device (optionally
    placed with ``sharding`` for data-parallel training).
    """

    def __init__(self, dataset, batch_size: int = 2,
                 image_size: Tuple[int, int, int] = (128, 128, 128),
                 augment: bool = False, shuffle: bool = False,
                 seed: int = 42, num_workers: int = 4,
                 prefetch: int = 2, drop_last: bool = False,
                 sharding: Optional[jax.sharding.Sharding] = None,
                 aug_cfg: AugmentConfig = AugmentConfig(),
                 norm_cache_size: int = 64,
                 patch_size: Optional[Tuple[int, int, int]] = None,
                 fg_patch_prob: float = 0.5):
        self.dataset = dataset
        self.batch_size = batch_size
        self.image_size = tuple(image_size)
        self.patch_size = tuple(patch_size) if patch_size else None
        self.fg_patch_prob = float(fg_patch_prob)
        self.augment = augment
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.drop_last = drop_last
        self.sharding = sharding
        self.aug_cfg = aug_cfg
        self.norm_cache_size = norm_cache_size
        self._norm_cache: "OrderedDict[int, tuple]" = OrderedDict()
        self._cache_lock = threading.Lock()
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _batch_indices(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
        batches = [idx[i:i + self.batch_size]
                   for i in range(0, len(idx), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        return batches

    # ------------------------------------------------------------------

    def _load_raw(self, idx: int):
        it = self.dataset[int(idx)]
        img = it["image"]
        mask = it["mask"] if "mask" in it else it["segmentation"]
        if img.ndim == 3:
            img = img[..., None]
        return img.astype(np.float32), mask

    def _get_normalized(self, idx: int):
        """Host-cached (image float32, mask int32[, fg coords]).

        Whole-volume mode: resized to ``image_size`` (reference
        semantics). Patch mode: native resolution, cropped to the raw
        nonzero bounding box (nnU-Net preprocessing), plus a subsampled
        table of foreground voxel coordinates for biased sampling.
        """
        with self._cache_lock:
            if idx in self._norm_cache:
                self._norm_cache.move_to_end(idx)
                return self._norm_cache[idx]
        img, mask = self._load_raw(idx)
        if self.patch_size is None:
            out = normalize_batch(
                jax.device_put(img[None]),
                jax.device_put(mask[None].astype(np.int32)),
                out_size=self.image_size)
            entry = (np.asarray(out["image"][0], np.float32),
                     np.asarray(out["mask"][0], np.int32))
        else:
            # bbox from the RAW image (z-scoring shifts exact zeros),
            # rounded up to multiples of 32 within the volume: the
            # jitted normalize_batch compiles per SHAPE, and raw
            # per-patient bboxes are all distinct — a 200-patient first
            # epoch would pay ~200 cold XLA compiles (30-150 s each on
            # this attach). Bucketed bboxes reuse a handful of programs
            # and only pull extra background (zeros the uncropped
            # volume contained anyway) into the crop.
            lo, hi = cropping.nonzero_bbox(img)
            full = img.shape[:3]
            bucket = cropping.bucket_shape(
                [h - l for l, h in zip(lo, hi)], full,
                multiple=32, min_size=32)
            offs = cropping.crop_offsets((lo, hi), bucket, full)
            sl = tuple(slice(o, min(o + b, f))
                       for o, b, f in zip(offs, bucket, full))
            out = normalize_batch(
                jax.device_put(img[sl][None]),
                jax.device_put(np.ascontiguousarray(
                    mask[sl])[None].astype(np.int32)),
                out_size=None)
            nimg = np.asarray(out["image"][0], np.float32)
            nmask = np.asarray(out["mask"][0], np.int32)
            fg = np.argwhere(nmask > 0).astype(np.int32)
            if len(fg) > 4096:
                fg = fg[:: len(fg) // 4096 + 1]
            entry = (nimg, nmask, fg)
        with self._cache_lock:
            self._norm_cache[idx] = entry
            while len(self._norm_cache) > self.norm_cache_size:
                self._norm_cache.popitem(last=False)
        return entry

    def _sample_patch(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        """One foreground-biased random patch (nnU-Net oversampling: a
        ``fg_patch_prob`` fraction of patches is centred on a random
        tumor voxel so the loss always sees foreground)."""
        img, mask, fg = self._get_normalized(idx)
        ps = self.patch_size
        rng = np.random.default_rng(
            self.seed * 1_000_003 + self._epoch * 10_007 + idx)
        shape = mask.shape
        if len(fg) and rng.random() < self.fg_patch_prob:
            center = fg[rng.integers(len(fg))]
            starts = [int(np.clip(c - p // 2, 0, max(s - p, 0)))
                      for c, p, s in zip(center, ps, shape)]
        else:
            starts = [int(rng.integers(0, max(s - p, 0) + 1))
                      for p, s in zip(ps, shape)]
        sl = tuple(slice(st, min(st + p, s))
                   for st, p, s in zip(starts, ps, shape))
        pimg = img[sl]
        pmask = mask[sl]
        pads = [(0, p - (s.stop - s.start)) for p, s in zip(ps, sl)]
        if any(p[1] for p in pads):
            pimg = np.pad(pimg, pads + [(0, 0)])
            pmask = np.pad(pmask, pads)
        return pimg, pmask

    def _assemble(self, indices) -> Dict[str, np.ndarray]:
        imgs, masks = [], []
        for i in indices:
            if self.patch_size is not None:
                img, mask = self._sample_patch(int(i))
            else:
                img, mask = self._get_normalized(int(i))
            imgs.append(img)
            masks.append(mask)
        return {"image": np.stack(imgs), "mask": np.stack(masks)}

    def __iter__(self) -> Iterator[Dict[str, jax.Array]]:
        self._epoch += 1
        batches = self._batch_indices()
        key = jax.random.PRNGKey(self.seed + 1000 * self._epoch)
        keys = jax.random.split(key, max(len(batches), 1))
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        closed = threading.Event()   # consumer gone: stop producing

        def producer():
            from collections import deque

            def put(obj) -> bool:
                """Deliver unless the consumer abandoned the epoch —
                a plain blocking put would pin this thread (and every
                assembled batch) forever when the generator is dropped
                mid-epoch (e.g. a re-raised decode error)."""
                while not closed.is_set():
                    try:
                        out_q.put(obj, timeout=0.5)
                        return True
                    except queue.Full:
                        continue
                return False

            inflight: "deque" = deque()
            try:
                # submit lazily with a bounded in-flight window:
                # Executor.map submits the WHOLE epoch up front, so
                # finished batches buffer in futures and the bounded
                # out_q stops limiting host memory
                window = self.num_workers + max(self.prefetch, 1)
                with ThreadPoolExecutor(self.num_workers) as pool:
                    alive = True
                    for b in batches:
                        inflight.append(pool.submit(self._assemble, b))
                        if len(inflight) >= window:
                            if not put(inflight.popleft().result()):
                                alive = False
                                break
                    while alive and inflight:
                        if not put(inflight.popleft().result()):
                            break
                    for f in inflight:
                        f.cancel()
            except Exception as e:   # surface decode errors to consumer
                put(e)
            finally:
                put(_STOP)

        t = threading.Thread(target=producer, daemon=True)
        t.start()

        i = 0
        try:
            while True:
                host = out_q.get()
                if host is _STOP:
                    break
                if isinstance(host, Exception):
                    raise host
                dev_img = jax.device_put(host["image"], self.sharding)
                dev_mask = jax.device_put(host["mask"], self.sharding)
                if self.augment:
                    yield augment_batch(dev_img, dev_mask, keys[i],
                                        aug_cfg=self.aug_cfg)
                else:
                    yield {"image": dev_img, "mask": dev_mask}
                i += 1
        finally:
            closed.set()   # unblock the producer if we leave early


def create_brats_data_loaders(data_dir: str, batch_size: int = 2,
                              num_workers: int = 4,
                              image_size: Tuple[int, int, int]
                              = (128, 128, 128),
                              seed: int = 42,
                              sharding: Optional[jax.sharding.Sharding]
                              = None,
                              aug_cfg: AugmentConfig = AugmentConfig(),
                              patch_size: Optional[
                                  Tuple[int, int, int]] = None,
                              fg_patch_prob: float = 0.5
                              ) -> Tuple[DeviceDataLoader,
                                         DeviceDataLoader]:
    """Train/val loader pair (reference ``training.py:576-608``).

    ``patch_size`` switches the TRAIN loader to nnU-Net-style native-
    resolution patch sampling (foreground-biased random crops instead of
    whole-volume resize); validation stays whole-volume for comparable
    epoch metrics."""
    # the on-device normalize/augment compiles are 30-150 s on this
    # attach; make every process after the first start warm
    from ..environment import ensure_compilation_cache
    ensure_compilation_cache()
    train_ds = BraTS2024Dataset(data_dir, mode="train", augment=True)
    val_ds = BraTS2024Dataset(data_dir, mode="val", augment=False)
    train = DeviceDataLoader(
        train_ds, batch_size=batch_size, image_size=image_size,
        augment=True, shuffle=True, seed=seed, num_workers=num_workers,
        drop_last=True, sharding=sharding, aug_cfg=aug_cfg,
        patch_size=patch_size, fg_patch_prob=fg_patch_prob)
    val = DeviceDataLoader(
        val_ds, batch_size=batch_size, image_size=image_size,
        augment=False, shuffle=False, seed=seed,
        num_workers=num_workers, drop_last=False, sharding=sharding)
    return train, val


def get_data_loader(dataset, batch_size: int = 1, shuffle: bool = False,
                    **kw) -> DeviceDataLoader:
    """Thin factory (reference ``utils/data_loader.py:124-134``)."""
    return DeviceDataLoader(dataset, batch_size=batch_size,
                            shuffle=shuffle, **kw)
