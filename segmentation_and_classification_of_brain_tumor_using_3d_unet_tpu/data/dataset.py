"""Datasets: BraTS cohort scanning + single-file inference dataset.

Host side stays thin (file scan, decode, cache); all numerics run on
device via ``preprocess.py``. Parity targets:

  * ``BraTS2024Dataset`` (reference ``training.py:29-172``): scans
    ``data_dir/<split>/<patient>/`` for the 4 modalities by filename
    substring + a ``seg`` file. Fixes two reference bugs (SURVEY.md
    section 2.4): accepts BOTH ``.nii.gz`` and ``.npy`` (the reference's
    own synthetic generator writes .npy that its dataset cannot find),
    and its LRU cache actually serves hits after it is full.
  * ``BrainTumorDataset`` (reference ``utils/data_loader.py:15-92``):
    single file -> {'image', 'segmentation', 'path'} with a dummy
    all-zero segmentation; 2D images are stacked to a fake 3D volume.
"""

from __future__ import annotations

import os
import threading
from collections import OrderedDict
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..config import BRATS_MODALITIES
from . import nifti

_VOLUME_EXTS = (".nii.gz", ".nii", ".npy")

_POOL: Optional["ThreadPoolExecutor"] = None
_POOL_LOCK = threading.Lock()


def _decode_pool():
    """Shared decode pool, sized to the host (min 2, max 8 workers);
    created lazily so import stays fork-safe."""
    global _POOL
    with _POOL_LOCK:
        if _POOL is None:
            from concurrent.futures import ThreadPoolExecutor
            workers = max(2, min(8, os.cpu_count() or 2))
            _POOL = ThreadPoolExecutor(
                max_workers=workers, thread_name_prefix="nifti-decode")
    return _POOL


def load_any_volume(path: str) -> np.ndarray:
    """Decode .nii/.nii.gz/.npy (and 2D images via PIL) to float32.

    NIfTI decoding prefers the native C++ reader (multithreaded inflate
    + dtype conversion, ``csrc/host_preprocess.cpp``) and falls back to
    the pure-Python codec."""
    p = str(path)
    if p.endswith(".npy"):
        return np.load(p).astype(np.float32)
    if p.endswith(".nii") or p.endswith(".nii.gz"):
        from . import native
        vol = native.read_nifti(p)
        if vol is not None:
            return np.ascontiguousarray(vol)
        return nifti.load_volume(p)
    # 2D image fallback: grayscale stacked into a fake volume
    # (reference utils/data_loader.py:68-74, main.py:362-367)
    from PIL import Image
    img = np.asarray(Image.open(p).convert("L"), np.float32)
    return np.repeat(img[None, :, :], 128, axis=0)


class BraTS2024Dataset:
    """Multi-modal BraTS cohort (reference ``training.py:29-172``).

    Yields RAW stacked volumes — ``{'image': (D,H,W,4) float32,
    'mask': (D,H,W) uint8, 'patient_id': str}`` at native resolution;
    normalization/resizing/augmentation happen on device
    (``preprocess.normalize_batch`` / ``augment_batch``). The raw LRU is
    deliberately small (full-res 4-modality samples are ~570 MB); the
    loader keeps its own cache of the much smaller normalized tensors.
    """

    def __init__(self, data_dir: str, mode: str = "train",
                 augment: Optional[bool] = None, cache_size: int = 8,
                 modalities: Sequence[str] = BRATS_MODALITIES):
        self.data_dir = str(data_dir)
        self.mode = mode
        self.augment = augment if augment is not None else (mode == "train")
        self.modalities = tuple(modalities)
        self.cache_size = cache_size
        self._cache: "OrderedDict[int, dict]" = OrderedDict()
        self._lock = threading.Lock()
        self.samples = self._load_sample_list()

    def _load_sample_list(self) -> List[Dict[str, str]]:
        root = Path(self.data_dir)
        split_dir = root / self.mode
        if split_dir.is_dir():
            return self._scan(split_dir)
        if (root / "train").is_dir() or (root / "val").is_dir():
            # split layout exists but this split doesn't (e.g. tiny
            # cohorts where every patient landed in train/)
            return []
        # flat layout: deterministic 80/20 index split so train and val
        # never share patients (the reference leaks here — its dataset
        # has no split concept at all, training.py:43-71)
        samples = self._scan(root)
        n_train = int(len(samples) * 0.8)
        if self.mode == "train":
            return samples[:n_train]
        if self.mode in ("val", "test"):
            return samples[n_train:]
        return samples

    def _scan(self, sroot: Path) -> List[Dict[str, str]]:
        samples: List[Dict[str, str]] = []
        for pdir in sorted(p for p in sroot.iterdir() if p.is_dir()):
            if pdir.name in ("train", "val", "test"):
                continue
            files = [f for f in pdir.iterdir()
                     if f.name.endswith(_VOLUME_EXTS)]
            entry: Dict[str, str] = {}
            for m in self.modalities:
                match = [f for f in files
                         if m in f.name and "seg" not in f.name]
                if match:
                    entry[m] = str(sorted(match)[0])
            seg = [f for f in files if "seg" in f.name]
            if len(entry) == len(self.modalities) and seg:
                entry["seg"] = str(sorted(seg)[0])
                entry["patient_id"] = pdir.name
                samples.append(entry)
        return samples

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        with self._lock:
            if idx in self._cache:
                self._cache.move_to_end(idx)
                return self._cache[idx]
        entry = self.samples[idx]
        # decode the 4 modalities + seg concurrently: both the native
        # reader (ctypes) and gzip/zlib release the GIL, so per-modality
        # inflate overlaps on multi-core hosts (the decode tail was the
        # first-epoch bottleneck, benchmarks/RESULTS.md host section)
        paths = [entry[m] for m in self.modalities] + [entry["seg"]]
        decoded = list(_decode_pool().map(load_any_volume, paths))
        vols, seg = decoded[:-1], decoded[-1].astype(np.uint8)
        item = {
            "image": np.stack(vols, axis=-1),       # (D,H,W,M)
            "mask": seg,                            # raw labels, incl. 4
            "patient_id": entry["patient_id"],
        }
        with self._lock:
            self._cache[idx] = item
            while len(self._cache) > self.cache_size:
                self._cache.popitem(last=False)
        return item

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]


class BrainTumorDataset:
    """Single-file inference dataset (reference
    ``utils/data_loader.py:15-92``): min-max normalize + resize happen at
    the consumer; here we return the decoded volume, a dummy all-zero
    segmentation, and the path."""

    def __init__(self, file_paths: Sequence[str],
                 target_size: Tuple[int, int, int] = (128, 128, 128)):
        self.file_paths = [str(p) for p in file_paths]
        self.target_size = tuple(target_size)

    def __len__(self) -> int:
        return len(self.file_paths)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        path = self.file_paths[idx]
        try:
            vol = load_any_volume(path)
        except Exception:
            vol = np.zeros(self.target_size, np.float32)
        lo, hi = float(vol.min()), float(vol.max())
        if hi > lo:
            vol = (vol - lo) / (hi - lo)
        vol = _zoom_to(vol, self.target_size)
        return {
            "image": vol.astype(np.float32),
            "segmentation": np.zeros(self.target_size, np.uint8),
            "path": path,
        }


def _zoom_to(vol: np.ndarray, size: Tuple[int, int, int],
             order: int = 1) -> np.ndarray:
    if vol.shape == tuple(size):
        return vol
    from . import native
    out = native.zoom(np.asarray(vol, np.float32), tuple(size),
                      order=order)
    if out is not None:
        return out
    from scipy import ndimage
    factors = [t / s for t, s in zip(size, vol.shape)]
    out = ndimage.zoom(vol, factors, order=order)
    # zoom rounding can be off by one voxel; pad/crop to exact size
    slices = tuple(slice(0, s) for s in size)
    out = out[slices]
    pad = [(0, s - o) for s, o in zip(size, out.shape)]
    if any(p[1] for p in pad):
        out = np.pad(out, pad)
    return out
