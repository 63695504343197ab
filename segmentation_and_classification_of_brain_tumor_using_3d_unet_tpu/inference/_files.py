"""Shared volume-file discovery helpers (predict CLI + cohort scorer).

One definition of "what is a volume file" and "what is its case stem" —
the two CLIs previously kept drifting copies, and the `split('.')[0]`
stem they both used truncated case ids containing dots (e.g. BIDS-style
``sub-01.ses-01``), silently colliding distinct cases.
"""

from __future__ import annotations

from pathlib import Path
from typing import Union

VOLUME_EXTS = (".nii", ".nii.gz", ".npy")


def is_volume(p: Union[str, Path]) -> bool:
    return str(p).endswith(VOLUME_EXTS)


def volume_stem(name: Union[str, Path]) -> str:
    """Filename without its VOLUME extension only — dots inside the
    case id survive (``sub-01.ses-01_seg.nii.gz`` -> ``sub-01.ses-01_seg``)."""
    name = Path(name).name
    for ext in sorted(VOLUME_EXTS, key=len, reverse=True):
        if name.endswith(ext):
            return name[:-len(ext)]
    return name
