"""Isosurface extraction without scikit-image.

The reference leans on ``skimage.measure.marching_cubes`` for 3D tumor
meshes and surface area (``utils/visualization.py:155-169``,
``main.py:427-463, 482-485``); that dependency is not in this stack's
budget, so surfaces are extracted natively: a vectorized exposed-voxel-
face mesher (exact for binary voxel masks, watertight, blocky) plus the
exact voxel-face surface area. Units are voxel edges (= mm for 1 mm
isotropic BraTS grids).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

# Each entry: (axis, direction, the 4 corner offsets of the exposed face,
# ordered counter-clockwise seen from outside).
_FACE_CORNERS = {
    (0, +1): [(1, 0, 0), (1, 1, 0), (1, 1, 1), (1, 0, 1)],
    (0, -1): [(0, 0, 0), (0, 0, 1), (0, 1, 1), (0, 1, 0)],
    (1, +1): [(0, 1, 0), (0, 1, 1), (1, 1, 1), (1, 1, 0)],
    (1, -1): [(0, 0, 0), (1, 0, 0), (1, 0, 1), (0, 0, 1)],
    (2, +1): [(0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1)],
    (2, -1): [(0, 0, 0), (0, 1, 0), (1, 1, 0), (1, 0, 0)],
}


def voxel_surface_mesh(mask: np.ndarray
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Binary mask -> (verts (V,3) float32, faces (F,3) int32 triangles).

    Emits two triangles per exposed voxel face. Vertices are deduplicated
    on the integer corner grid.
    """
    m = np.asarray(mask).astype(bool)
    if not m.any():
        return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32))
    mp = np.pad(m, 1)

    corner_chunks = []
    for (axis, d), corners in _FACE_CORNERS.items():
        neighbor = np.roll(mp, -d, axis=axis)
        exposed = mp & ~neighbor
        pos = np.argwhere(exposed) - 1          # unpad
        if len(pos) == 0:
            continue
        quad = pos[:, None, :] + np.asarray(corners)[None, :, :]
        corner_chunks.append(quad)
    if not corner_chunks:
        return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32))
    quads = np.concatenate(corner_chunks, axis=0)      # (Q, 4, 3)

    flat = quads.reshape(-1, 3)
    verts, inverse = np.unique(flat, axis=0, return_inverse=True)
    qi = inverse.reshape(-1, 4)
    faces = np.concatenate([qi[:, [0, 1, 2]], qi[:, [0, 2, 3]]], axis=0)
    return verts.astype(np.float32), faces.astype(np.int32)


def surface_area_voxel(mask: np.ndarray,
                       voxel_face_area: float = 1.0) -> float:
    """Exact exposed-face surface area of a binary voxel mask."""
    m = np.asarray(mask).astype(np.int8)
    if not m.any():
        return 0.0
    area = 0
    for ax in range(m.ndim):
        area += np.abs(np.diff(m, axis=ax)).sum()
        area += np.take(m, 0, axis=ax).sum()
        area += np.take(m, -1, axis=ax).sum()
    return float(area) * voxel_face_area


def mesh_surface_area(verts: np.ndarray, faces: np.ndarray) -> float:
    """Sum of triangle areas."""
    if len(faces) == 0:
        return 0.0
    a = verts[faces[:, 0]]
    b = verts[faces[:, 1]]
    c = verts[faces[:, 2]]
    return float(0.5 * np.linalg.norm(
        np.cross(b - a, c - a), axis=1).sum())
