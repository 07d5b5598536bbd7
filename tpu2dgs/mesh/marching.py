"""Marching tetrahedra iso-surface extraction, vectorized numpy.

Replaces the reference's skimage `measure.marching_cubes` dependency
(utils/mcube_utils.py:17-95) with a self-contained implementation: each grid
cell splits into 6 tetrahedra; each tetrahedron emits 0-2 triangles where
the scalar field crosses `level`. Produces watertight surfaces (more
triangles than marching cubes, same geometry) — downstream Chamfer/F1 eval
samples points, so triangle count is immaterial.

All heavy lifting is dense numpy over (cells, 6 tets); no Python per-cell
loops.
"""

from __future__ import annotations

import numpy as np

# Cube corner offsets, index 0..7 (x fastest).
_CORNERS = np.array([
    [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
    [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
])

# 6-tetrahedra decomposition of the cube around the main diagonal 0-6.
_TETS = np.array([
    [0, 5, 1, 6],
    [0, 1, 2, 6],
    [0, 2, 3, 6],
    [0, 3, 7, 6],
    [0, 7, 4, 6],
    [0, 4, 5, 6],
])

# Tet edges as (corner a, corner b) local indices 0..3.
_TET_EDGES = np.array([[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]])


def _build_tet_table():
    """For each of 16 inside-bitmasks: up to 2 triangles as triples of
    tet-edge indices (-1 padded). "Inside" = value < level."""
    table = -np.ones((16, 2, 3), np.int64)

    def edge(a, b):
        for i, (x, y) in enumerate(_TET_EDGES):
            if {x, y} == {a, b}:
                return i
        raise AssertionError

    for case in range(16):
        inside = [i for i in range(4) if case >> i & 1]
        outside = [i for i in range(4) if not case >> i & 1]
        if len(inside) == 1:
            a = inside[0]
            b, c, d = outside
            table[case, 0] = [edge(a, b), edge(a, c), edge(a, d)]
        elif len(inside) == 3:
            a = outside[0]
            b, c, d = inside
            # reversed winding vs the 1-inside case
            table[case, 0] = [edge(a, b), edge(a, d), edge(a, c)]
        elif len(inside) == 2:
            a, b = inside
            c, d = outside
            ac, ad, bc, bd = edge(a, c), edge(a, d), edge(b, c), edge(b, d)
            table[case, 0] = [ac, ad, bc]
            table[case, 1] = [bc, ad, bd]
    return table


_TET_TABLE = _build_tet_table()


def marching_tetrahedra(grid: np.ndarray, level: float = 0.0,
                        origin=(0.0, 0.0, 0.0), spacing=(1.0, 1.0, 1.0),
                        mask: np.ndarray | None = None):
    """Extract the iso-surface of `grid` (X,Y,Z scalar field).

    Args:
      grid: (NX, NY, NZ) float field.
      level: iso value.
      origin, spacing: world placement of grid[0,0,0] and voxel size.
      mask: optional (NX, NY, NZ) bool; cells touching an invalid corner are
        skipped (the reference masks unobserved TSDF voxels via weight=0).

    Returns:
      verts (V,3) float64 world coords, faces (F,3) int64. Shared vertices
      are merged (exact duplicates from adjacent cells).
    """
    f = np.asarray(grid, np.float64) - level
    nx, ny, nz = f.shape
    if min(nx, ny, nz) < 2:
        return np.zeros((0, 3)), np.zeros((0, 3), np.int64)

    # Cell-corner values: (cx, cy, cz, 8)
    cx, cy, cz = nx - 1, ny - 1, nz - 1
    corners = np.empty((cx, cy, cz, 8), np.float64)
    ok = np.ones((cx, cy, cz), bool)
    valid = None if mask is None else np.asarray(mask, bool)
    for i, (dx, dy, dz) in enumerate(_CORNERS):
        corners[..., i] = f[dx:cx + dx, dy:cy + dy, dz:cz + dz]
        if valid is not None:
            ok &= valid[dx:cx + dx, dy:cy + dy, dz:cz + dz]

    # Active cells: sign change among corners (and valid).
    inside8 = corners < 0.0
    any_in = inside8.any(axis=-1)
    all_in = inside8.all(axis=-1)
    active = ok & any_in & ~all_in
    idx = np.argwhere(active)                       # (A, 3)
    if idx.shape[0] == 0:
        return np.zeros((0, 3)), np.zeros((0, 3), np.int64)
    vals8 = corners[active]                         # (A, 8)

    # Per-tet values & world positions of corners.
    a = idx.shape[0]
    tet_vals = vals8[:, _TETS]                      # (A, 6, 4)
    base = idx[:, None, :] + 0.0                    # (A, 1, 3)
    corner_pos = base[:, :, None, :] + _CORNERS[None, None, :, :]  # (A,1,8,3)
    tet_pos = np.take_along_axis(
        np.broadcast_to(corner_pos, (a, 6, 8, 3)),
        _TETS[None, :, :, None].repeat(a, 0).repeat(3, 3),
        axis=2,
    )                                               # (A, 6, 4, 3)

    inside = tet_vals < 0.0
    case = (inside * (1 << np.arange(4))[None, None, :]).sum(-1)  # (A, 6)

    tris = _TET_TABLE[case]                          # (A, 6, 2, 3) edge ids
    tri_mask = tris[..., 0] >= 0                     # (A, 6, 2)

    # Interpolated vertex on every tet edge (A, 6, 6edge, 3).
    ea = _TET_EDGES[:, 0]
    eb = _TET_EDGES[:, 1]
    va = np.take_along_axis(tet_vals, ea[None, None, :], axis=2)  # (A,6,6)
    vb = np.take_along_axis(tet_vals, eb[None, None, :], axis=2)
    denom = vb - va
    t = np.where(np.abs(denom) > 1e-12, -va / np.where(denom == 0, 1, denom), 0.5)
    t = np.clip(t, 0.0, 1.0)
    pa = np.take_along_axis(tet_pos, ea[None, None, :, None].repeat(3, 3), axis=2)
    pb = np.take_along_axis(tet_pos, eb[None, None, :, None].repeat(3, 3), axis=2)
    edge_pts = pa + t[..., None] * (pb - pa)         # (A, 6, 6, 3)

    # Gather triangle vertices.
    sel = np.where(tris < 0, 0, tris)                # (A, 6, 2, 3)
    tri_pts = np.take_along_axis(
        edge_pts[:, :, None, :, :].repeat(2, 2),     # (A, 6, 2, 6, 3)
        sel[..., None].repeat(3, 4),
        axis=3,
    )                                                # (A, 6, 2, 3, 3)
    tri_pts = tri_pts[tri_mask]                      # (T, 3, 3)

    # Merge duplicate vertices (exact coordinates: interpolation on a shared
    # edge is bit-identical across cells because va/vb come from the same
    # grid entries in the same roles... not guaranteed across tets, so
    # quantize).
    flat = tri_pts.reshape(-1, 3)
    quant = np.round(flat * 1e6).astype(np.int64)
    uniq, inv = np.unique(quant, axis=0, return_inverse=True)
    # representative positions: first occurrence of each unique vertex
    first = np.full(uniq.shape[0], flat.shape[0], np.int64)
    np.minimum.at(first, inv, np.arange(flat.shape[0]))
    verts = flat[first]
    faces = inv.reshape(-1, 3)

    # Drop degenerate faces.
    good = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    faces = faces[good]

    verts = verts * np.asarray(spacing)[None, :] + np.asarray(origin)[None, :]
    return verts, faces
