"""Mesh extraction pipeline — the `GaussianExtractor` equivalent.

Mirrors reference utils/mesh_utils.py:73-295: render all training views
(rgb + surf_depth + alpha), estimate the scene bounding sphere from camera
poses, fuse a TSDF (bounded regular grid or contracted/unbounded grid),
run iso-surface extraction, color vertices, and drop floater clusters.

Host orchestration is Python; per-view fusion is one jit'd jnp call.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpu2dgs.core.cameras import Camera
from tpu2dgs.mesh import tsdf as tsdf_lib


@dataclasses.dataclass
class GaussianExtractor:
    """render_fn(camera) -> render-pkg dict (the api.render contract)."""

    render_fn: Callable[[Camera], dict]

    def __post_init__(self):
        self.rgbmaps: list[np.ndarray] = []
        self.depthmaps: list[np.ndarray] = []
        self.alphamaps: list[np.ndarray] = []
        self.cameras: list[Camera] = []
        self.radius: float = 1.0
        self.center: np.ndarray = np.zeros(3)

    def reconstruction(self, cameras: list[Camera]):
        """Render every view and cache rgb/depth on host
        (reference mesh_utils.py:100-123)."""
        self.cameras = list(cameras)
        self.rgbmaps, self.depthmaps, self.alphamaps = [], [], []
        for cam in self.cameras:
            out = self.render_fn(cam)
            self.rgbmaps.append(np.asarray(out["render"]))       # (3,H,W)
            self.depthmaps.append(np.asarray(out["surf_depth"])) # (1,H,W)
            self.alphamaps.append(np.asarray(out["rend_alpha"])) # (1,H,W)
        self.estimate_bounding_sphere()

    def estimate_bounding_sphere(self):
        """Focus point + min camera distance (reference mesh_utils.py:125-137)."""
        c2ws = np.stack([np.linalg.inv(np.asarray(c.world_view).T)
                         for c in self.cameras])
        poses = c2ws @ np.diag([1.0, -1.0, -1.0, 1.0])
        centers = c2ws[:, :3, 3]
        self.center = focus_point_fn(poses)
        self.radius = float(np.linalg.norm(centers - self.center[None], axis=-1).min())

    def _masked_depth(self, i: int, mask_background: bool) -> np.ndarray:
        depth = self.depthmaps[i][0].copy()
        cam = self.cameras[i]
        if mask_background and cam.alpha_mask is not None:
            # reference mesh_utils.py:167-168: gt alpha < 0.5 -> no surface
            m = cam.alpha_mask[0]
            if m.shape == depth.shape:
                depth[m < 0.5] = 0.0
        return depth

    def extract_mesh_bounded(self, voxel_size: float = 0.004,
                             sdf_trunc: float = 0.02, depth_trunc: float = 3.0,
                             mask_background: bool = True):
        """Bounded TSDF fusion on a regular grid
        (reference mesh_utils.py:140-181, defaults from render.py:98-100)."""
        lo = self.center - depth_trunc / 2.0
        dims = tuple(
            int(np.ceil(depth_trunc / voxel_size)) + 1 for _ in range(3)
        )
        vol = tsdf_lib.make_volume(lo, dims, voxel_size)
        cam0 = self.cameras[0]
        w, h = cam0.width, cam0.height
        fuse = jax.jit(
            lambda vol, cam, depth, color: tsdf_lib.integrate(
                vol, cam, depth, color, sdf_trunc, depth_trunc, w, h
            )
        )
        for i, cam in enumerate(self.cameras):
            depth = jnp.asarray(self._masked_depth(i, mask_background))
            color = jnp.asarray(self.rgbmaps[i].transpose(1, 2, 0))
            vol = fuse(vol, cam.arrays(), depth, color)
        return tsdf_lib.extract_mesh(vol)

    def extract_mesh_unbounded(self, resolution: int = 1024,
                               sdf_trunc: Optional[float] = None,
                               slab_batch: int = 16):
        """Contracted-space TSDF + marching tetrahedra
        (reference mesh_utils.py:184-279). The grid spans the contracted
        cube [-R, R]^3 with R slightly under 2; world = center +
        radius * uncontract(y).

        Fusion is fully device-resident: all view depth/color maps are
        stacked once, and each `slab_batch`-slab block of the grid is fused
        against every view with a single jitted `lax.scan` — res/slab_batch
        dispatches total instead of the old res x n_views host loop."""
        res = int(resolution)
        r = 1.8
        if sdf_trunc is None:
            sdf_trunc = 8.0 * r / res  # ~2 voxels, matching ref's voxel-tied trunc

        cam0 = self.cameras[0]
        w, h = cam0.width, cam0.height

        # normalize world so cameras sit inside the unit sphere:
        # y = contract((x - center) / radius)
        cams_stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[c.arrays() for c in self.cameras])
        depths = jnp.stack([
            jnp.asarray(self._masked_depth(i, True))
            for i in range(len(self.cameras))
        ])                                             # (V, H, W)
        rgbs = jnp.stack([
            jnp.asarray(m.transpose(1, 2, 0)) for m in self.rgbmaps
        ])                                             # (V, H, W, 3)

        radius = float(self.radius)
        center = jnp.asarray(self.center, jnp.float32)
        trunc = float(sdf_trunc)

        step_sz = (2.0 * r) / (res - 1)

        @jax.jit
        def fuse_block(x0):
            """Fuse the slab block starting at grid x index x0.

            The contracted grid is generated ON DEVICE from x0 (a scalar) —
            uploading precomputed (B, res, res, 3) point blocks cost more
            host->device traffic than the fusion itself. Outputs are
            narrowed for the device->host copy: f16 tsdf (marching
            interpolation noise floor), bool observed-mask, u8 running-mean
            color — 5x less transfer than three f32 grids."""
            shape = (slab_batch, res, res)
            xs = -r + (x0 + jnp.arange(slab_batch, dtype=jnp.float32)) \
                * step_sz
            ys = -r + jnp.arange(res, dtype=jnp.float32) * step_sz
            pts_c = jnp.stack([
                jnp.broadcast_to(xs[:, None, None], shape),
                jnp.broadcast_to(ys[None, :, None], shape),
                jnp.broadcast_to(ys[None, None, :], shape),
            ], axis=-1)
            flat_c = pts_c.reshape(-1, 3)
            world = tsdf_lib.uncontract(flat_c) * radius + center[None, :]
            init = (
                jnp.zeros(shape, jnp.float32),
                jnp.zeros(shape, jnp.float32),
                jnp.zeros((*shape, 3), jnp.float32),
            )

            def step(state, view):
                cam, depth, rgb = view
                t, wgt, c = _fuse_world_slab(
                    state[0], state[1], state[2], world, flat_c, cam,
                    depth, rgb, sdf_trunc=trunc, w=w, h=h, radius=radius)
                return (t, wgt, c), None

            (t, wgt, c), _ = jax.lax.scan(
                step, init, (cams_stacked, depths, rgbs))
            return (t.astype(jnp.float16), wgt > 1e-6,
                    jnp.clip(c * 255.0, 0, 255).astype(jnp.uint8))

        full_tsdf = np.empty((res, res, res), np.float16)
        full_mask = np.empty((res, res, res), bool)
        full_color = np.empty((res, res, res, 3), np.uint8)
        for x0 in range(0, res, slab_batch):
            b = min(slab_batch, res - x0)
            t, m, c = fuse_block(jnp.float32(x0))
            full_tsdf[x0:x0 + b] = np.asarray(t[:b])
            full_mask[x0:x0 + b] = np.asarray(m[:b])
            full_color[x0:x0 + b] = np.asarray(c[:b])

        from tpu2dgs.mesh.marching import marching_tetrahedra

        verts_c, faces = marching_tetrahedra(
            full_tsdf, level=0.0, origin=(-r, -r, -r),
            spacing=(step_sz,) * 3,
            mask=full_mask,
        )
        # colors sampled in contracted grid space
        ijk = np.clip(
            np.round((verts_c - (-r)) / step_sz).astype(np.int64),
            0, res - 1,
        )
        colors = full_color[ijk[:, 0], ijk[:, 1], ijk[:, 2]] / 255.0
        verts = (
            np.asarray(tsdf_lib.uncontract(jnp.asarray(verts_c, jnp.float32)))
            * self.radius + self.center[None, :]
        )
        return verts, faces, colors


import functools


@functools.partial(jax.jit, static_argnames=("sdf_trunc", "w", "h", "radius"))
def _fuse_world_slab(tsdf, weight, color_acc, world_pts, contracted_pts,
                     cam, depth, color, sdf_trunc, w, h, radius):
    """integrate_contracted specialized to precomputed world points (slab)."""
    from tpu2dgs.core.cameras import view_to_pix_matrix

    shape = tsdf.shape
    K = view_to_pix_matrix(cam, w, h)
    ones = jnp.ones_like(world_pts[:, :1])
    view = jnp.concatenate([world_pts, ones], axis=-1) @ cam.world_view
    z = view[:, 2]
    pix = view[:, :3] @ K
    u = pix[:, 0] / jnp.where(z != 0, z, 1.0)
    v = pix[:, 1] / jnp.where(z != 0, z, 1.0)
    d, inb = tsdf_lib._sample_nearest(depth, u, v)
    c, _ = tsdf_lib._sample_nearest(color, u, v)

    mag = jnp.linalg.norm(contracted_pts, axis=-1)
    trunc = sdf_trunc * radius / jnp.maximum(2.0 - jnp.minimum(mag, 1.97), 0.03)
    sdf = (d - z) / trunc
    valid = inb & (z > 0) & (d > 0) & (sdf > -1.0)
    t = jnp.clip(sdf, -1.0, 1.0)
    wgt = valid.astype(jnp.float32).reshape(shape)

    w_tot = weight + wgt
    safe = jnp.maximum(w_tot, 1e-12)
    new_tsdf = (tsdf * weight + t.reshape(shape) * wgt) / safe
    new_color = (
        color_acc * weight[..., None] + c.reshape(*shape, 3) * wgt[..., None]
    ) / safe[..., None]
    return (
        jnp.where(w_tot > 0, new_tsdf, tsdf),
        w_tot,
        jnp.where(w_tot[..., None] > 0, new_color, color_acc),
    )


def focus_point_fn(poses: np.ndarray) -> np.ndarray:
    """Point nearest to all camera optical axes (reference
    render_utils.py:62-71 / mesh_utils.py usage)."""
    directions, origins = poses[:, :3, 2:3], poses[:, :3, 3:4]
    m = np.eye(3) - directions * np.transpose(directions, [0, 2, 1])
    mt_m = np.transpose(m, [0, 2, 1]) @ m
    focus_pt = np.linalg.inv(mt_m.mean(0)) @ (mt_m @ origins).mean(0)[:, 0]
    return focus_pt


def post_process_mesh(verts: np.ndarray, faces: np.ndarray,
                      colors: Optional[np.ndarray] = None,
                      num_cluster: int = 50, min_faces: int = 50):
    """Keep the largest connected clusters (reference mesh_utils.py:22-43:
    cluster_connected_triangles, keep top `num_cluster` with >= min_faces)."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import connected_components

    if faces.shape[0] == 0:
        return verts, faces, colors
    n = verts.shape[0]
    rows = np.concatenate([faces[:, 0], faces[:, 1], faces[:, 2]])
    cols = np.concatenate([faces[:, 1], faces[:, 2], faces[:, 0]])
    adj = sp.coo_matrix((np.ones_like(rows), (rows, cols)), shape=(n, n))
    _, labels = connected_components(adj, directed=False)
    face_labels = labels[faces[:, 0]]
    sizes = np.bincount(face_labels, minlength=labels.max() + 1)
    keep_labels = np.argsort(sizes)[::-1][:num_cluster]
    keep_labels = keep_labels[sizes[keep_labels] >= min_faces]
    keep = np.isin(face_labels, keep_labels)
    faces = faces[keep]

    used = np.unique(faces)
    remap = -np.ones(n, np.int64)
    remap[used] = np.arange(used.shape[0])
    return (
        verts[used],
        remap[faces],
        None if colors is None else colors[used],
    )


def write_mesh_ply(path: str, verts: np.ndarray, faces: np.ndarray,
                   colors: Optional[np.ndarray] = None) -> None:
    """Binary little-endian PLY with optional uchar vertex colors."""
    n, f = verts.shape[0], faces.shape[0]
    header = ["ply", "format binary_little_endian 1.0", f"element vertex {n}",
              "property float x", "property float y", "property float z"]
    if colors is not None:
        header += ["property uchar red", "property uchar green",
                   "property uchar blue"]
    header += [f"element face {f}", "property list uchar int vertex_indices",
               "end_header"]
    with open(path, "wb") as fh:
        fh.write(("\n".join(header) + "\n").encode("ascii"))
        if colors is not None:
            vdt = np.dtype([("xyz", "<f4", 3), ("rgb", "u1", 3)])
            arr = np.empty(n, vdt)
            arr["xyz"] = verts.astype(np.float32)
            arr["rgb"] = np.clip(colors * 255.0, 0, 255).astype(np.uint8)
        else:
            vdt = np.dtype([("xyz", "<f4", 3)])
            arr = np.empty(n, vdt)
            arr["xyz"] = verts.astype(np.float32)
        fh.write(arr.tobytes())
        fdt = np.dtype([("n", "u1"), ("idx", "<i4", 3)])
        farr = np.empty(f, fdt)
        farr["n"] = 3
        farr["idx"] = faces.astype(np.int32)
        fh.write(farr.tobytes())


def read_mesh_ply(path: str):
    """Read back a mesh PLY written by write_mesh_ply (verts, faces)."""
    from tpu2dgs.model.splats import _parse_ply_header

    with open(path, "rb") as f:
        magic = f.readline().strip()
        assert magic == b"ply"
        nv = nf = 0
        vprops = []
        elem = None
        while True:
            tok = f.readline().decode().strip().split()
            if not tok:
                continue
            if tok[0] == "element":
                elem = tok[1]
                if elem == "vertex":
                    nv = int(tok[2])
                else:
                    nf = int(tok[2])
            elif tok[0] == "property" and elem == "vertex" and len(tok) == 3:
                vprops.append((tok[2], tok[1]))
            elif tok[0] == "end_header":
                break
        from tpu2dgs.model.splats import _PLY_DTYPES

        vdt = np.dtype([(nm, _PLY_DTYPES[t]) for nm, t in vprops])
        vraw = np.frombuffer(f.read(vdt.itemsize * nv), vdt)
        verts = np.stack([vraw["x"], vraw["y"], vraw["z"]], axis=1)
        fdt = np.dtype([("n", "u1"), ("idx", "<i4", 3)])
        fraw = np.frombuffer(f.read(fdt.itemsize * nf), fdt)
        return verts.astype(np.float64), fraw["idx"].astype(np.int64)
