"""Projective TSDF fusion in pure jnp — bounded and contracted (unbounded).

Replaces the reference's Open3D `ScalableTSDFVolume` (bounded path,
utils/mesh_utils.py:156-181) and re-implements its hand-written contracted
fusion (unbounded path, utils/mesh_utils.py:184-279) TPU-natively: voxel
slabs are fused in a `lax.map` over z-blocks so memory stays bounded while
each slab is one big vectorized project-sample-accumulate.

Conventions match the reference:
  * sdf = sampled_depth - voxel_view_z (projective, not euclidean),
  * voxels with sdf < -sdf_trunc from a view are unobserved by that view,
  * tsdf = clip(sdf / sdf_trunc, -1, 1), weight-1 running average,
  * unbounded: voxels live in contracted space (mip-nerf-360 contraction),
    adaptive truncation sdf_trunc *= 1/(2-|x|) outside the unit sphere
    (mesh_utils.py:239-246).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu2dgs.core.cameras import CameraArrays, view_to_pix_matrix


class TSDFVolume(NamedTuple):
    tsdf: jnp.ndarray    # (NX, NY, NZ)
    weight: jnp.ndarray  # (NX, NY, NZ)
    color: jnp.ndarray   # (NX, NY, NZ, 3)
    origin: np.ndarray   # (3,)
    voxel: float


def make_volume(origin, dims, voxel: float) -> TSDFVolume:
    nx, ny, nz = dims
    return TSDFVolume(
        tsdf=jnp.zeros((nx, ny, nz), jnp.float32),
        weight=jnp.zeros((nx, ny, nz), jnp.float32),
        color=jnp.zeros((nx, ny, nz, 3), jnp.float32),
        origin=np.asarray(origin, np.float32),
        voxel=float(voxel),
    )


def _sample_nearest(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """img (H,W[,C]) sampled at float pixel coords; returns values + in-bounds
    mask (nearest neighbor, like Open3D's integrate)."""
    h, w = img.shape[:2]
    xi = jnp.round(x).astype(jnp.int32)
    yi = jnp.round(y).astype(jnp.int32)
    inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    xi = jnp.clip(xi, 0, w - 1)
    yi = jnp.clip(yi, 0, h - 1)
    return img[yi, xi], inb


def integrate(
    vol: TSDFVolume,
    cam: CameraArrays,
    depth: jnp.ndarray,           # (H, W) view-z depth; 0 = no surface
    color: jnp.ndarray,           # (H, W, 3)
    sdf_trunc: float,
    depth_trunc: float,
    width: int,
    height: int,
) -> TSDFVolume:
    """Fuse one view into the bounded volume (one jit-able pure call)."""
    nx, ny, nz = vol.tsdf.shape
    K = view_to_pix_matrix(cam, width, height)      # x_pix_h = x_view @ K

    xs = vol.origin[0] + vol.voxel * jnp.arange(nx, dtype=jnp.float32)
    ys = vol.origin[1] + vol.voxel * jnp.arange(ny, dtype=jnp.float32)
    zs = vol.origin[2] + vol.voxel * jnp.arange(nz, dtype=jnp.float32)

    depth = jnp.where(depth > depth_trunc, 0.0, depth)

    def slab(args):
        x0 = args                                   # scalar world x
        gx, gy, gz = jnp.meshgrid(x0[None][0:1] * 0 + x0, ys, zs, indexing="ij")
        pts = jnp.stack([gx, gy, gz, jnp.ones_like(gx)], axis=-1)  # (1,NY,NZ,4)
        view = pts.reshape(-1, 4) @ cam.world_view  # (M,4)
        z = view[:, 2]
        pix = view[:, :3] @ K                       # homogeneous pixels
        u = pix[:, 0] / jnp.where(z != 0, z, 1.0)
        v = pix[:, 1] / jnp.where(z != 0, z, 1.0)
        d, inb = _sample_nearest(depth, u, v)
        c, _ = _sample_nearest(color, u, v)
        sdf = d - z
        valid = inb & (z > 0) & (d > 0) & (sdf > -sdf_trunc)
        tsdf = jnp.clip(sdf / sdf_trunc, -1.0, 1.0)
        w = valid.astype(jnp.float32)
        return (
            (tsdf * w).reshape(ny, nz),
            w.reshape(ny, nz),
            (c * w[:, None]).reshape(ny, nz, 3),
        )

    t_new, w_new, c_new = lax_map_stacked(slab, xs)

    w_tot = vol.weight + w_new
    safe = jnp.maximum(w_tot, 1e-12)
    tsdf = (vol.tsdf * vol.weight + t_new) / safe
    color_acc = (vol.color * vol.weight[..., None] + c_new) / safe[..., None]
    return vol._replace(
        tsdf=jnp.where(w_tot > 0, tsdf, vol.tsdf),
        weight=w_tot,
        color=jnp.where(w_tot[..., None] > 0, color_acc, vol.color),
    )


def lax_map_stacked(fn, xs):
    """lax.map over the leading axis returning stacked pytree leaves."""
    return jax.lax.map(fn, xs)


def extract_mesh(vol: TSDFVolume, min_weight: float = 1e-6):
    """Marching tetrahedra over the fused volume; returns (verts, faces,
    vertex_colors)."""
    from tpu2dgs.mesh.marching import marching_tetrahedra

    tsdf = np.asarray(vol.tsdf)
    weight = np.asarray(vol.weight)
    verts, faces = marching_tetrahedra(
        tsdf, level=0.0,
        origin=vol.origin, spacing=(vol.voxel,) * 3,
        mask=weight > min_weight,
    )
    colors = _sample_volume_colors(vol, verts)
    return verts, faces, colors


def _sample_volume_colors(vol: TSDFVolume, verts: np.ndarray) -> np.ndarray:
    if verts.shape[0] == 0:
        return np.zeros((0, 3))
    ijk = np.clip(
        np.round((verts - vol.origin[None, :]) / vol.voxel).astype(np.int64),
        0,
        np.array(vol.tsdf.shape) - 1,
    )
    color = np.asarray(vol.color)
    return color[ijk[:, 0], ijk[:, 1], ijk[:, 2]]


# -- unbounded (contracted space) -------------------------------------------


def contract(x: jnp.ndarray) -> jnp.ndarray:
    """Mip-NeRF-360 sphere contraction (reference mesh_utils.py:189-191)."""
    mag = jnp.linalg.norm(x, axis=-1, keepdims=True)
    safe = jnp.maximum(mag, 1e-12)
    return jnp.where(mag > 1.0, (2.0 - 1.0 / safe) * (x / safe), x)


def uncontract(y: jnp.ndarray) -> jnp.ndarray:
    """Inverse contraction (reference mesh_utils.py:193-195)."""
    mag = jnp.linalg.norm(y, axis=-1, keepdims=True)
    safe = jnp.maximum(mag, 1e-12)
    return jnp.where(mag > 1.0, (1.0 / (2.0 - safe)) * (y / safe), y)


# The unbounded (contracted) fusion lives in mesh/extract.py
# (_fuse_world_slab): it is specialized to precomputed world-space slab
# points so the per-slab uncontract runs once, not once per view.
