"""Visibility culling of fused meshes against rendered depth maps.

TPU-native equivalent of the reference's optional TnT mesh culling
(/root/reference/scripts/eval_tnt/cull_mesh.py: pyrender mesh depth per
training view -> keep vertices observed in-frustum and in front of the
depth within eps, in >= min_views views; faces keep only if all three
vertices survive). Two deliberate differences:

  * The observation depths are the TRAINED MODEL's rendered surf_depth
    maps (already cached by GaussianExtractor.reconstruction) instead of
    re-rasterizing the mesh with a GL renderer — the fused mesh is built
    from exactly these maps, so "in front of the rendered depth" is the
    same visibility predicate without a pyrender/EGL dependency.
  * Projection + depth sampling run as one jitted XLA program per view
    (batched over all vertices) instead of a torch grid_sample loop.

The reference's own mainline disables this step (eval_tnt/run.py:245);
it ships here for parity and for post-hoc mesh cleanup (--cull_views in
cli/render).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu2dgs.core.cameras import view_to_pix_matrix
from tpu2dgs.mesh import tsdf as tsdf_lib


@functools.partial(jax.jit, static_argnames=("w", "h"))
def _seen_in_view(verts, cam, depth, eps, w: int, h: int):
    """(N,) bool: vertex projects in-frustum and is not occluded by more
    than eps (reference point_masks semantics: where the depth map has no
    surface, frustum membership alone counts)."""
    K = view_to_pix_matrix(cam, w, h)
    ones = jnp.ones_like(verts[:, :1])
    view = jnp.concatenate([verts, ones], axis=-1) @ cam.world_view
    z = view[:, 2]
    pix = view[:, :3] @ K
    safe_z = jnp.where(z != 0, z, 1.0)
    u = pix[:, 0] / safe_z
    v = pix[:, 1] / safe_z
    in_frustum = (z > 0) & (u >= 0) & (u <= w - 1) & (v >= 0) & (v <= h - 1)
    d, inb = tsdf_lib._sample_nearest(depth, u, v)
    front = jnp.where(d > 0.0, z < d + eps, True)
    return in_frustum & inb & front


def cull_mesh(verts: np.ndarray, faces: np.ndarray, cameras,
              depthmaps, eps: float = 0.01, min_views: int = 1):
    """Drop faces not observed by the training views.

    verts (V,3), faces (F,3); cameras: list of core.cameras.Camera;
    depthmaps: list of (1,H,W) rendered surf_depth arrays (the
    GaussianExtractor cache). Returns (verts', faces', vert_keep_mask) with
    unreferenced vertices removed. min_views follows the reference's
    valid_num threshold (they use 20 with hundreds of T&T views; 1-3 suits
    sparse captures)."""
    vj = jnp.asarray(verts, jnp.float32)
    count = np.zeros(len(verts), np.int64)
    for cam, depth in zip(cameras, depthmaps):
        seen = _seen_in_view(vj, cam.arrays(), jnp.asarray(depth[0]),
                             jnp.float32(eps), cam.width, cam.height)
        count += np.asarray(seen)
    keep = count >= min_views
    face_mask = keep[faces].all(axis=1)
    faces_kept = faces[face_mask]
    used = np.zeros(len(verts), bool)
    used[faces_kept.reshape(-1)] = True
    remap = np.cumsum(used) - 1
    return verts[used], remap[faces_kept], keep
