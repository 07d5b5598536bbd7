"""Meshing: marching tetrahedra accuracy, TSDF fusion, end-to-end extraction."""

import numpy as np
import jax.numpy as jnp

from tpu2dgs.mesh import tsdf as tsdf_lib
from tpu2dgs.mesh.extract import (
    GaussianExtractor, post_process_mesh, read_mesh_ply, write_mesh_ply,
)
from tpu2dgs.mesh.marching import marching_tetrahedra


def _sphere_grid(n=48, r=0.7):
    ax = np.linspace(-1, 1, n)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    return np.sqrt(x**2 + y**2 + z**2) - r, ax


def test_marching_tetrahedra_sphere():
    field, ax = _sphere_grid()
    spacing = ax[1] - ax[0]
    verts, faces = marching_tetrahedra(
        field, 0.0, origin=(-1, -1, -1), spacing=(spacing,) * 3
    )
    assert verts.shape[0] > 500
    assert faces.shape[0] > 500
    radii = np.linalg.norm(verts, axis=1)
    np.testing.assert_allclose(radii.mean(), 0.7, atol=0.01)
    assert radii.std() < 0.01
    # surface area ~ 4*pi*r^2 (sum of triangle areas)
    tri = verts[faces]
    area = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1
    ).sum()
    np.testing.assert_allclose(area, 4 * np.pi * 0.7**2, rtol=0.05)


def test_marching_tetrahedra_mask_and_empty():
    field, ax = _sphere_grid(n=16)
    # fully masked -> empty
    verts, faces = marching_tetrahedra(field, mask=np.zeros_like(field, bool))
    assert verts.shape[0] == 0 and faces.shape[0] == 0
    # no crossing -> empty
    verts, faces = marching_tetrahedra(np.ones((8, 8, 8)))
    assert faces.shape[0] == 0


def test_contract_uncontract_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(scale=2.0, size=(100, 3)), jnp.float32)
    y = tsdf_lib.contract(x)
    assert float(jnp.max(jnp.linalg.norm(y, axis=-1))) < 2.0
    back = tsdf_lib.uncontract(y)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-4, atol=1e-4)
    # identity inside the unit ball
    x_in = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1.0) * 0.5
    np.testing.assert_allclose(
        np.asarray(tsdf_lib.contract(x_in)), np.asarray(x_in), atol=1e-6
    )


def _synthetic_views(n_views=10, w=64, h=64):
    """Cameras orbiting the origin + analytic depth maps of a r=0.5 sphere."""
    from tests.test_train import _orbit_camera

    cams, depths = [], []
    r = 0.5
    for i, ang in enumerate(np.linspace(0, 2 * np.pi, n_views, endpoint=False)):
        cam = _orbit_camera(i, ang, radius=2.5, w=w, h=h)
        arr = cam.arrays()
        # ray through each pixel in view space (z=1 plane)
        xs = (np.arange(w) - (w - 1) / 2) / (w / 2) * float(arr.tanfovx)
        ys = (np.arange(h) - (h - 1) / 2) / (h / 2) * float(arr.tanfovy)
        gx, gy = np.meshgrid(xs, ys)
        dirs_view = np.stack([gx, gy, np.ones_like(gx)], -1)
        c2w = np.linalg.inv(np.asarray(cam.world_view))
        dirs_world = dirs_view @ c2w[:3, :3]
        origin = c2w[3, :3]
        # sphere intersection |o + t*d|^2 = r^2 (t in view-z units since
        # dirs have unit view-z)
        a = (dirs_world**2).sum(-1)
        b = 2 * (dirs_world * origin).sum(-1)
        c = (origin**2).sum() - r * r
        disc = b * b - 4 * a * c
        hit = disc > 0
        t = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0))) / (2 * a), 0.0)
        depth = np.where(hit & (t > 0), t, 0.0).astype(np.float32)
        cams.append(cam)
        depths.append(depth)
    return cams, depths, r


def test_tsdf_fusion_recovers_sphere():
    cams, depths, r = _synthetic_views()
    w = h = 64
    vol = tsdf_lib.make_volume((-0.75, -0.75, -0.75), (50, 50, 50), 0.03)
    import jax

    fuse = jax.jit(lambda vol, cam, d, c: tsdf_lib.integrate(
        vol, cam, d, c, sdf_trunc=0.09, depth_trunc=5.0, width=w, height=h))
    for cam, depth in zip(cams, depths):
        color = jnp.ones((h, w, 3), jnp.float32) * 0.5
        vol = fuse(vol, cam.arrays(), jnp.asarray(depth), color)

    verts, faces, colors = tsdf_lib.extract_mesh(vol)
    assert verts.shape[0] > 200
    radii = np.linalg.norm(verts, axis=1)
    # equatorial band is well observed by the orbit; poles are grazing
    band = np.abs(verts[:, 1]) < 0.3
    np.testing.assert_allclose(radii[band].mean(), r, atol=0.03)
    np.testing.assert_allclose(colors[band].mean(), 0.5, atol=0.05)


def test_post_process_and_ply_roundtrip(tmp_path):
    field, ax = _sphere_grid(n=24)
    spacing = ax[1] - ax[0]
    verts, faces = marching_tetrahedra(field, origin=(-1, -1, -1),
                                       spacing=(spacing,) * 3)
    # add a tiny floater: an isolated triangle far away
    verts2 = np.concatenate([verts, np.array([[5, 5, 5], [5.1, 5, 5], [5, 5.1, 5]])])
    faces2 = np.concatenate([faces, [[len(verts), len(verts) + 1, len(verts) + 2]]])
    colors2 = np.ones((verts2.shape[0], 3)) * 0.3

    v3, f3, c3 = post_process_mesh(verts2, faces2, colors2, num_cluster=1)
    assert f3.shape[0] == faces.shape[0]
    assert np.all(np.linalg.norm(v3, axis=1) < 2.0)

    path = str(tmp_path / "mesh.ply")
    write_mesh_ply(path, v3, f3, c3)
    rv, rf = read_mesh_ply(path)
    np.testing.assert_allclose(rv, v3, atol=1e-5)
    np.testing.assert_array_equal(rf, f3)


def test_extractor_end_to_end_bounded():
    """Render a splat scene, fuse, mesh: surface lands near the splats."""
    from tests.test_train import _gt_scene, _orbit_camera
    from tpu2dgs.raster.api import RasterSettings, render

    w = h = 48
    gt_splats, gt_xyz, _ = _gt_scene(n=24, seed=2)
    settings = RasterSettings(width=w, height=h, sh_degree=0, backend="tiled",
                              bin_capacity=64, tile_capacity=64,
                              depth_ratio=1.0)
    bg = jnp.zeros(3)

    def render_fn(cam):
        return render(cam.arrays(), settings, *gt_splats, bg)

    cams = [_orbit_camera(i, a, radius=3.0, w=w, h=h)
            for i, a in enumerate(np.linspace(0, 2 * np.pi, 8, endpoint=False))]
    ex = GaussianExtractor(render_fn)
    ex.reconstruction(cams)
    assert ex.radius > 0
    verts, faces, colors = ex.extract_mesh_bounded(
        voxel_size=0.06, sdf_trunc=0.18, depth_trunc=6.0,
        mask_background=False,
    )
    assert verts.shape[0] > 50
    assert faces.shape[0] > 50
    # floater removal (reference render.py:106) then the surface must sit
    # inside the splat cluster bounding box (with margin)
    verts, faces, colors = post_process_mesh(verts, faces, colors,
                                             num_cluster=1)
    lo, hi = gt_xyz.min(0) - 0.5, gt_xyz.max(0) + 0.5
    frac_inside = np.mean(np.all((verts > lo) & (verts < hi), axis=1))
    assert frac_inside > 0.95


def test_cull_mesh_visibility():
    """mesh/cull.py: vertices outside every frustum or occluded beyond eps
    are culled; observed ones survive; face reindexing is consistent
    (reference eval_tnt/cull_mesh.py point_masks semantics)."""
    from tpu2dgs.core.cameras import Camera
    from tpu2dgs.mesh.cull import cull_mesh

    w = h = 64
    cam = Camera(uid=0, image_name="c", R=np.eye(3), T=np.zeros(3),
                 fovx=np.pi / 2, fovy=np.pi / 2, width=w, height=h)
    # depth map: a wall at z=2 everywhere
    depth = np.full((1, h, w), 2.0, np.float32)
    verts = np.array([
        [0.0, 0.0, 1.0],    # in frustum, in front of the wall -> seen
        [0.0, 0.0, 1.99],   # just at the wall (within eps) -> seen
        [0.0, 0.0, 3.0],    # behind the wall -> occluded
        [10.0, 0.0, 1.0],   # outside the frustum
        [0.0, 0.0, -1.0],   # behind the camera
    ], np.float32)
    faces = np.array([[0, 1, 2], [0, 1, 1], [2, 3, 4]])
    v2, f2, keep = cull_mesh(verts, faces, [cam], [depth],
                             eps=0.05, min_views=1)
    np.testing.assert_array_equal(keep, [True, True, False, False, False])
    # only the degenerate face with all-seen vertices survives
    assert len(f2) == 1 and len(v2) == 2
    np.testing.assert_allclose(v2, verts[:2])
    np.testing.assert_array_equal(f2, [[0, 1, 1]])
