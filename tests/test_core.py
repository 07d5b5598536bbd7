"""Core math: SH, quaternions, camera matrices."""

import jax.numpy as jnp
import numpy as np

from tpu2dgs.core import cameras, sh, transforms


def test_sh_dc_only():
    rgb = jnp.array([[0.2, 0.5, 0.9]])
    coeffs = sh.rgb_to_sh(rgb)  # (1,3)
    shs = jnp.zeros((1, 3, 16)).at[:, :, 0].set(coeffs)
    dirs = jnp.array([[0.0, 0.0, 1.0]])
    out = sh.eval_sh(3, shs, dirs) + 0.5
    np.testing.assert_allclose(out, rgb, atol=1e-6)


def test_sh_degree1_matches_formula():
    rng = np.random.default_rng(0)
    shs = jnp.asarray(rng.normal(size=(5, 3, 16)), jnp.float32)
    d = rng.normal(size=(5, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)
    out = sh.eval_sh(1, shs, d)
    expected = (
        sh.C0 * shs[..., 0]
        - sh.C1 * d[:, None, 1] * shs[..., 1]
        + sh.C1 * d[:, None, 2] * shs[..., 2]
        - sh.C1 * d[:, None, 0] * shs[..., 3]
    )
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_quat_identity_and_orthonormal():
    q = jnp.array([[1.0, 0, 0, 0], [0.3, -0.5, 0.7, 0.2]])
    R = transforms.quat_to_rotmat(q)
    np.testing.assert_allclose(R[0], np.eye(3), atol=1e-6)
    # Orthonormality for arbitrary (unnormalized) quaternion.
    np.testing.assert_allclose(R[1] @ R[1].T, np.eye(3), atol=1e-5)
    assert np.linalg.det(np.asarray(R[1])) > 0.99


def test_quat_90deg_z():
    # 90 deg about z: (cos45, 0, 0, sin45)
    q = jnp.array([[np.cos(np.pi / 4), 0.0, 0.0, np.sin(np.pi / 4)]])
    R = np.asarray(transforms.quat_to_rotmat(q))[0]
    np.testing.assert_allclose(R @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6)


def test_splat_axes_scaling():
    scaling = jnp.array([[2.0, 3.0]])
    q = jnp.array([[1.0, 0, 0, 0]])
    tu, tv, tw = transforms.splat_axes(scaling, q)
    np.testing.assert_allclose(tu[0], [2, 0, 0], atol=1e-6)
    np.testing.assert_allclose(tv[0], [0, 3, 0], atol=1e-6)
    np.testing.assert_allclose(tw[0], [0, 0, 1], atol=1e-6)


def _simple_cam(w=64, h=64, fov=np.pi / 2):
    return cameras.Camera(
        uid=0,
        image_name="t",
        R=np.eye(3),
        T=np.zeros(3),
        fovx=fov,
        fovy=fov,
        width=w,
        height=h,
    )


def test_projection_center_point():
    cam = _simple_cam()
    arr = cam.arrays()
    # Point straight ahead projects to NDC origin -> pixel (W-1)/2.
    p = jnp.array([0.0, 0.0, 5.0, 1.0])
    clip = p @ arr.full_proj
    ndc = clip[:3] / clip[3]
    np.testing.assert_allclose(ndc[:2], [0, 0], atol=1e-6)
    n2p = cameras.ndc_to_pix(64, 64, cam.znear, cam.zfar)
    pix = clip @ n2p
    np.testing.assert_allclose(pix[:2] / pix[3], [31.5, 31.5], atol=1e-5)
    # Homogeneous w equals view depth.
    np.testing.assert_allclose(pix[3], 5.0, atol=1e-5)


def test_camera_center_roundtrip():
    rng = np.random.default_rng(1)
    # random rotation via QR
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    t = rng.normal(size=3)
    cam = cameras.Camera(
        uid=0, image_name="t", R=Q, T=t, fovx=1.0, fovy=1.0, width=8, height=8
    )
    # The camera center must map to the view-space origin.
    c_h = np.array([*cam.cam_center, 1.0])
    view = c_h @ cam.world_view
    np.testing.assert_allclose(view[:3], 0.0, atol=1e-5)


def test_depth_to_normal_plane():
    cam = _simple_cam(32, 32).arrays()
    # Constant-depth plane z=2 facing the camera (camera at origin, +z view).
    depth = jnp.full((32, 32), 2.0)
    n = cameras.depth_to_normal(cam, depth, 32, 32)
    inner = np.asarray(n[8:-8, 8:-8])
    # Normal of the cross(dx, dy) convention for a fronto-parallel plane.
    ref = inner.reshape(-1, 3)[0]
    np.testing.assert_allclose(np.abs(ref[2]), 1.0, atol=1e-4)
    np.testing.assert_allclose(inner, np.broadcast_to(ref, inner.shape), atol=1e-4)


def test_axes_override_matches_internal():
    """The cov3D_precomp-equivalent path: passing splat_axes output as
    axes_override must reproduce the internal computation exactly."""
    import numpy as np
    from tests.test_tiled import _cam, _random_scene
    from tpu2dgs.core import transforms
    from tpu2dgs.raster import preprocess as pre

    cam = _cam(32, 32)
    xyz, scaling, rotation, opacity, features = _random_scene(n=12, seed=31)
    base = pre.preprocess(xyz, scaling, rotation, opacity, features,
                          cam, 32, 32, 3)
    axes = transforms.splat_axes(scaling, rotation)
    over = pre.preprocess(xyz, scaling, rotation, opacity, features,
                          cam, 32, 32, 3, axes_override=axes)
    np.testing.assert_allclose(np.asarray(over.tmat), np.asarray(base.tmat),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(over.normal),
                               np.asarray(base.normal), atol=1e-6)


def test_mark_visible():
    import jax.numpy as jnp
    import numpy as np
    from tests.test_tiled import _cam
    from tpu2dgs.raster.api import mark_visible

    cam = _cam(32, 32)
    xyz = jnp.array([
        [0.0, 0.0, 2.0],    # in front, centered
        [0.0, 0.0, -2.0],   # behind
        [50.0, 0.0, 2.0],   # far outside frustum
        [0.0, 0.0, 0.05],   # closer than near cull
    ])
    vis = np.asarray(mark_visible(xyz, cam))
    assert vis.tolist() == [True, False, False, False]
