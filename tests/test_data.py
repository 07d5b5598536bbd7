"""Data layer: COLMAP binary/text parsers, Blender transforms, resolution
policy, camera-convention consistency."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from tpu2dgs.data import colmap
from tpu2dgs.data.scene import (
    Scene, _target_resolution, load_camera, read_scene,
)


def _make_colmap_dataset(root, n_views=6, n_pts=40, binary=True):
    rng = np.random.default_rng(0)
    sparse = os.path.join(root, "sparse", "0")
    images_dir = os.path.join(root, "images")
    os.makedirs(sparse)
    os.makedirs(images_dir)

    cams = {1: colmap.ColmapCamera(1, "PINHOLE", 64, 48,
                                   np.array([60.0, 60.0, 32.0, 24.0]))}
    images = {}
    for i in range(n_views):
        ang = 2 * np.pi * i / n_views
        # camera on a circle looking inward: R_w2c @ (origin - pos) = (0,0,3)
        R_w2c = np.array([
            [np.cos(ang), 0, np.sin(ang)],
            [0, 1, 0],
            [-np.sin(ang), 0, np.cos(ang)],
        ])
        pos = np.array([3 * np.sin(ang), 0.0, -3 * np.cos(ang)])
        qvec = colmap.rotmat2qvec(R_w2c)
        tvec = -R_w2c @ pos
        name = f"im_{i:03d}.png"
        images[i + 1] = colmap.ColmapImage(
            i + 1, qvec, tvec, 1, name,
            np.zeros((0, 2)), np.zeros((0,), np.int64),
        )
        Image.fromarray(
            (rng.random((48, 64, 3)) * 255).astype(np.uint8)
        ).save(os.path.join(images_dir, name))

    xyz = rng.normal(size=(n_pts, 3))
    rgb = (rng.random((n_pts, 3)) * 255).astype(np.uint8)
    if binary:
        colmap.write_cameras_binary(cams, os.path.join(sparse, "cameras.bin"))
        colmap.write_images_binary(images, os.path.join(sparse, "images.bin"))
        colmap.write_points3d_binary(xyz, rgb, os.path.join(sparse, "points3D.bin"))
    else:
        with open(os.path.join(sparse, "cameras.txt"), "w") as f:
            for c in cams.values():
                f.write(f"{c.id} {c.model} {c.width} {c.height} "
                        + " ".join(str(p) for p in c.params) + "\n")
        with open(os.path.join(sparse, "images.txt"), "w") as f:
            for im in images.values():
                f.write(f"{im.id} " + " ".join(str(v) for v in im.qvec)
                        + " " + " ".join(str(v) for v in im.tvec)
                        + f" {im.camera_id} {im.name}\n\n")
        with open(os.path.join(sparse, "points3D.txt"), "w") as f:
            for i in range(n_pts):
                f.write(f"{i} " + " ".join(str(v) for v in xyz[i])
                        + " " + " ".join(str(v) for v in rgb[i]) + " 0.0\n")
    return xyz, rgb


@pytest.mark.parametrize("binary", [True, False])
def test_colmap_roundtrip_and_scene(tmp_path, binary):
    root = str(tmp_path / "scene")
    os.makedirs(root)
    xyz, rgb = _make_colmap_dataset(root, binary=binary)

    info = read_scene(root, eval_split=True)
    assert len(info.train_cameras) + len(info.test_cameras) == 6
    assert len(info.test_cameras) == 1  # every-8th of 6 -> index 0 only
    np.testing.assert_allclose(info.points, xyz, atol=1e-6)
    np.testing.assert_allclose(info.colors, rgb / 255.0, atol=1e-6)
    # orbit of radius 3; norm is over the 5 train cams (mean center off
    # origin), so radius = 1.1 * max-dist-from-mean is a bit above 3
    assert 2.5 < info.radius < 4.2

    cam = load_camera(info.train_cameras[0], resolution=1)
    assert cam.image.shape == (3, 48, 64)
    # camera centers should sit on the radius-3 circle
    assert np.isclose(np.linalg.norm(cam.cam_center), 3.0, atol=1e-5)
    # looking at origin: origin projects to image center, positive depth
    from tpu2dgs.core.transforms import homogenize
    import jax.numpy as jnp

    arr = cam.arrays()
    p = homogenize(jnp.zeros((1, 3))) @ arr.world_view
    assert float(p[0, 2]) > 0  # in front


def test_blender_scene(tmp_path):
    root = str(tmp_path / "lego")
    os.makedirs(root)
    rng = np.random.default_rng(1)
    frames = []
    for i in range(4):
        ang = np.pi * i / 2
        # c2w in OpenGL convention: camera at radius 3, -z_gl looks at origin
        fwd_gl = np.array([np.sin(ang), 0, np.cos(ang)])  # +z_gl (backward)
        pos = 3.0 * fwd_gl
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd_gl)
        right /= np.linalg.norm(right)
        true_up = np.cross(fwd_gl, right)
        c2w = np.eye(4)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, true_up, fwd_gl, pos
        name = f"r_{i}"
        img = np.zeros((32, 32, 4), np.uint8)
        img[:, :, 0] = 200
        img[8:24, 8:24, 3] = 255  # center opaque, border transparent
        Image.fromarray(img).save(os.path.join(root, name + ".png"))
        frames.append({"file_path": name,
                       "transform_matrix": c2w.tolist()})
    with open(os.path.join(root, "transforms_train.json"), "w") as f:
        json.dump({"camera_angle_x": 0.8, "frames": frames}, f)

    info = read_scene(root, white_background=True)
    assert len(info.train_cameras) == 4
    assert info.points.shape == (100_000, 3)
    assert np.all(np.abs(info.points) <= 1.3)

    cam = load_camera(info.train_cameras[0], resolution=1)
    # white bg composited into transparent corners
    np.testing.assert_allclose(cam.image[:, 0, 0], 1.0, atol=1e-6)
    # opaque center keeps its red-ish color
    np.testing.assert_allclose(cam.image[0, 16, 16], 200 / 255, atol=1e-6)
    assert cam.alpha_mask is not None
    assert cam.alpha_mask[0, 0, 0] == 0.0 and cam.alpha_mask[0, 16, 16] == 1.0
    # camera center at radius 3 (axis flip must preserve position)
    assert np.isclose(np.linalg.norm(cam.cam_center), 3.0, atol=1e-5)


def test_resolution_policy():
    # explicit divisors
    assert _target_resolution(1600, 1200, 2) == (800, 600)
    assert _target_resolution(1600, 1200, 8) == (200, 150)
    # -1: autoscale only when width > 1600
    assert _target_resolution(1600, 1200, -1) == (1600, 1200)
    assert _target_resolution(3200, 2400, -1) == (1600, 1200)
    # arbitrary target width
    assert _target_resolution(1000, 500, 400) == (400, 200)
    # resolution_scale multiplies
    assert _target_resolution(1600, 1200, 2, resolution_scale=2.0) == (400, 300)


def test_scene_load_end_to_end(tmp_path):
    root = str(tmp_path / "scene")
    os.makedirs(root)
    _make_colmap_dataset(root)
    scene = Scene.load(root, resolution=1, eval_split=True, shuffle=True)
    assert len(scene.train_cameras) == 5
    assert len(scene.test_cameras) == 1
    assert scene.points.shape[0] == 40
    assert scene.extent > 0
