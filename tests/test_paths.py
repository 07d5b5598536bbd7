"""Camera path generation (render_utils equivalents)."""

import numpy as np

from tests.test_train import _orbit_camera
from tpu2dgs.data.paths import (
    focus_point_fn, generate_path, transform_poses_pca,
)


def _orbit_cams(n=12, radius=3.0):
    return [_orbit_camera(i, a, radius=radius)
            for i, a in enumerate(np.linspace(0, 2 * np.pi, n, endpoint=False))]


def test_focus_point_of_orbit():
    cams = _orbit_cams()
    c2ws = np.stack([np.linalg.inv(np.asarray(c.world_view).T) for c in cams])
    poses = c2ws[:, :3, :] @ np.diag([1, -1, -1, 1])
    fp = focus_point_fn(poses)
    np.testing.assert_allclose(fp, 0.0, atol=1e-5)


def test_transform_poses_pca_normalizes():
    cams = _orbit_cams()
    c2ws = np.stack([np.linalg.inv(np.asarray(c.world_view).T) for c in cams])
    poses = c2ws[:, :3, :] @ np.diag([1, -1, -1, 1])
    new_poses, transform = transform_poses_pca(poses)
    assert new_poses.shape == (12, 3, 4)
    # normalized: max |position| == 1
    np.testing.assert_allclose(
        np.max(np.abs(new_poses[:, :3, 3])), 1.0, atol=1e-6)


def test_generate_path_orbits_scene():
    cams = _orbit_cams()
    path = generate_path(cams, n_frames=24)
    assert len(path) == 24
    centers = np.stack([c.cam_center for c in path])
    radii = np.linalg.norm(centers, axis=1)
    # path cameras stay at a similar orbit radius and look at the scene
    assert radii.min() > 1.0 and radii.max() < 6.0
    for cam in path[:6]:
        # origin must be in front of the camera
        wv = np.asarray(cam.world_view)
        z = (np.array([0, 0, 0, 1.0]) @ wv)[2]
        assert z > 0, z
