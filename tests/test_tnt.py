"""TnT evaluation protocol: trajectory similarity registration, crop
volumes, scaled ICP, and the end-to-end F-score script on a synthetic scene
in an arbitrarily scaled/rotated/translated COLMAP frame (the reference's
eval_tnt/registration.py + run.py semantics)."""

import json
import os

import numpy as np
import pytest

from tpu2dgs.eval import trajectory as tio
from tpu2dgs.eval.geometry import align_icp, fscore


def _rot(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    k = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(angle) * k + (1 - np.cos(angle)) * k @ k


def _similarity(scale, axis, angle, t):
    m = np.eye(4)
    m[:3, :3] = scale * _rot(axis, angle)
    m[:3, 3] = t
    return m


def test_umeyama_recovers_similarity():
    rng = np.random.default_rng(0)
    src = rng.normal(size=(50, 3))
    T = _similarity(0.37, [1, 2, 3], 1.1, [4.0, -2.0, 0.5])
    dst = src @ T[:3, :3].T + T[:3, 3]
    est = tio.umeyama(src, dst, with_scale=True)
    np.testing.assert_allclose(est, T, atol=1e-9)


def test_ransac_robust_to_outliers():
    rng = np.random.default_rng(1)
    src = rng.normal(size=(80, 3))
    T = _similarity(2.5, [0, 0, 1], -0.7, [1.0, 2.0, 3.0])
    dst = src @ T[:3, :3].T + T[:3, 3]
    # corrupt 25% of the correspondences
    bad = rng.choice(80, 20, replace=False)
    dst[bad] += rng.normal(scale=5.0, size=(20, 3))
    est = tio.ransac_correspondences(src, dst, threshold=0.05, seed=2)
    np.testing.assert_allclose(est, T, atol=1e-6)


def test_trajectory_log_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    traj = []
    for i in range(5):
        m = np.eye(4)
        m[:3, :3] = _rot(rng.normal(size=3), rng.uniform(0, 3))
        m[:3, 3] = rng.normal(size=3)
        traj.append(tio.CameraPose((i, i, 0), m))
    p = os.path.join(tmp_path, "t.log")
    tio.write_trajectory(traj, p)
    back = tio.read_trajectory(p)
    assert len(back) == 5
    for a, b in zip(traj, back):
        assert a.metadata == b.metadata
        np.testing.assert_allclose(a.pose, b.pose, atol=1e-10)


def test_crop_volume_polygon():
    vol = tio.CropVolume(
        orthogonal_axis=2, axis_min=-1.0, axis_max=1.0,
        polygon=np.array([[0, 0], [2, 0], [2, 2], [0, 2]], np.float64))
    pts = np.array([
        [1.0, 1.0, 0.0],    # inside
        [3.0, 1.0, 0.0],    # outside polygon
        [1.0, 1.0, 2.0],    # outside axis range
        [0.5, 1.5, -0.5],   # inside
    ])
    np.testing.assert_array_equal(
        tio.crop_points(pts, vol), [True, False, False, True])


def test_scaled_icp_recovers_scale():
    rng = np.random.default_rng(3)
    target = rng.uniform(-1, 1, (2000, 3))
    T = _similarity(1.15, [1, 0, 0], 0.05, [0.02, -0.01, 0.03])
    src = (target - T[:3, 3]) @ np.linalg.inv(T[:3, :3]).T
    est = align_icp(src, target, iters=30, with_scale=True)
    scale = np.cbrt(np.linalg.det(est[:3, :3]))
    assert abs(scale - 1.15) < 0.01, scale


def test_tnt_scene_end_to_end(tmp_path):
    """A mesh + trajectory in a scaled/rotated/translated COLMAP frame must
    recover F1 ~ 1.0 against the GT-frame point cloud (VERDICT round-1 gap:
    ICP alone cannot recover scale)."""
    from tpu2dgs.data.scene import store_ply
    from tpu2dgs.mesh.extract import write_mesh_ply
    import scripts.eval_tnt_scene as tnt

    rng = np.random.default_rng(4)
    # GT surface: a unit box shell sampled densely, in the GT frame.
    n = 4000
    face = rng.integers(0, 6, n)
    uv = rng.uniform(-1, 1, (n, 2))
    pts = np.zeros((n, 3))
    axis = face % 3
    sign = np.where(face < 3, 1.0, -1.0)
    for i in range(n):
        others = [j for j in range(3) if j != axis[i]]
        pts[i, axis[i]] = sign[i]
        pts[i, others[0]], pts[i, others[1]] = uv[i]
    gt_pts = pts * 2.0 + np.array([10.0, 5.0, 2.0])

    # Estimated reconstruction lives in a COLMAP frame related by a large
    # similarity (scale 0.31, rotation, translation).
    S = _similarity(0.31, [1, 1, 0], 2.0, [3.0, -1.0, 7.0])
    S_inv = np.linalg.inv(S)
    est_pts = gt_pts @ S_inv[:3, :3].T + S_inv[:3, 3]

    # Camera rings around the object in both frames (exact correspondence).
    ang = np.linspace(0, 2 * np.pi, 24, endpoint=False)
    centers_gt = np.stack([10 + 6 * np.cos(ang), 5 + 6 * np.sin(ang),
                           2 + 0 * ang], 1)
    centers_est = centers_gt @ S_inv[:3, :3].T + S_inv[:3, 3]

    def traj_of(centers):
        out = []
        for i, c in enumerate(centers):
            m = np.eye(4)
            m[:3, 3] = c
            out.append(tio.CameraPose((i, i, 0), m))
        return out

    gt_log = os.path.join(tmp_path, "gt_COLMAP_SfM.log")
    tio.write_trajectory(traj_of(centers_gt), gt_log)
    est_log = os.path.join(tmp_path, "est.log")
    tio.write_trajectory(traj_of(centers_est), est_log)
    trans_path = os.path.join(tmp_path, "gt_trans.txt")
    np.savetxt(trans_path, np.eye(4))

    gt_ply = os.path.join(tmp_path, "gt.ply")
    store_ply(gt_ply, gt_pts, np.full((n, 3), 0.5))
    mesh_ply = os.path.join(tmp_path, "mesh.ply")
    # vertex-only "mesh" (faces empty): sample_mesh_points falls back
    write_mesh_ply(mesh_ply, est_pts, np.zeros((0, 3), np.int64))

    out = os.path.join(tmp_path, "f1.json")
    tau = 0.1
    tnt.main([
        "--gt-ply", gt_ply, "--ply-path", mesh_ply, "--tau", str(tau),
        "--traj-path", est_log, "--gt-log", gt_log,
        "--gt-trans", trans_path, "--out", out, "--n-samples", "4000",
    ])
    with open(out) as f:
        res = json.load(f)
    assert res["f1"] > 0.99, res

    # Sanity: without registration the frames are incomparable.
    p, r, f1_raw = fscore(est_pts, gt_pts, tau)
    assert f1_raw < 0.1, f1_raw


def test_pr_curves_and_plot(tmp_path):
    """pr_curves reproduces fscore's terms at tau and the PR artifact
    writes (reference plot.py behavior)."""
    import sys

    from tpu2dgs.eval.geometry import fscore, pr_curves

    rng = np.random.default_rng(0)
    gt = rng.uniform(0, 1, (2000, 3))
    data = gt + rng.normal(0, 0.01, gt.shape)
    tau = 0.02
    p, r, f1 = fscore(data, gt, tau)
    edges, cum_p, cum_r = pr_curves(data, gt, tau, stretch=5.0, bins=100)
    # curves are cumulative and monotone
    assert np.all(np.diff(cum_p) >= 0) and np.all(np.diff(cum_r) >= 0)
    # the bin at tau matches fscore's precision/recall (tau = edge 20)
    i = np.searchsorted(edges[1:], tau)
    assert abs(cum_p[i] - p) < 0.02 and abs(cum_r[i] - r) < 0.02

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                    "scripts"))
    import eval_tnt_scene

    eval_tnt_scene.save_pr_plot(str(tmp_path), "synthetic", f1, tau,
                                edges, cum_p, cum_r)
    assert (tmp_path / "PR_synthetic_@d_th_0_0200.png").exists()
    assert (tmp_path / "PR_synthetic_@d_th_0_0200.pdf").exists()
