"""Config system, checkpointing, eval geometry, and the CLI train->render->
metrics pipeline on a miniature scene."""

import json
import os

import numpy as np
import pytest

from tpu2dgs.cli import config as cfg_lib
from tpu2dgs.eval import geometry


def test_cfg_args_roundtrip(tmp_path):
    import argparse

    ns = argparse.Namespace(
        sh_degree=3, source_path="/data/lego", model_path=str(tmp_path),
        images="images", resolution=2, white_background=True,
        data_device="cuda", eval=True,
    )
    cfg_lib.save_cfg_args(str(tmp_path), ns)
    loaded = cfg_lib.load_cfg_args(str(tmp_path))
    assert loaded.source_path == "/data/lego"
    assert loaded.resolution == 2
    assert loaded.white_background is True

    # reference-written cfg_args parse (their exact repr format)
    with open(tmp_path / "cfg_args", "w") as f:
        f.write("Namespace(data_device='cuda', eval=True, images='images', "
                "model_path='/out/m', resolution=-1, sh_degree=3, "
                "source_path='/data/dtu', white_background=False)")
    loaded = cfg_lib.load_cfg_args(str(tmp_path))
    assert loaded.source_path == "/data/dtu"
    assert loaded.eval is True


def test_parser_reference_flags():
    from tpu2dgs.cli.train import build_parser

    parser = build_parser()
    args = parser.parse_args([
        "-s", "/data/x", "-m", "/out/y", "-r", "2", "-w",
        "--iterations", "7000", "--lambda_dist", "1000",
        "--depth_ratio", "1", "--eval",
    ])
    assert args.source_path == "/data/x"
    assert args.resolution == 2
    assert args.white_background is True
    assert args.iterations == 7000
    assert args.lambda_dist == 1000.0
    assert args.depth_ratio == 1.0


def test_checkpoint_roundtrip(tmp_path):
    from tpu2dgs.model import optim as optim_lib
    from tpu2dgs.model import splats as splats_lib
    from tpu2dgs.train import checkpoint as ckpt_lib

    rng = np.random.default_rng(0)
    model = splats_lib.create_from_pcd(
        rng.normal(size=(20, 3)).astype(np.float32),
        rng.random((20, 3)).astype(np.float32), capacity=32)
    adam = optim_lib.init_adam(model.params)
    adam = adam._replace(count=adam.count + 5,
                         mu=adam.mu._replace(xyz=adam.mu.xyz + 1.0))

    path = str(tmp_path / "ck.npz")
    ckpt_lib.save_checkpoint(path, model, adam, 1234, {"ema": 0.5})
    m2, a2, step, extra = ckpt_lib.load_checkpoint(path)
    assert step == 1234
    assert float(extra["ema"]) == 0.5
    assert int(a2.count) == 5
    np.testing.assert_allclose(np.asarray(m2.params.xyz), np.asarray(model.params.xyz))
    np.testing.assert_allclose(np.asarray(a2.mu.xyz), np.asarray(adam.mu.xyz))
    np.testing.assert_array_equal(np.asarray(m2.live), np.asarray(model.live))


def test_chamfer_and_fscore():
    rng = np.random.default_rng(1)
    pts = rng.random((2000, 3))
    # identical sets -> zero distance, perfect F1
    d2s, s2d, ch = geometry.chamfer_distance(pts, pts)
    assert ch == 0.0
    p, r, f1 = geometry.fscore(pts, pts, tau=0.01)
    assert f1 == 1.0
    # shifted set -> distance equals the shift
    shifted = pts + np.array([0.05, 0, 0])
    d2s, s2d, ch = geometry.chamfer_distance(shifted, pts)
    assert 0.03 < ch < 0.06
    p, r, f1 = geometry.fscore(shifted, pts, tau=0.01)
    assert f1 < 0.5


def test_sample_mesh_points_and_downsample():
    # unit square split in two triangles
    verts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], float)
    faces = np.array([[0, 1, 2], [0, 2, 3]])
    pts = geometry.sample_mesh_points(verts, faces, 5000, seed=0)
    assert pts.shape == (5000, 3)
    assert np.all(pts[:, 2] == 0)
    assert np.all((pts[:, :2] >= 0) & (pts[:, :2] <= 1))
    # roughly uniform: mean near centroid
    np.testing.assert_allclose(pts.mean(0)[:2], [0.5, 0.5], atol=0.03)

    down = geometry.downsample_points(pts, 0.2)
    assert down.shape[0] < 60  # ~25 cells


def test_icp_alignment():
    rng = np.random.default_rng(2)
    pts = rng.random((500, 3))
    ang = 0.1
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    t = np.array([0.05, -0.02, 0.03])
    moved = pts @ R.T + t
    T = geometry.align_icp(moved, pts, iters=30)
    aligned = moved @ T[:3, :3].T + T[:3, 3]
    assert np.abs(aligned - pts).max() < 1e-3


def test_train_render_metrics_pipeline(tmp_path):
    """Miniature end-to-end CLI pipeline on a generated Blender scene."""
    import jax.numpy as jnp
    from PIL import Image

    from tests.test_train import _gt_scene
    from tpu2dgs.raster.api import RasterSettings, render as render_op
    from tpu2dgs.cli import train as cli_train
    from tpu2dgs.cli import render as cli_render
    from tpu2dgs.cli import metrics as cli_metrics

    # build dataset
    root = str(tmp_path / "scene")
    os.makedirs(root)
    w = h = 32
    gt_splats, _, _ = _gt_scene(n=16, seed=9)
    st = RasterSettings(width=w, height=h, sh_degree=0, backend="tiled",
                        bin_capacity=32, tile_capacity=32)
    frames = []
    for i, ang in enumerate(np.linspace(0, 2 * np.pi, 6, endpoint=False)):
        fwd_gl = np.array([np.sin(ang), 0, np.cos(ang)])
        pos = 3.0 * fwd_gl
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd_gl)
        right /= np.linalg.norm(right)
        c2w = np.eye(4)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = (
            right, np.cross(fwd_gl, right), fwd_gl, pos)
        gl = c2w.copy()
        gl[:3, 1:3] *= -1
        w2c = np.linalg.inv(gl)
        from tpu2dgs.core import cameras as C

        cam = C.Camera(uid=i, image_name=f"r_{i}", R=w2c[:3, :3].T,
                       T=w2c[:3, 3], fovx=0.8, fovy=0.8, width=w, height=h)
        img = np.asarray(render_op(cam.arrays(), st, *gt_splats, jnp.zeros(3))["render"])
        Image.fromarray(
            (np.clip(img.transpose(1, 2, 0), 0, 1) * 255).astype(np.uint8)
        ).save(os.path.join(root, f"r_{i}.png"))
        frames.append({"file_path": f"r_{i}", "transform_matrix": c2w.tolist()})
    with open(os.path.join(root, "transforms_train.json"), "w") as f:
        json.dump({"camera_angle_x": 0.8, "frames": frames}, f)
    # test split = same frames (tiny)
    with open(os.path.join(root, "transforms_test.json"), "w") as f:
        json.dump({"camera_angle_x": 0.8, "frames": frames[:2]}, f)

    out = str(tmp_path / "out")
    cli_train.main([
        "-s", root, "-m", out, "--eval", "--iterations", "30",
        "--save_iterations", "30", "--test_iterations", "30",
        "--checkpoint_iterations", "30",
        "--densify_from_iter", "1000",
        "--bin_capacity", "64", "--tile_capacity", "64", "--quiet",
        "--max_capacity", "131072",
    ])
    assert os.path.exists(os.path.join(out, "cfg_args"))
    assert os.path.exists(
        os.path.join(out, "point_cloud", "iteration_30", "point_cloud.ply"))
    assert os.path.exists(os.path.join(out, "chkpnt30.npz"))
    # model-dir interchange files (reference scene/__init__.py:50-62)
    assert os.path.exists(os.path.join(out, "input.ply"))
    with open(os.path.join(out, "cameras.json")) as f:
        cam_json = json.load(f)
    assert len(cam_json) == 6 + 2  # train + test
    assert {"id", "img_name", "width", "height", "position", "rotation",
            "fx", "fy"} <= set(cam_json[0])
    from tpu2dgs.model.splats import read_ply_vertices
    vv = read_ply_vertices(os.path.join(out, "input.ply"))
    assert {"x", "y", "z", "nx", "red"} <= set(vv)

    cli_render.main([
        "-m", out, "--quiet", "--skip_train",
        "--voxel_size", "0.1", "--sdf_trunc", "0.3", "--depth_trunc", "6.0",
        "--num_cluster", "1",
    ])
    test_dir = os.path.join(out, "test", "ours_30")
    assert os.path.exists(os.path.join(test_dir, "renders", "00000.png"))
    assert os.path.exists(os.path.join(test_dir, "gt", "00000.png"))
    assert os.path.exists(
        os.path.join(out, "train", "ours_30", "fuse_post.ply"))

    cli_metrics.main(["-m", out, "--no_lpips"])
    with open(os.path.join(out, "results.json")) as f:
        results = json.load(f)
    assert "ours_30" in results
    assert results["ours_30"]["PSNR"] > 10.0


def test_checkpoint_resume_continues(tmp_path):
    """--start_checkpoint resumes training from saved state."""
    import jax.numpy as jnp
    import numpy as np

    from tests.test_train import _gt_scene, _orbit_camera
    from tpu2dgs.model import splats as splats_lib
    from tpu2dgs.raster.api import RasterSettings, render as render_op
    from tpu2dgs.train import checkpoint as ckpt_lib
    from tpu2dgs.train.loop import TrainConfig, Trainer

    w = h = 32
    gt_splats, gt_xyz, gt_rgb = _gt_scene(n=10, seed=12)
    cams = [_orbit_camera(i, a, w=w, h=h)
            for i, a in enumerate(np.linspace(0, 2 * np.pi, 3, endpoint=False))]
    st = RasterSettings(width=w, height=h, sh_degree=0, backend="tiled",
                        bin_capacity=16, tile_capacity=16)
    for cam in cams:
        cam.image = np.asarray(
            render_op(cam.arrays(), st, *gt_splats, jnp.zeros(3))["render"])

    def make_trainer(model):
        return Trainer(
            model, cams, w, h, spatial_lr_scale=1.0, scene_extent=3.0,
            train_cfg=TrainConfig(densify_from_iter=10_000,
                                  normal_from_iter=10_000,
                                  dist_from_iter=10_000),
            max_sh_degree=0,
            raster_kwargs=dict(backend="tiled", bin_capacity=16,
                               tile_capacity=16),
        )

    t1 = make_trainer(splats_lib.create_from_pcd(gt_xyz, gt_rgb, capacity=16))
    t1.train(num_iters=20)
    path = str(tmp_path / "ck.npz")
    ckpt_lib.save_checkpoint(path, t1.model, t1.adam, t1.step)

    model2, adam2, step2, _ = ckpt_lib.load_checkpoint(path)
    t2 = make_trainer(model2)
    t2.adam = adam2
    t2.step = step2
    assert t2.step == 20
    assert int(t2.adam.count) == int(t1.adam.count)
    t2.train(num_iters=10)
    assert t2.step == 30
    assert np.isfinite(t2.ema_loss)
    for leaf in t2.model.params:
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_colmap_cli_train_pipeline(tmp_path):
    """COLMAP-format dataset through the real CLI: detection, binary
    parsing, llffhold eval split, training, and model-dir outputs (the
    Blender path is covered by test_train_render_metrics_pipeline)."""
    from tests.test_data import _make_colmap_dataset
    from tpu2dgs.cli import train as cli_train

    root = str(tmp_path / "colmap_scene")
    os.makedirs(root)
    _make_colmap_dataset(root, n_views=6, n_pts=40)

    out = str(tmp_path / "out")
    cli_train.main([
        "-s", root, "-m", out, "--eval", "--iterations", "8",
        "--save_iterations", "8", "--test_iterations", "8",
        "--densify_from_iter", "1000", "--resolution", "1",
        "--bin_capacity", "64", "--tile_capacity", "64", "--quiet",
        "--max_capacity", "131072",
    ])
    assert os.path.exists(
        os.path.join(out, "point_cloud", "iteration_8", "point_cloud.ply"))
    assert os.path.exists(os.path.join(out, "cameras.json"))
    assert os.path.exists(os.path.join(out, "input.ply"))
    with open(os.path.join(out, "cfg_args")) as f:
        assert "sh_degree" in f.read()
