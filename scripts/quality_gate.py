"""Synthetic end-to-end quality gate: CLI train -> render -> metrics ->
mesh -> Chamfer, with documented thresholds.

The reference's QA strategy is eval-as-integration-test on real datasets
(SURVEY.md §4: DTU Chamfer 0.74, TnT F1 0.32). This image has no datasets
and no egress, so this gate reproduces the same PIPELINE on a generated
scene whose ground-truth surface is known exactly: a textured surfel shell
(radius ~0.8 sphere with bumps) rendered from an orbit. It writes a
Blender-format dataset to disk, runs the REAL CLI end to end (train with
densification, render + bounded TSDF fusion, metrics), and scores

  * novel-view PSNR on the held-out test split (reference metric #1),
  * Chamfer distance of the fused mesh against the generating shell
    (reference metric #2, DTU-style bidirectional mean).

Measured when healthy (TPU v5e, 128x128, 12 train views, 2000 iters,
random-point init per the reference's Blender protocol): PALLAS backend
PSNR 22.39 dB, SSIM 0.822, Chamfer 0.051, backend-cross 120 dB (round 5;
the tiled backend measured 22.5/0.826/0.045 in round 3 — the backends
agree). Quality still rising at this budget — 600 iters gives 16.2 dB /
0.23. Gate thresholds are set ~15-30% under those: PSNR >= 19 dB,
Chamfer <= 0.06, cross >= 40 dB — drift past them is a regression
signal, not noise. A future round with real datasets calibrates the same
harness against the published DTU/TnT tables.

The gate runs the FLAGSHIP pallas backend by default (QGATE_BACKEND
overrides) and cross-checks the trained model's test render against the
tiled XLA backend (>= 40 dB agreement: the kernels that ship are the
kernels that gate). `--soak` compresses the full 30K reference schedule
into the gate: small random init (capacity growth events), >= 2 opacity
resets, SH ramp to degree 3, densification to 80% — the long-schedule
integration soak for the recompile boundaries.

Usage:  python scripts/quality_gate.py [out_dir] [iters] [res] [--soak]
Prints one JSON line with the measured numbers and pass/fail.
"""

import json
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_shell(n_gt=4000, seed=0):
    rng = np.random.default_rng(seed)
    theta = rng.uniform(0, np.pi, n_gt)
    phi = rng.uniform(0, 2 * np.pi, n_gt)
    rr = 0.8 + 0.1 * np.sin(4 * theta) * np.cos(3 * phi)
    xyz = np.stack([rr * np.sin(theta) * np.cos(phi),
                    rr * np.cos(theta),
                    rr * np.sin(theta) * np.sin(phi)], -1).astype(np.float32)
    rgb = (0.5 + 0.45 * np.stack([np.sin(3 * theta), np.cos(2 * phi),
                                  np.sin(theta + phi)], -1)).astype(np.float32)
    scaling = np.full((n_gt, 2), 0.035, np.float32)
    rotation = rng.normal(size=(n_gt, 4)).astype(np.float32)
    opacity = rng.uniform(0.75, 0.95, (n_gt,)).astype(np.float32)
    return xyz, rgb, scaling, rotation, opacity


def shell_surface_points(n=20000, seed=3):
    """Dense exact samples of the generating surface r(theta, phi)."""
    rng = np.random.default_rng(seed)
    theta = np.arccos(rng.uniform(-1, 1, n))
    phi = rng.uniform(0, 2 * np.pi, n)
    rr = 0.8 + 0.1 * np.sin(4 * theta) * np.cos(3 * phi)
    return np.stack([rr * np.sin(theta) * np.cos(phi),
                     rr * np.cos(theta),
                     rr * np.sin(theta) * np.sin(phi)], -1)


def main(out_dir=None, iters=2000, res=128, soak=False):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    import tpu2dgs
    from tpu2dgs.core import sh as sh_lib
    from tpu2dgs.cli import metrics as cli_metrics
    from tpu2dgs.cli import render as cli_render
    from tpu2dgs.cli import train as cli_train
    from tpu2dgs.eval import geometry
    from tpu2dgs.model.splats import read_ply_vertices
    from tpu2dgs.raster.api import RasterSettings, render as render_op

    tpu2dgs.enable_compilation_cache()
    tmp = None
    if out_dir is None:
        tmp = tempfile.mkdtemp(prefix="qgate_")
        out_dir = tmp
    src = os.path.join(out_dir, "scene")
    out = os.path.join(out_dir, "model")
    os.makedirs(src, exist_ok=True)

    w = h = res
    xyz, rgb, scaling, rotation, opacity = make_shell()
    features = np.zeros((len(xyz), 16, 3), np.float32)
    features[:, 0] = (rgb - 0.5) / float(sh_lib.C0)
    gt = (jnp.asarray(xyz), jnp.asarray(scaling), jnp.asarray(rotation),
          jnp.asarray(opacity), jnp.asarray(features))
    st = RasterSettings(width=w, height=h, sh_degree=0, backend="tiled",
                        bin_capacity=1024, tile_capacity=512)

    # Orbit cameras -> Blender-format dataset (train + held-out test).
    frames = []
    n_views = 24
    render_jit = jax.jit(
        lambda cam: render_op(cam, st, *gt, jnp.zeros(3))["render"])
    from tpu2dgs.core import cameras as C
    for i in range(n_views):
        a = 2 * np.pi * i / n_views
        el = 0.35 * np.sin(2 * a)
        fwd_gl = np.array([np.cos(el) * np.sin(a), np.sin(el),
                           np.cos(el) * np.cos(a)])
        pos = 2.6 * fwd_gl
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd_gl)
        right /= np.linalg.norm(right)
        c2w = np.eye(4)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = (
            right, np.cross(fwd_gl, right), fwd_gl, pos)
        gl = c2w.copy()
        gl[:3, 1:3] *= -1
        w2c = np.linalg.inv(gl)
        cam = C.Camera(uid=i, image_name=f"r_{i}", R=w2c[:3, :3].T,
                       T=w2c[:3, 3], fovx=0.9, fovy=0.9, width=w, height=h)
        if i == 1:
            test_cam = cam  # first held-out view: backend cross-check
        img = np.asarray(render_jit(cam.arrays()))
        Image.fromarray(
            (np.clip(img.transpose(1, 2, 0), 0, 1) * 255).astype(np.uint8)
        ).save(os.path.join(src, f"r_{i}.png"))
        frames.append({"file_path": f"r_{i}",
                       "transform_matrix": c2w.tolist()})
    with open(os.path.join(src, "transforms_train.json"), "w") as f:
        json.dump({"camera_angle_x": 0.9, "frames": frames[::2]}, f)
    with open(os.path.join(src, "transforms_test.json"), "w") as f:
        json.dump({"camera_angle_x": 0.9, "frames": frames[1::2]}, f)

    # The real pipeline: train (densify ON) -> render + mesh -> metrics.
    backend = os.environ.get("QGATE_BACKEND", "pallas")
    schedule = (
        # Compressed 30K schedule: tiny random init so densification must
        # grow capacity repeatedly, >= 2 opacity resets inside the densify
        # window, SH ramp to 3 (increments at 1000/2000/3000).
        ["--opacity_reset_interval", str(max(iters // 3, 200)),
         "--num_init_points", "1500"]
        if soak else
        ["--opacity_reset_interval", "100000"])
    cli_train.main([
        "-s", src, "-m", out, "--eval", "--iterations", str(iters),
        "--save_iterations", str(iters), "--test_iterations", str(iters),
        "--densify_from_iter", "100", "--densify_until_iter",
        str(int(iters * 0.8)), "--densification_interval", "50",
        "--bin_capacity", "1024", "--tile_capacity", "512",
        "--backend", backend,
        "--quiet", "--max_capacity", "131072",
    ] + schedule)
    cli_render.main([
        "-m", out, "--quiet", "--skip_train",
        "--voxel_size", "0.02", "--sdf_trunc", "0.06", "--depth_trunc", "5.0",
        "--num_cluster", "1",
    ])
    cli_metrics.main(["-m", out, "--no_lpips"])

    with open(os.path.join(out, "results.json")) as f:
        results = json.load(f)
    psnr = float(results[f"ours_{iters}"]["PSNR"])
    ssim = float(results[f"ours_{iters}"]["SSIM"])

    # Chamfer of the fused mesh against the exact generating surface.
    mesh_path = os.path.join(out, "train", f"ours_{iters}", "fuse_post.ply")
    vv = read_ply_vertices(mesh_path)
    verts = np.stack([vv["x"], vv["y"], vv["z"]], -1).astype(np.float64)
    gt_pts = shell_surface_points()
    # mesh vertices are dense enough at voxel 0.02; bidirectional mean
    _, _, chamfer = geometry.chamfer_distance(verts, gt_pts)

    # Backend cross-check at gate scale: the trained model must render the
    # same images through the pallas kernels and the tiled XLA backend
    # (ulp-level blend/termination flips bound the difference; >= 40 dB
    # means "the kernels that ship are the kernels that gated").
    from tpu2dgs.model import splats as splats_lib
    trained = splats_lib.load_ply(os.path.join(
        out, "point_cloud", f"iteration_{iters}", "point_cloud.ply"))
    tp = trained.params
    targs = (tp.xyz, jnp.exp(tp.scaling), tp.rotation,
             jax.nn.sigmoid(tp.opacity[:, 0]), splats_lib.features(tp))
    cross = {}
    cam_arrays = test_cam.arrays()
    # Caps sized to THIS model's measured demand: under truncation the
    # backends' tile lists legitimately differ (exact-coverage vs AABB
    # selection — measured 32.9 dB at fixed 4096 caps on a 24K-splat
    # model), so the cross-check must compare untruncated renders.
    def _retrying(fn, tries=2):
        # The remote-TPU compile tunnel occasionally drops a request
        # (HTTP 500 / helper SIGTERM — infrastructure, not code); one
        # retry keeps a 25-minute gate run from dying at the last step.
        for attempt in range(tries):
            try:
                return fn()
            except Exception:
                if attempt + 1 == tries:
                    raise
                import time as _t
                _t.sleep(10)

    # The tiled backend's AABB hit counts exceed pallas's exact-coverage
    # counts, so take the max of both backends' demand probes.
    tile_d = bin_d = col_d = 128.0
    for be in ("pallas", "tiled"):
        dp = _retrying(lambda be=be: render_op(
            cam_arrays, RasterSettings(width=w, height=h, sh_degree=3,
                                       backend=be, bin_capacity=16384,
                                       tile_capacity=8192,
                                       col_capacity=61440),
            *targs, jnp.zeros(3), live=trained.live))
        tile_d = max(tile_d, float(dp["tile_count_max"]))
        bin_d = max(bin_d, float(dp["bin_count_max"]))
        col_d = max(col_d, float(dp.get("col_count_max", 128.0)))
    r128 = lambda x: max(128, -(-int(float(x)) // 128) * 128)
    for be in ("pallas", "tiled"):
        sx = RasterSettings(width=w, height=h, sh_degree=3, backend=be,
                            bin_capacity=r128(bin_d),
                            tile_capacity=r128(tile_d),
                            col_capacity=min(r128(col_d), 61440))
        cross[be] = _retrying(lambda sx=sx: render_op(
            cam_arrays, sx, *targs, jnp.zeros(3),
            live=trained.live)["render"])
    err = float(jnp.mean((jnp.clip(cross["pallas"], 0, 1)
                          - jnp.clip(cross["tiled"], 0, 1)) ** 2))
    cross_psnr = float(-10.0 * np.log10(max(err, 1e-12)))

    final_points = int(trained.num_live())
    report = {
        "metric": "synthetic_quality_gate",
        "backend": backend,
        "psnr_db": round(psnr, 2),
        "ssim": round(ssim, 4),
        "chamfer": round(float(chamfer), 4),
        "mesh_vertices": int(len(verts)),
        "backend_cross_psnr_db": round(cross_psnr, 2),
        "final_points": final_points,
        "thresholds": {"psnr_db": 19.0, "chamfer": 0.06,
                       "backend_cross_psnr_db": 40.0},
        "pass": bool(psnr >= 19.0 and chamfer <= 0.06
                     and cross_psnr >= 40.0),
    }
    if soak:
        # >= 2 capacity growths past the 2048 init capacity require
        # live > 0.9 * 4096: final_points proves the growth path ran.
        # Chamfer threshold is soak-calibrated: the compressed schedule
        # (1500-point init, 2 opacity resets, SH ramp) measured 0.0917 at
        # 3500 iters on v5e (vs 0.045 for the standard 100K-init gate) —
        # geometry gets fewer settled iterations; the soak gates the
        # SCHEDULE machinery, the standard gate gates quality.
        report["soak"] = True
        report["thresholds"]["final_points"] = 6000
        report["thresholds"]["chamfer"] = 0.12
        report["pass"] = bool(psnr >= 19.0 and chamfer <= 0.12
                              and cross_psnr >= 40.0
                              and final_points >= 6000)
    print(json.dumps(report), flush=True)
    if tmp is not None:
        shutil.rmtree(tmp, ignore_errors=True)
    return report


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "--soak"]
    main(*(argv[0:1] or [None]),
         *(int(a) for a in argv[1:3]),
         soak="--soak" in sys.argv)
