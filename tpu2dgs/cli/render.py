"""`tpu2dgs-render` — render eval sets + extract meshes.

Flag-compatible with reference render.py:28-107: loads the trained PLY at
--iteration (default: latest), writes renders/, gt/, vis/ for train and
test sets, then extracts a bounded or --unbounded TSDF mesh.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    from tpu2dgs.cli import config as cfg_lib

    parser = argparse.ArgumentParser(description="tpu2dgs rendering")
    cfg_lib.add_group(parser, cfg_lib.ModelParams, sentinel=True)
    cfg_lib.add_group(parser, cfg_lib.PipelineParams)
    cfg_lib.add_group(parser, cfg_lib.RasterParams)
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--skip_mesh", action="store_true")
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--render_path", action="store_true")
    parser.add_argument("--voxel_size", default=-1.0, type=float)
    parser.add_argument("--depth_trunc", default=-1.0, type=float)
    parser.add_argument("--sdf_trunc", default=-1.0, type=float)
    parser.add_argument("--num_cluster", default=50, type=int)
    parser.add_argument("--cull_views", default=0, type=int,
                        help="cull mesh faces unseen by fewer than N "
                             "training views (0 = off, the reference "
                             "mainline's choice)")
    parser.add_argument("--cull_eps", default=0.01, type=float)
    parser.add_argument("--unbounded", action="store_true")
    parser.add_argument("--mesh_res", default=1024, type=int)
    return parser


def _save_u8(path: str, chw: np.ndarray) -> None:
    from PIL import Image

    arr = np.clip(np.asarray(chw).transpose(1, 2, 0), 0, 1)
    Image.fromarray((arr * 255).astype(np.uint8)).save(path)


def _save_depth_tiff(path: str, depth_hw: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(np.asarray(depth_hw, np.float32), mode="F").save(path)


def latest_iteration(model_path: str) -> int:
    base = os.path.join(model_path, "point_cloud")
    iters = [int(d.split("_")[-1]) for d in os.listdir(base)
             if d.startswith("iteration_")]
    return max(iters)


def main(argv=None):
    import tpu2dgs

    tpu2dgs.enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from tpu2dgs.cli import config as cfg_lib
    from tpu2dgs.data.scene import Scene
    from tpu2dgs.mesh.extract import (
        GaussianExtractor, post_process_mesh, write_mesh_ply,
    )
    from tpu2dgs.model import splats as splats_lib
    from tpu2dgs.raster.api import RasterSettings, render

    parser = build_parser()
    args = cfg_lib.get_combined_args(parser, argv)
    model_p = cfg_lib.extract(cfg_lib.ModelParams, args)
    pipe_p = cfg_lib.extract(cfg_lib.PipelineParams, args)
    raster_p = cfg_lib.extract(cfg_lib.RasterParams, args)

    it = args.iteration if args.iteration != -1 else latest_iteration(model_p.model_path)
    ply = os.path.join(model_p.model_path, "point_cloud",
                       f"iteration_{it}", "point_cloud.ply")
    model = splats_lib.load_ply(ply, sh_degree=model_p.sh_degree)
    print(f"Loaded {int(model.num_live())} splats from {ply}")

    scene = Scene.load(
        model_p.source_path, images_dir=model_p.images,
        resolution=model_p.resolution,
        white_background=model_p.white_background,
        eval_split=model_p.eval, shuffle=False,
    )
    cam0 = (scene.train_cameras + scene.test_cameras)[0]
    w, h = cam0.width, cam0.height
    bg = (jnp.ones(3) if model_p.white_background else jnp.zeros(3))
    settings = RasterSettings(
        width=w, height=h, sh_degree=model_p.sh_degree,
        depth_ratio=pipe_p.depth_ratio,
        backend=raster_p.backend, tile_px=raster_p.tile_px,
        coarse_tiles=raster_p.coarse_tiles,
        bin_capacity=raster_p.bin_capacity,
        tile_capacity=raster_p.tile_capacity, chunk=raster_p.chunk,
    )
    p = model.params

    @jax.jit
    def render_arrays(cam_arrays):
        return render(
            cam_arrays, settings, p.xyz, jnp.exp(p.scaling), p.rotation,
            jax.nn.sigmoid(p.opacity[:, 0]), splats_lib.features(p),
            bg, live=model.live,
            convert_shs_python=pipe_p.convert_SHs_python,
            compute_cov3d_python=pipe_p.compute_cov3D_python,
        )

    def render_fn(cam):
        return render_arrays(cam.arrays())

    def export_set(cameras, name):
        base = os.path.join(model_p.model_path, name, f"ours_{it}")
        rdir = os.path.join(base, "renders")
        gdir = os.path.join(base, "gt")
        vdir = os.path.join(base, "vis")
        for d in (rdir, gdir, vdir):
            os.makedirs(d, exist_ok=True)
        for i, cam in enumerate(cameras):
            out = render_fn(cam)
            _save_u8(os.path.join(rdir, f"{i:05d}.png"), out["render"])
            if cam.image is not None:
                _save_u8(os.path.join(gdir, f"{i:05d}.png"), cam.image)
            _save_depth_tiff(
                os.path.join(vdir, f"depth_{i:05d}.tiff"),
                np.asarray(out["surf_depth"])[0],
            )
        print(f"exported {len(cameras)} views to {base}")

    if not args.skip_train:
        export_set(scene.train_cameras, "train")
    if not args.skip_test and scene.test_cameras:
        export_set(scene.test_cameras, "test")

    if args.render_path:
        from tpu2dgs.data.paths import create_videos, generate_path, save_img_u8

        traj_dir = os.path.join(model_p.model_path, "traj", f"ours_{it}")
        os.makedirs(traj_dir, exist_ok=True)
        cam_traj = generate_path(scene.train_cameras, n_frames=240)
        for i, cam in enumerate(cam_traj):
            out = render_fn(cam)
            save_img_u8(np.asarray(out["render"]).transpose(1, 2, 0),
                        os.path.join(traj_dir, f"{i:05d}.png"))
        create_videos(traj_dir,
                      os.path.join(model_p.model_path,
                                   f"traj_{it}.mp4"))
        print(f"render path saved at {traj_dir}")

    if not args.skip_mesh:
        # Mesh fusion uses diffuse-only color: the reference forces
        # active_sh_degree = 0 before reconstruction so fused vertex
        # colors carry no view dependence (/root/reference/render.py:89-90).
        import dataclasses as _dc

        settings_d = _dc.replace(settings, sh_degree=0)

        @jax.jit
        def render_arrays_diffuse(cam_arrays):
            return render(
                cam_arrays, settings_d, p.xyz, jnp.exp(p.scaling),
                p.rotation, jax.nn.sigmoid(p.opacity[:, 0]),
                splats_lib.features(p), bg, live=model.live,
                convert_shs_python=pipe_p.convert_SHs_python,
                compute_cov3d_python=pipe_p.compute_cov3D_python,
            )

        ex = GaussianExtractor(lambda cam: render_arrays_diffuse(cam.arrays()))
        ex.reconstruction(scene.train_cameras)
        name = "fuse.ply"
        if args.unbounded:
            name = "fuse_unbounded.ply"
            verts, faces, colors = ex.extract_mesh_unbounded(
                resolution=args.mesh_res)
        else:
            depth_trunc = (ex.radius * 2.0) if args.depth_trunc < 0 else args.depth_trunc
            voxel_size = (depth_trunc / args.mesh_res) if args.voxel_size < 0 else args.voxel_size
            sdf_trunc = 5.0 * voxel_size if args.sdf_trunc < 0 else args.sdf_trunc
            verts, faces, colors = ex.extract_mesh_bounded(
                voxel_size=voxel_size, sdf_trunc=sdf_trunc,
                depth_trunc=depth_trunc)
        out_path = os.path.join(model_p.model_path, "train", f"ours_{it}", name)
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        write_mesh_ply(out_path, verts, faces, colors)
        print(f"mesh saved at {out_path}")
        if args.cull_views > 0:
            # optional visibility culling against the training views'
            # rendered depths (the reference's TnT cull_mesh, which its
            # mainline leaves disabled; mesh/cull.py)
            from tpu2dgs.mesh.cull import cull_mesh

            verts, faces, vkeep = cull_mesh(
                verts, faces, ex.cameras, ex.depthmaps,
                eps=args.cull_eps, min_views=args.cull_views)
            colors = colors[vkeep]
            print(f"culled to {len(verts)} vertices "
                  f"({args.cull_views}+ views)")
        verts, faces, colors = post_process_mesh(
            verts, faces, colors, num_cluster=args.num_cluster)
        write_mesh_ply(out_path.replace(".ply", "_post.ply"), verts, faces, colors)
        print(f"mesh post processed saved at {out_path.replace('.ply', '_post.ply')}")


if __name__ == "__main__":
    main()
