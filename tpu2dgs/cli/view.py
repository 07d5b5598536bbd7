"""`tpu2dgs-view` — serve a trained model to the SIBR remote viewer.

Reference view.py:9-35: infinite accept/receive/render/send loop over the
network_gui TCP protocol.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpu2dgs.cli import config as cfg_lib
    from tpu2dgs.cli.render import latest_iteration
    from tpu2dgs.model import splats as splats_lib
    from tpu2dgs.raster.api import RasterSettings, render
    from tpu2dgs.viewer.modes import render_net_image
    from tpu2dgs.viewer.network_gui import NetworkGUI, image_to_bytes

    parser = argparse.ArgumentParser(description="tpu2dgs viewer server")
    cfg_lib.add_group(parser, cfg_lib.ModelParams, sentinel=True)
    cfg_lib.add_group(parser, cfg_lib.PipelineParams)
    cfg_lib.add_group(parser, cfg_lib.RasterParams)
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--ip", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    args = cfg_lib.get_combined_args(parser, argv)
    model_p = cfg_lib.extract(cfg_lib.ModelParams, args)
    raster_p = cfg_lib.extract(cfg_lib.RasterParams, args)
    pipe_p = cfg_lib.extract(cfg_lib.PipelineParams, args)

    import os

    it = args.iteration if args.iteration != -1 else latest_iteration(model_p.model_path)
    ply_path = os.path.join(model_p.model_path, "point_cloud",
                            f"iteration_{it}", "point_cloud.ply")
    model = splats_lib.load_ply(ply_path, sh_degree=model_p.sh_degree)
    p = model.params
    bg = jnp.ones(3) if model_p.white_background else jnp.zeros(3)
    render_items = ["RGB", "Alpha", "Normal", "Depth", "Edge", "Curvature"]

    gui = NetworkGUI(args.ip, args.port)
    gui.init()
    print(f"viewer server on {args.ip}:{args.port} "
          f"({int(model.num_live())} splats)")

    render_cache = {}

    def render_view(cam, w, h, scaling_modifier):
        key = (w, h)
        if key not in render_cache:
            settings = RasterSettings(
                width=w, height=h, sh_degree=model_p.sh_degree,
                depth_ratio=pipe_p.depth_ratio,
                backend=raster_p.backend, tile_px=raster_p.tile_px,
                coarse_tiles=raster_p.coarse_tiles,
                bin_capacity=raster_p.bin_capacity,
                tile_capacity=raster_p.tile_capacity, chunk=raster_p.chunk,
                scale_modifier=float(scaling_modifier),
            )

            @jax.jit
            def fn(cam_arrays):
                return render(
                    cam_arrays, settings, p.xyz, jnp.exp(p.scaling),
                    p.rotation, jax.nn.sigmoid(p.opacity[:, 0]),
                    splats_lib.features(p), bg, live=model.live,
                )

            render_cache[key] = fn
        return render_cache[key](cam)

    while True:
        if gui.conn is None:
            gui.try_connect(render_items)
        while gui.conn is not None:
            try:
                cam, (w, h), _, _, scaling_modifier, render_mode = gui.receive()
                image_bytes = None
                if cam is not None:
                    pkg = render_view(cam, w, h, scaling_modifier)
                    net_image = render_net_image(pkg, render_items, render_mode)
                    image_bytes = image_to_bytes(np.asarray(net_image))
                gui.send(image_bytes, model_p.source_path or "",
                         {"#": int(model.num_live())})
            except (ConnectionError, OSError):
                gui.disconnect()


if __name__ == "__main__":
    main()
