"""Four-way comparison: {oracle, pallas} x {cpu, tpu}.

Run first with JAX_PLATFORMS=cpu (saves /tmp/golden_cross.npz), then on
TPU (loads + reports who moved).
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from tests.test_tiled import _cam, _random_scene, _settings  # noqa
from tpu2dgs.raster.api import render  # noqa: E402
from tpu2dgs.raster import preprocess as pre  # noqa: E402

PATH = "/tmp/golden_cross.npz"


def main():
    import tpu2dgs
    tpu2dgs.enable_compilation_cache()
    w, h = 150, 90
    cam = _cam(w, h)
    scene = _random_scene(n=120, seed=21)
    bg = jnp.array([0.15, 0.05, 0.3])

    on_cpu = jax.devices()[0].platform == "cpu"
    out_o = render(cam, _settings(w, h, "oracle"), *scene, bg)
    ps = _settings(w, h, "pallas", bin_capacity=256, tile_capacity=128,
                   debug=on_cpu)  # debug => interpret mode (CPU)
    out_p = render(cam, ps, *scene, bg)
    splats = pre.preprocess(*scene[:5], cam, w, h, 3)

    cur = {
        "o_render": np.asarray(out_o["render"]),
        "p_render": np.asarray(out_p["render"]),
        "o_normal": np.asarray(out_o["rend_normal"]),
        "p_normal": np.asarray(out_p["rend_normal"]),
        "color": np.asarray(splats.color),
        "normal": np.asarray(splats.normal),
        "tmat": np.asarray(splats.tmat),
        "opacity": np.asarray(splats.opacity),
    }
    if on_cpu:
        np.savez(PATH, **cur)
        print("saved CPU golden", flush=True)
        return
    g = np.load(PATH)
    for k in cur:
        d = np.abs(cur[k].astype(np.float64) - g[k].astype(np.float64))
        print(f"{k:12s} tpu-vs-cpu maxabs={d.max():.3e}", flush=True)


if __name__ == "__main__":
    main()
