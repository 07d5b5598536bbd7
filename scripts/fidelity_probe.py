"""Capacity-truncation fidelity on BOTH workload regimes.

bench.py's fidelity_check covers the transparency pileup only; this probe
adds the trained-scene-like opaque shell (eval/synthetic.make_shell_scene)
so the claim "real scenes truncate far less at the same caps" is a
measurement, not an assertion. For each scene it renders the
capacity-bounded configs against a verified zero-overflow config and
reports PSNR + worst-pixel alpha error.

Usage: python scripts/fidelity_probe.py [W] [N_log2]
"""

import sys

import numpy as np
import jax.numpy as jnp

import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import tpu2dgs  # noqa: E402
from tpu2dgs.eval.synthetic import make_bench_scene, make_shell_scene  # noqa: E402
from tpu2dgs.raster.api import RasterSettings, render  # noqa: E402
from tpu2dgs.train import losses  # noqa: E402


def settings(w, h, tile_cap, bin_cap, col_cap, pack_cap):
    return RasterSettings(
        width=w, height=h, sh_degree=3, backend="pallas",
        bin_capacity=bin_cap, tile_capacity=tile_cap,
        col_capacity=col_cap, grad_pack_capacity=pack_cap)


def main():
    tpu2dgs.enable_compilation_cache()
    w = h = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    n = 1 << (int(sys.argv[2]) if len(sys.argv) > 2 else 17)
    bg = jnp.zeros(3, jnp.float32)

    for name, (cam, scene) in [("bench-pileup", make_bench_scene(w, h, n)),
                               ("shell", make_shell_scene(w, h, n))]:
        # zero-overflow reference for THIS scene: size caps off the
        # reported demand maxima (one probe render), then verify 0 overflow
        # (col cap 65536 is the VMEM ceiling for the L2 select's
        # double-buffered input block: 131072 OOMs scoped vmem)
        probe = render(cam, settings(w, h, 2048, 16384, 65536, 131072),
                       *scene, bg)
        tile_max = int(float(probe["tile_count_max"]))
        bin_max = int(float(probe["bin_count_max"]))
        col_max = int(float(probe["col_count_max"]))
        r = lambda x: -(-x // 128) * 128
        s_exact = settings(w, h, r(tile_max), r(bin_max), r(col_max),
                           r(16 * tile_max))
        o_exact = render(cam, s_exact, *scene, bg)
        for k in ("tile_overflow_frac", "bin_overflow_frac",
                  "col_overflow_frac"):
            assert float(o_exact[k]) == 0.0, (name, k, float(o_exact[k]))
        print(f"{name}: true demand tile={tile_max} bin={bin_max} "
              f"col={col_max}")
        for cap in (1024, 1792, 2048):
            o = render(cam, settings(w, h, cap, 8192, 65536, 0), *scene, bg)
            psnr = float(losses.psnr(jnp.clip(o["render"], 0, 1),
                                     jnp.clip(o_exact["render"], 0, 1)))
            amax = float(jnp.max(jnp.abs(
                o["rend_alpha"] - o_exact["rend_alpha"])))
            ovf = float(o["tile_overflow_frac"])
            print(f"  tile_cap {cap}: trunc PSNR {psnr:6.2f} dB, "
                  f"alpha maxdiff {amax:.4f}, tile overflow {ovf:.3f}")


if __name__ == "__main__":
    main()
