"""Diagnose TPU-compiled vs oracle differences per output channel.

Also cross-checks the binning (tile_pos/counts) between compiled and
interpret select kernels on the same device, to separate selection bugs
from blend-kernel numerics.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from tests.test_tiled import _cam, _random_scene, _settings, KEYS  # noqa
from tpu2dgs.raster.api import render  # noqa: E402
from tpu2dgs.raster import pallas_backend as pb  # noqa: E402
from tpu2dgs.raster import preprocess as pre  # noqa: E402


def main():
    import tpu2dgs
    tpu2dgs.enable_compilation_cache()

    w, h = 150, 90
    cam = _cam(w, h)
    scene = _random_scene(n=120, seed=21)
    bg = jnp.array([0.15, 0.05, 0.3])

    out_o = render(cam, _settings(w, h, "oracle"), *scene, bg)
    out_p = render(
        cam, _settings(w, h, "pallas", bin_capacity=256, tile_capacity=128),
        *scene, bg)
    for k in KEYS:
        a = np.asarray(out_p[k], np.float64)
        b = np.asarray(out_o[k], np.float64)
        d = np.abs(a - b)
        print(f"{k:16s} maxabs={d.max():.3e} mean={d.mean():.3e} "
              f"n_over_tol={(d > 2e-4).sum()}", flush=True)

    # Binning cross-check: compiled vs interpret select kernels.
    settings = _settings(w, h, "pallas", bin_capacity=256, tile_capacity=128)
    splats = pre.preprocess(*scene[:5], cam, w, h, settings.sh_degree)
    nbx = -(-w // pb.BX)
    nty = -(-h // pb.BY)
    n = scene[0].shape[0]

    from tpu2dgs.raster import binning

    comp = jax.jit(lambda s: binning.compact_visible(s, n))(splats)
    rec_c = jax.jit(lambda s: pb.pack_records(s)[comp.perm])(splats)
    n_vis = jnp.minimum(comp.num_visible, n)

    def bin_fn(rc, interpret):
        return pb._bin_records(
            comp.x0, comp.x1, comp.y0, comp.y1, n_vis, rc, nbx, nty,
            256, 128, 0, interpret=interpret)

    bc = jax.jit(lambda rc: bin_fn(rc, False))(rec_c)
    bi = jax.jit(lambda rc: bin_fn(rc, True))(rec_c)
    for name, x, y in [("rec3", bc[0], bi[0]), ("counts", bc[1], bi[1])]:
        same = np.array_equal(np.asarray(x), np.asarray(y))
        print(f"binning {name}: compiled==interpret -> {same}", flush=True)
        if not same:
            dx = np.asarray(x) != np.asarray(y)
            print("  ndiff:", dx.sum(), flush=True)

    # Blend kernel cross-check on IDENTICAL binning inputs.
    rec3 = bc[0]
    capk = rec3.shape[2]
    counts = jnp.minimum(bc[1], capk).astype(jnp.int32)
    row0 = jnp.zeros((1,), jnp.int32)
    oc = jax.jit(lambda r: pb._blend_call(
        r, counts, row0, nty=nty, capk=capk, interpret=False))(rec3)
    oi = jax.jit(lambda r: pb._blend_call(
        r, counts, row0, nty=nty, capk=capk, interpret=True))(rec3)
    d = np.abs(np.asarray(oc, np.float64) - np.asarray(oi, np.float64))
    print(f"blend compiled-vs-interpret maxabs={d.max():.3e}", flush=True)
    for ch in range(13):
        print(f"  ch{ch}: {d[:, ch].max():.3e}", flush=True)


if __name__ == "__main__":
    main()
