"""Shared synthetic bench scene (one definition for bench.py and the
profiling scripts — the numbers they print are only comparable if they
rasterize exactly the same workload)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tpu2dgs.core import cameras


def make_bench_scene(w: int = 800, h: int = 800, n: int = 1 << 17,
                     seed: int = 0):
    """The headline bench workload: a worst-case depth pileup of `n`
    random anisotropic surfels filling a 90-degree frustum.

    Returns (cam_arrays, (xyz, scaling, rotation, opacity, features))."""
    cam = cameras.Camera(
        uid=0, image_name="bench", R=np.eye(3), T=np.zeros(3),
        fovx=np.pi / 2, fovy=np.pi / 2, width=w, height=h,
    ).arrays()
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(-1.0, 1.0, (n, 3)) * [1, 1, 0.5] + [0, 0, 2.5]
    scene = tuple(
        jnp.asarray(a, jnp.float32)
        for a in (
            xyz,
            np.exp(rng.uniform(-5.0, -3.5, (n, 2))),
            rng.normal(size=(n, 4)),
            rng.uniform(0.2, 0.95, (n,)),
            rng.normal(size=(n, 16, 3)) * 0.3,
        )
    )
    return cam, scene
