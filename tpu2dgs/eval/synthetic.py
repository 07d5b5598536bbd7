"""Shared synthetic bench scene (one definition for bench.py and the
profiling scripts — the numbers they print are only comparable if they
rasterize exactly the same workload)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tpu2dgs.core import cameras


def make_shell_scene(w: int = 800, h: int = 800, n: int = 1 << 17,
                     seed: int = 0):
    """Trained-scene-like workload: a textured opaque surfel SHELL.

    Post-densification real scenes are dominated by near-opaque tangent
    disks on surfaces (transmittance saturates within a few splats per
    ray); this builds that distribution analytically — positions on a
    bumpy sphere, disks oriented tangent to it, near-solid opacities, NN-
    density-matched scales — so capacity-fidelity and load-balance can be
    probed on the regime training actually produces, not only on
    make_bench_scene's transparency pileup. Same return contract as
    make_bench_scene: (cam_arrays, (xyz, scaling, rotation, opacity,
    features))."""
    rng = np.random.default_rng(seed)
    theta = rng.uniform(0, np.pi, n)
    phi = rng.uniform(0, 2 * np.pi, n)
    rr = 0.8 + 0.1 * np.sin(4 * theta) * np.cos(3 * phi)
    nrm = np.stack([np.sin(theta) * np.cos(phi),
                    np.cos(theta),
                    np.sin(theta) * np.sin(phi)], -1)
    xyz = (rr[:, None] * nrm).astype(np.float32)
    # Disk tangent to the sphere: quaternion rotating +z onto the radial
    # direction (half-angle form; degenerate antipodal rows get the 180
    # flip about x).
    z = np.array([0.0, 0.0, 1.0])
    c = nrm @ z  # cos(angle)
    ax = np.cross(np.broadcast_to(z, nrm.shape), nrm)
    s = np.linalg.norm(ax, axis=-1)
    half = np.sqrt(np.maximum(0.5 * (1.0 + c), 0.0))  # cos(angle/2)
    sin_half = np.sqrt(np.maximum(0.5 * (1.0 - c), 0.0))
    axn = ax / np.maximum(s, 1e-12)[:, None]
    quat = np.concatenate([half[:, None], axn * sin_half[:, None]], -1)
    quat[c < -1.0 + 1e-9] = [0.0, 1.0, 0.0, 0.0]
    # Scales matched to the surface density (area ~ 4*pi*r^2 over n disks)
    # with the log-spread densification produces.
    mean_r = np.sqrt(4 * np.pi * 0.8 ** 2 / n / np.pi)
    scaling = np.exp(
        np.log(mean_r) + rng.uniform(-0.7, 0.9, (n, 2))).astype(np.float32)
    opacity = rng.uniform(0.75, 0.99, n).astype(np.float32)
    feats = (rng.normal(size=(n, 16, 3)) * 0.25).astype(np.float32)
    feats[:, 0] = (0.5 + 0.45 * np.stack(
        [np.sin(3 * theta), np.cos(2 * phi), np.sin(theta + phi)],
        -1)) / 0.28209479177387814 - 1.0 / 0.28209479177387814 * 0.5

    a = 2 * np.pi * 0.13
    fwd = np.array([-np.sin(a), 0.12 * np.sin(3 * a), -np.cos(a)])
    fwd /= np.linalg.norm(fwd)
    pos = -2.2 * fwd
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    tu = np.cross(fwd, right)
    Rw2v = np.stack([right, tu, fwd])
    cam = cameras.Camera(
        uid=0, image_name="shell", R=Rw2v.T, T=-Rw2v @ pos,
        fovx=np.pi / 3, fovy=np.pi / 3, width=w, height=h,
    ).arrays()
    scene = tuple(jnp.asarray(x, jnp.float32)
                  for x in (xyz, scaling, quat, opacity, feats))
    return cam, scene


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
