"""Time the loss stack (SSIM/L1/normal/distortion) fwd+bwd at bench shape."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import tpu2dgs  # noqa: E402
from tpu2dgs.train import losses  # noqa: E402
from profile_raster import chain_timed  # noqa: E402


def main():
    tpu2dgs.enable_compilation_cache()
    w = h = 800
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (3, h, w))
    gt = jax.random.uniform(jax.random.PRNGKey(1), (3, h, w))
    nrm = jax.random.normal(jax.random.PRNGKey(2), (3, h, w))
    srf = jax.random.normal(jax.random.PRNGKey(3), (3, h, w))
    dist = jax.random.uniform(jax.random.PRNGKey(4), (1, h, w))

    chain_timed("photometric fwd", lambda a, b: losses.photometric_loss(
        a, b, 0.2)[0], (img, gt))
    chain_timed("photometric fwd+bwd", lambda a, b: jnp.sum(jax.grad(
        lambda x: losses.photometric_loss(x, b, 0.2)[0])(a)), (img, gt))
    chain_timed("ssim only fwd+bwd", lambda a, b: jnp.sum(jax.grad(
        lambda x: losses.ssim(x, b))(a)), (img, gt))
    chain_timed("normal+dist fwd+bwd", lambda a, b, c: jnp.sum(jax.grad(
        lambda x: losses.normal_consistency_loss(x, b)
        + losses.distortion_loss(c))(a)), (nrm, srf, dist))


if __name__ == "__main__":
    main()
