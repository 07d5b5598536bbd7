"""tpu2dgs — TPU-native 2D Gaussian (surfel) Splatting in JAX/XLA/Pallas.

A from-scratch, TPU-first framework with the capabilities of
hbb1/2d-gaussian-splatting (SIGGRAPH 2024): training geometrically accurate
radiance fields from posed images with 2D oriented Gaussian surfels, a
differentiable tile-based rasterizer (RGB / alpha / depth / normal /
depth-distortion outputs), adaptive densification, TSDF mesh extraction and
the full evaluation harness.

Layer map (mirrors SURVEY.md §1, re-designed TPU-first):
  core/      camera models, spherical harmonics, quaternion/surfel transforms
  raster/    differentiable surfel rasterizer: pure-jnp oracle, tiled XLA
             implementation, Pallas TPU kernels, binning
  model/     padded static-shape splat parameter store, Adam, densification
  data/      COLMAP / Blender / PLY loaders, scene assembly
  train/     losses and the jitted training step + host loop
  mesh/      bounded & unbounded (contracted) TSDF fusion + marching cubes
  parallel/  device-mesh sharding (tile / splat parallel), multi-host
  eval/      PSNR/SSIM/LPIPS metrics and benchmark harnesses
  cli/       train / render / metrics / view entry points
"""

__version__ = "0.1.0"

# TPU MXU matmuls default to 1-pass bf16-input products; the geometry
# pipeline (splat->pixel homographies, camera transforms, the oracle's
# blend einsums) is built from tiny (N,3)@(3,3)-shaped contractions where
# that truncation moves tmat by ~1e-3 relative — enough to push compiled
# TPU renders ~4e-3 away from the CPU/interpret goldens. Full-f32 passes
# cost nothing at these shapes (the hot FLOPs live in the Pallas kernels),
# so make f32-accurate matmuls the framework default — but only when the
# host application hasn't configured a precision itself (a user-set value,
# including via JAX_DEFAULT_MATMUL_PRECISION, is respected). Kernels that
# rely on bf16-exact small-integer products (select_kernel) pin
# Precision.DEFAULT explicitly either way.
import jax as _jax

if _jax.config.jax_default_matmul_precision is None:
    _jax.config.update("jax_default_matmul_precision", "highest")


def enable_compilation_cache(path: str | None = None) -> None:
    """Point JAX at a persistent compilation cache. The fused Pallas
    fwd+bwd programs take minutes to compile cold on TPU; cached reloads are
    seconds. Called by the CLIs and bench.py."""
    import os

    import jax

    cache = path or os.environ.get(
        "TPU2DGS_CACHE", os.path.expanduser("~/.cache/tpu2dgs_jax")
    )
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
