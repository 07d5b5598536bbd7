"""Device-mesh parallel rendering: tile rows sharded across chips.

The reference is strictly single-GPU (SURVEY.md §2 "Parallelism" — no
distributed counterpart exists); this is the TPU-native scaling design:

  * image tile rows are sharded over a 1-D mesh axis via `shard_map`; each
    device bins and blends only its strip of the image (the rasterizer's
    dominant cost scales with pixels),
  * splat arrays stay replicated in the forward; `shard_map`'s transpose
    rule psums their cotangents over the mesh, which IS the splat-gradient
    all-reduce — no hand-written collective needed, and XLA overlaps it with
    the rest of the backward,
  * losses and everything downstream consume the row-sharded image under
    plain GSPMD (SSIM's 11x11 window halo is handled by the partitioner).

Strips are allocated in units of `coarse_tiles` tile rows so per-device
coarse bins stay aligned with the global bin grid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu2dgs.raster import tiled
from tpu2dgs.raster.preprocess import SplatScreen

ROWS_AXIS = "rows"


def make_mesh(n_devices: int | None = None, axis: str = ROWS_AXIS) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(devs[:n], (axis,))


def _strip_rows(height: int, tile_px: int, coarse_tiles: int, n_dev: int) -> int:
    """Tile rows per device, rounded up to a whole number of coarse-bin rows."""
    nty = -(-height // tile_px)
    per = -(-nty // n_dev)
    return -(-per // coarse_tiles) * coarse_tiles


def rasterize_sharded(
    splats: SplatScreen,
    settings,
    bg_color: jnp.ndarray,
    mesh: Mesh,
    axis: str = ROWS_AXIS,
):
    """Row-sharded rendering: each device rasterizes its strip of tile rows
    with the backend the settings select (tiled XLA or the fused Pallas
    kernels).

    Returns (image (H,W,3), allmap dict) — arrays laid out row-sharded over
    `axis` (callers inside jit see global shapes)."""
    w, h = settings.width, settings.height
    n_dev = mesh.shape[axis]

    if settings.backend == "pallas":
        from tpu2dgs.raster import pallas_backend as pb

        # strips in whole coarse-bin rows (4 tile rows of BY px)
        nty = -(-h // pb.BY)
        rows_per = -(-(-(-nty // n_dev)) // 4) * 4

        def strip_fn(splats, bg):
            idx = lax.axis_index(axis)
            img, allmap = pb.rasterize_pallas(
                splats, settings, bg, interpret=settings.debug,
                tile_row0=idx * rows_per, nty_local=rows_per,
            )
            allmap = {k: v for k, v in allmap.items()
                      if not k.startswith("_aux_")}
            return img, allmap

    else:
        rows_per = _strip_rows(
            h, settings.tile_px, settings.coarse_tiles, n_dev)

        def strip_fn(splats, bg):
            idx = lax.axis_index(axis)
            img, allmap = tiled.rasterize_rows(
                splats, settings, bg, idx * rows_per, rows_per
            )
            return img, allmap

    out_spec = P(axis)
    img, allmap = jax.shard_map(
        strip_fn,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=(out_spec, out_spec),
        # The strip offset derives from axis_index, which makes loop carries
        # "varying" over the mesh axis; skip the varying-manual-axes type
        # check rather than pcast-annotating every scan init in the
        # rasterizer (which also runs unsharded).
        check_vma=False,
    )(splats, bg_color)

    img = img[:h, :w]
    allmap = {k: v[:h, :w] for k, v in allmap.items()}
    return img, allmap
