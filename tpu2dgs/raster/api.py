"""Renderer API — the TPU equivalent of the reference `render()` contract.

Mirrors /root/reference/gaussian_renderer/__init__.py:19-158: same output
dictionary (render, rend_alpha, rend_normal, rend_dist, surf_depth,
surf_normal, radii, visibility_filter) with CHW image layouts, same allmap
decoding (expected-depth normalization, view->world normal rotation,
depth_ratio mixing, depth-to-normal pseudo surface normals). Instead of the
reference's `screenspace_points.retain_grad()` side channel, densification
gradients are exposed functionally: pass `mean2d_offset` (zeros) and
differentiate w.r.t. it.

Backends: "oracle" (O(N*P) jnp spec), "tiled" (binned XLA), "pallas"
(fused TPU kernels). All satisfy the same function signature and are tested
allclose against the oracle.
"""

from __future__ import annotations

import dataclasses
import types
from typing import Optional

import jax.numpy as jnp
from jax import lax

from tpu2dgs.core.cameras import CameraArrays, depth_to_normal
from tpu2dgs.raster import preprocess as pre


@dataclasses.dataclass(frozen=True)
class RasterSettings:
    """Static rasterization configuration (hashable: safe as a jit static)."""

    width: int
    height: int
    sh_degree: int = 3
    depth_ratio: float = 0.0
    backend: str = "tiled"
    scale_modifier: float = 1.0
    # Tiled/pallas backend knobs:
    tile_px: int = 16            # fine tile edge in pixels
    coarse_tiles: int = 4        # fine tiles per coarse bin edge
    bin_capacity: int = 4096     # max splats per coarse bin
    tile_capacity: int = 1024    # max splats per fine tile
    col_capacity: int = 32768    # pallas binning L1: max splats per
                                 # BX-wide screen column (overflow drops
                                 # the DEEPEST candidates; watch
                                 # col_overflow_frac in the out dict)
    vis_capacity: int = 0        # depth-compaction prefix size (0 = all N);
                                 # binning runs over the front-most K visible.
                                 # Under splat sharding the budget is split
                                 # per device (~K/D front-most of EACH
                                 # shard's splats, not the global front-most
                                 # K): a shard holding a disproportionate
                                 # share of near splats can drop survivors —
                                 # _aux_vis_overflow flags it
    grad_pack_capacity: int = 0  # pallas backward: GLOBAL packed gradient
                                 # rows (0 = 16 * tile_capacity * image
                                 # tile columns); overflowing tails are
                                 # dropped, counted by
                                 # grad_pack_overflow_frac
    xfer_capacity: int = 0       # splat sharding: strip-routed survivor
                                 # exchange — max records per
                                 # (owner -> strip) all_to_all message.
                                 # 0 = all-gather every survivor to every
                                 # device (exact, ~96 B/row x K received
                                 # per device + a replicated K-row merge);
                                 # >0 routes records only to strips their
                                 # boxes intersect (~D-fold less ICI volume
                                 # and a K/D-row per-strip merge; messages
                                 # past the cap drop their DEEPEST rows,
                                 # counted by xfer_overflow_frac and healed
                                 # by the Trainer's adaptive caps)
    chunk: int = 32              # splats composited per vector step
    row_balance: str = "work"    # multi-chip tile-row assignment (pallas):
                                 # "work" = contiguous per-device windows at
                                 # work-quantile boundaries (traced — no
                                 # recompile between cameras; measured
                                 # max/mean strip work 2.9x -> ~1.1x on the
                                 # bench pileup at D=8); "static" = fixed
                                 # equal-height strips
    debug: bool = False          # pallas: interpreter mode ("sanitizer",
                                 # the reference rasterizer's debug flag)

    def __post_init__(self):
        if self.row_balance not in ("work", "static"):
            # A typo here would silently fall back to static strips and
            # lose the load-balance win the flag exists for.
            raise ValueError(
                f"row_balance must be 'work' or 'static', "
                f"got {self.row_balance!r}")
        if self.backend not in ("oracle", "tiled", "pallas"):
            raise ValueError(f"unknown raster backend {self.backend!r}")


def render(
    cam: CameraArrays,
    settings: RasterSettings,
    xyz: jnp.ndarray,
    scaling: jnp.ndarray,
    rotation: jnp.ndarray,
    opacity: jnp.ndarray,
    features: jnp.ndarray,
    bg_color: jnp.ndarray,
    mean2d_offset: Optional[jnp.ndarray] = None,
    live: Optional[jnp.ndarray] = None,
    override_color: Optional[jnp.ndarray] = None,
    mesh=None,
    shard_splats: bool = False,
    convert_shs_python: bool = False,
    compute_cov3d_python: bool = False,
    axes_override=None,
):
    """Render one view. Returns the reference-contract dict.

    With `mesh` (a jax.sharding.Mesh with a "rows" axis), the tiled backend
    shards image tile rows across devices (tpu2dgs/parallel/sharded.py).
    With `shard_splats=True` (pallas backend + mesh), the splat parameter
    arrays are ALSO sharded over the mesh — gaussian/model parallelism:
    per-splat preprocessing and depth compaction run on 1/D of the splats
    per device, visible survivors are all-gathered, and tile-row strips
    blend as usual (parallel/sharded.rasterize_splat_sharded).

    `convert_shs_python` / `compute_cov3d_python` mirror the reference
    PipelineParams (gaussian_renderer/__init__.py:57-95): SH->RGB and the
    splat tangent axes are evaluated OUTSIDE preprocess and fed back through
    `override_color` / `axes_override`. On TPU both paths are XLA either
    way; the flags exist for contract parity and for callers that supply a
    precomputed basis (the reference's cov3D_precomp)."""
    w, h = settings.width, settings.height
    opacity = opacity.reshape(-1)

    if compute_cov3d_python and axes_override is None:
        from tpu2dgs.core import transforms

        # preprocess applies scale_modifier to override axes itself
        # (mirroring the reference passing scaling_modifier into the
        # covariance precompute, gaussian_renderer/__init__.py:60).
        axes_override = transforms.splat_axes(scaling, rotation)
    if convert_shs_python and override_color is None:
        from tpu2dgs.core import sh as sh_lib
        from tpu2dgs.core.transforms import normalize

        dirs = normalize(xyz - cam.cam_center[None, :])
        shs = jnp.swapaxes(features, -1, -2)
        override_color = jnp.maximum(
            sh_lib.eval_sh(settings.sh_degree, shs, dirs) + 0.5, 0.0)

    if shard_splats and mesh is not None:
        if settings.backend != "pallas":
            raise ValueError("shard_splats requires the pallas backend")
        from tpu2dgs.parallel.sharded import rasterize_splat_sharded

        image, allmap, radius, mean2d = rasterize_splat_sharded(
            cam, settings, xyz, scaling, rotation, opacity, features,
            bg_color, mesh, mean2d_offset=mean2d_offset, live=live,
            override_color=override_color, axes_override=axes_override)
        aux = {k: allmap.pop(k) for k in list(allmap)
               if k.startswith("_aux_")}
        # decode_outputs reads only .radius / .mean2d of its splats arg
        shim = types.SimpleNamespace(radius=radius, mean2d=mean2d)
        out = decode_outputs(cam, settings, shim, image, allmap)
        for k, v in aux.items():
            out[k.removeprefix("_aux_")] = v
        return out

    splats = pre.preprocess(
        xyz,
        scaling,
        rotation,
        opacity,
        features,
        cam,
        w,
        h,
        settings.sh_degree,
        mean2d_offset=mean2d_offset,
        scale_modifier=settings.scale_modifier,
        live=live,
        override_color=override_color,
        axes_override=axes_override,
    )

    if settings.backend == "oracle":
        from tpu2dgs.raster.oracle import rasterize_oracle

        image, allmap = rasterize_oracle(splats, w, h, bg_color, chunk=settings.chunk)
    elif settings.backend == "tiled":
        if mesh is not None:
            from tpu2dgs.parallel.sharded import rasterize_sharded

            image, allmap = rasterize_sharded(splats, settings, bg_color, mesh)
        else:
            from tpu2dgs.raster.tiled import rasterize_tiled

            image, allmap = rasterize_tiled(splats, settings, bg_color)
    elif settings.backend == "pallas":
        if mesh is not None:
            from tpu2dgs.parallel.sharded import rasterize_sharded

            image, allmap = rasterize_sharded(splats, settings, bg_color, mesh)
        else:
            from tpu2dgs.raster.pallas_backend import rasterize_pallas

            image, allmap = rasterize_pallas(
                splats, settings, bg_color, interpret=settings.debug
            )
    else:
        raise ValueError(f"unknown raster backend {settings.backend!r}")

    aux = {k: allmap.pop(k) for k in list(allmap) if k.startswith("_aux_")}
    out = decode_outputs(cam, settings, splats, image, allmap)
    for k, v in aux.items():
        out[k.removeprefix("_aux_")] = v
    return out


def mark_visible(xyz: jnp.ndarray, cam: CameraArrays,
                 near: float = 0.2) -> jnp.ndarray:
    """(N,) bool frustum visibility of positions (the reference
    GaussianRasterizer.markVisible contract: view-frustum check given the
    view matrix; used by the viewer for culling)."""
    from tpu2dgs.core.transforms import homogenize

    p_view = homogenize(xyz) @ cam.world_view
    z = p_view[:, 2]
    clip = homogenize(xyz) @ cam.full_proj
    w = jnp.where(jnp.abs(clip[:, 3]) > 1e-12, clip[:, 3], 1.0)
    ndc = clip[:, :2] / w[:, None]
    margin = 1.3  # the reference culls conservatively beyond ~1.3x frustum
    return (z > near) & (jnp.abs(ndc[:, 0]) < margin) & (jnp.abs(ndc[:, 1]) < margin)


def decode_outputs(cam: CameraArrays, settings: RasterSettings, splats, image, allmap):
    """allmap -> reference render-pkg dict (gaussian_renderer/__init__.py:110-156)."""
    w, h = settings.width, settings.height

    alpha = allmap["alpha"]  # (H,W)
    # View -> world normal rotation (left unnormalized: magnitude = alpha weight).
    rend_normal = allmap["normal"] @ cam.world_view[:3, :3].T  # (H,W,3)

    depth_median = allmap["depth_median"]
    safe_alpha = jnp.where(alpha > 0.0, alpha, 1.0)
    depth_expected = jnp.where(alpha > 0.0, allmap["depth_expected"] / safe_alpha, 0.0)

    surf_depth = depth_expected * (1.0 - settings.depth_ratio) + settings.depth_ratio * depth_median

    surf_normal = depth_to_normal(cam, surf_depth, w, h)  # (H,W,3) world
    surf_normal = surf_normal * lax.stop_gradient(alpha)[..., None]

    chw = lambda x: jnp.transpose(x, (2, 0, 1))
    return {
        "render": chw(image),                      # (3,H,W)
        "rend_alpha": alpha[None],                 # (1,H,W)
        "rend_normal": chw(rend_normal),           # (3,H,W)
        "rend_dist": allmap["distortion"][None],   # (1,H,W)
        "surf_depth": surf_depth[None],            # (1,H,W)
        "surf_normal": chw(surf_normal),           # (3,H,W)
        "depth_expected": depth_expected[None],
        "depth_median": depth_median[None],
        "radii": splats.radius,                    # (N,) int32
        "visibility_filter": splats.radius > 0,    # (N,) bool
        "mean2d": splats.mean2d,                   # (N,2) projected centers
    }
