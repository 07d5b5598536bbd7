"""Device-mesh parallel rendering: tile-row sharding and splat sharding.

The reference is strictly single-GPU (SURVEY.md §2 "Parallelism" — no
distributed counterpart exists); these are the TPU-native scaling designs:

`rasterize_sharded` — tile-row (data/pixel) parallelism:
  * image tile rows are sharded over a 1-D mesh axis via `shard_map`; each
    device bins and blends only its strip of the image (the rasterizer's
    dominant cost scales with pixels),
  * splat arrays stay replicated in the forward; `shard_map`'s transpose
    rule psums their cotangents over the mesh, which IS the splat-gradient
    all-reduce — no hand-written collective needed, and XLA overlaps it with
    the rest of the backward,
  * losses and everything downstream consume the row-sharded image under
    plain GSPMD (SSIM's 11x11 window halo is handled by the partitioner).

`rasterize_splat_sharded` — gaussian (model) parallelism on the SAME axis:
  * splat parameter arrays are sharded over the mesh (1/D params, grads
    and Adam state per device — the scaling mode for 10M+ splat scenes),
  * each device preprocesses + depth-compacts only ITS 1/D splats (the
    per-splat pipeline that tile-row sharding replicates),
  * the compacted VISIBLE survivors (records + screen AABBs + depth) are
    all-gathered over ICI — k_vis/D rows per device, not N — and merged
    into the global front-to-back order by a (depth, global-id) sort,
  * each device then bins + blends its tile-row strip against the merged
    survivors; the all_gather's transpose (psum-scatter) routes record
    gradients back to each splat's owner automatically.

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


def shard_model_state(model, adam, mesh: Mesh, axis: str = ROWS_AXIS):
    """Place model + Adam state SHARDED over the mesh: every per-splat
    array (leading capacity axis) gets NamedSharding(P(axis)); scalars are
    replicated. This is what makes gaussian parallelism a MEMORY-scaling
    mode, not just a compute one: params, gradients, Adam moments, and the
    densification stats all live at 1/D per device. The train step's
    shard_map consumes them with in_specs P(axis) (zero resharding), the
    Adam update is elementwise (GSPMD keeps it sharded), and densification
    uses the segment-local formulation (model/densify.py segments=D)."""
    split = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def place(a):
        a = jnp.asarray(a)
        return jax.device_put(a, split if a.ndim >= 1 else rep)

    return jax.tree.map(place, model), jax.tree.map(place, adam)


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
            aux = {k: lax.pmax(v, axis) for k, v in allmap.items()
                   if k.startswith("_aux_")}
            allmap = {k: v for k, v in allmap.items()
                      if not k.startswith("_aux_")}
            return img, allmap, aux

    else:
        rows_per = _strip_rows(
            h, settings.tile_px, settings.coarse_tiles, n_dev)

        def strip_fn(splats, bg):
            idx = lax.axis_index(axis)
            img, allmap = tiled.rasterize_rows(
                splats, settings, bg, idx * rows_per, rows_per
            )
            aux = {k: lax.pmax(v, axis) for k, v in allmap.items()
                   if k.startswith("_aux_")}
            allmap = {k: v for k, v in allmap.items()
                      if not k.startswith("_aux_")}
            return img, allmap, aux

    out_spec = P(axis)
    img, allmap, aux = jax.shard_map(
        strip_fn,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=(out_spec, out_spec, P()),
        # The strip offset derives from axis_index, which makes loop carries
        # "varying" over the mesh axis; skip the varying-manual-axes type
        # check rather than pcast-annotating every scan init in the
        # rasterizer (which also runs unsharded).
        check_vma=False,
    )(splats, bg_color)

    img = img[:h, :w]
    allmap = {k: v[:h, :w] for k, v in allmap.items()}
    allmap.update(aux)  # worst strip's capacity-overflow diagnostics
    return img, allmap


def rasterize_splat_sharded(
    cam,
    settings,
    xyz, scaling, rotation, opacity, features,
    bg_color: jnp.ndarray,
    mesh: Mesh,
    mean2d_offset=None,
    live=None,
    override_color=None,
    axes_override=None,
    axis: str = ROWS_AXIS,
):
    """Gaussian-parallel rendering (pallas backend): splat params sharded
    over `axis`, compacted visible survivors all-gathered, tile-row strips
    blended per device. See the module docstring for the design.

    Returns (image (H,W,3), allmap, radius (N,), mean2d (N,2)) — image/
    allmap row-sharded, radius/mean2d splat-sharded over `axis`."""
    from tpu2dgs.raster import binning
    from tpu2dgs.raster import pallas_backend as pb
    from tpu2dgs.raster import preprocess as pre

    w, h = settings.width, settings.height
    n = xyz.shape[0]
    n_dev = mesh.shape[axis]
    if n % n_dev:
        raise ValueError(
            f"splat sharding needs capacity divisible by the mesh: "
            f"{n} % {n_dev} != 0 (grow the model capacity)")
    n_loc = n // n_dev

    k_vis = min(settings.vis_capacity or n, n)
    # NOTE per-device semantics: each shard keeps ITS front-most k_loc
    # survivors, not the global front-most k_vis (see RasterSettings.
    # vis_capacity); _aux_vis_overflow flags a shard that lost any.
    k_loc = min(n_loc, max(128, -(-(-(-k_vis // n_dev)) // 128) * 128))
    if n_dev * k_loc >= 1 << 24:
        # Merged survivor slots ride an f32 channel through the cross-device
        # sort/binning; integers past 2^24 are not exactly representable.
        raise ValueError(
            f"splat sharding: merged survivor count {n_dev * k_loc} "
            f">= 2^24 exceeds the f32 slot channel; set "
            f"vis_capacity < {1 << 24}")

    nbx = -(-w // pb.BX)
    nty = -(-h // pb.BY)
    rows_per = -(-(-(-nty // n_dev)) // 4) * 4  # whole coarse-bin rows

    cap = min(settings.tile_capacity, max(n, 1))
    bin_cap = max(min(settings.bin_capacity, max(n, 1)), cap)
    interpret = settings.debug

    if mean2d_offset is None:
        mean2d_offset = jnp.zeros((n, 2), jnp.float32)
    if live is None:
        live = jnp.ones((n,), bool)
    oc = override_color
    ao = axes_override

    def shard_fn(xyz, scaling, rotation, opacity, features, off, live_,
                 bg, oc_, ao_):
        d = lax.axis_index(axis)
        splats = pre.preprocess(
            xyz, scaling, rotation, opacity.reshape(-1), features, cam, w, h,
            settings.sh_degree, mean2d_offset=off,
            scale_modifier=settings.scale_modifier, live=live_,
            override_color=oc_, axes_override=ao_)
        comp = binning.compact_visible(splats, k_loc)
        rec_loc = pb.pack_records(splats)[comp.perm]   # (k_loc, REC)

        # Global splat id — the cross-device tie-break that reproduces the
        # single-device (depth, id) composite order exactly (params are
        # axis-0 concatenated across the mesh, so gid = d*n_loc + local).
        gid = (d * n_loc + comp.perm).astype(jnp.int32)
        gid = jnp.where(comp.valid, gid, jnp.int32(2**31 - 1))

        def ag(a):
            return lax.all_gather(a, axis, tiled=True)

        rec_g = ag(rec_loc)                            # (K, REC)
        slot = jnp.arange(rec_g.shape[0], dtype=jnp.int32)
        # Box bounds ride the merge as packed-int32 payloads (LOSSLESS:
        # compact_visible already returns integer-valued boxes and
        # pack_interval is idempotent on them) — 5 sort operands
        # instead of 7.
        px = binning.pack_interval(comp.x0, comp.x1)
        py = binning.pack_interval(comp.y0, comp.y1)
        _, _, spx, spy, sslot = lax.sort(
            (ag(comp.depth), ag(gid), ag(px), ag(py), slot),
            dimension=0, is_stable=True, num_keys=2)
        sx0, sx1 = binning.unpack_interval(spx)
        sy0, sy1 = binning.unpack_interval(spy)
        rec_c = rec_g[sslot]                           # global depth order

        n_vis = lax.psum(jnp.minimum(comp.num_visible, k_loc), axis)
        col_cap = settings.col_capacity
        rec3, counts, bin_counts, col_counts = pb._bin_records(
            sx0, sx1, sy0, sy1, n_vis, lax.stop_gradient(rec_c), nbx,
            rows_per, bin_cap, cap, d * rows_per, col_cap=col_cap,
            interpret=interpret)

        aux = {
            "_aux_bin_overflow_frac": jnp.mean(
                (bin_counts > bin_cap).astype(jnp.float32)),
            "_aux_col_overflow_frac": jnp.mean(
                (col_counts > col_cap).astype(jnp.float32)),
            # a shard with more than k_loc visible splats lost survivors
            "_aux_vis_overflow": (
                comp.num_visible > k_loc).astype(jnp.float32),
            "_aux_bin_count_max": jnp.max(bin_counts).astype(jnp.float32),
            "_aux_col_count_max": jnp.max(col_counts).astype(jnp.float32),
        }
        img, allmap = pb.blend_binned(
            rec_c, rec3, counts, settings, bg, nbx, rows_per,
            d * rows_per, False, interpret, aux)
        aux_out = {k: lax.pmax(v, axis) for k, v in allmap.items()
                   if k.startswith("_aux_")}
        allmap = {k: v for k, v in allmap.items()
                  if not k.startswith("_aux_")}
        return img, allmap, aux_out, splats.radius, splats.mean2d

    img, allmap, aux_out, radius, mean2d = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis), P(),
                  P(axis) if oc is not None else P(),
                  P(axis) if ao is not None else P()),
        out_specs=(P(axis), P(axis), P(), P(axis), P(axis)),
        check_vma=False,
    )(xyz, scaling, rotation, opacity, features, mean2d_offset, live,
      bg_color, oc, ao)

    img = img[:h, :w]
    allmap = {k: v[:h, :w] for k, v in allmap.items()}
    allmap.update(aux_out)
    return img, allmap, radius, mean2d
