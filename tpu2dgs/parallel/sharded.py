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


def _reduce_aux(allmap: dict, axis: str) -> dict:
    """Mesh-reduce the backend's _aux_* diagnostics inside shard_map:
    scalars take the worst strip (pmax) EXCEPT _aux_strip_work, which is
    all-gathered into a (D,) per-device work vector — the imbalance signal
    (max/mean of it is the tile-row sharding efficiency bound)."""
    out = {}
    for k, v in allmap.items():
        if not k.startswith("_aux_"):
            continue
        if k == "_aux_strip_work":
            out[k] = lax.all_gather(v, axis)
        else:
            out[k] = lax.pmax(v, axis)
    return out


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


def _balance_boundaries(x0, x1, y0, y1, vis, w: int, nty: int, n_dev: int,
                        tile_cap: int = 1 << 30):
    """Work-quantile tile-row window boundaries for D devices.

    x0..y1: (K,) f32 screen AABBs (culled entries have lo > hi). The work
    proxy is the per-tile blend-entry count CLAMPED at the tile capacity
    (hot tiles saturate at `tile_cap`, so un-clamped counts over-weight
    dense rows and starve the rest — measured D=8 bench imbalance 1.47
    unclamped vs 1.12 clamped): a (nty+1, nbx+1) 2D difference histogram
    (4 corner scatter-adds per splat + 2D cumsum — O(K + tiles), no
    K x tiles materialization), clamped per tile, summed over columns.
    Boundaries are quantiles of the row-work prefix sum, so device d's
    contiguous window [b[d], b[d+1]) carries ~1/D of the total entries.
    All traced: the split moves per camera with NO recompile. Measured on
    the 800px scenes at D=8: max/mean strip work 2.90 (static strips) ->
    ~1.12 bench pileup, 1.96 -> ~1.11 shell
    (scripts/strip_balance_probe.py).

    Returns b: (n_dev+1,) int32, b[0] = 0, b[n_dev] = nty."""
    from tpu2dgs.raster import pallas_backend as pb

    nbx = -(-w // pb.BX)
    c0 = jnp.clip(jnp.floor(x0 / pb.BX), 0, nbx - 1).astype(jnp.int32)
    c1 = jnp.clip(jnp.floor(x1 / pb.BX), 0, nbx - 1).astype(jnp.int32)
    r0 = jnp.clip(jnp.floor(y0 / pb.BY), 0, nty - 1).astype(jnp.int32)
    r1 = jnp.clip(jnp.floor(y1 / pb.BY), 0, nty - 1).astype(jnp.int32)
    valid = (x0 <= x1) & (y0 <= y1) & vis
    one = jnp.where(valid, 1.0, 0.0)
    ncol = nbx + 1
    flat = jnp.zeros(((nty + 1) * ncol,), jnp.float32)
    flat = (flat
            .at[r0 * ncol + c0].add(one)
            .at[r0 * ncol + c1 + 1].add(-one)
            .at[(r1 + 1) * ncol + c0].add(-one)
            .at[(r1 + 1) * ncol + c1 + 1].add(one))
    grid = flat.reshape(nty + 1, ncol)
    tiles = jnp.cumsum(jnp.cumsum(grid, axis=0), axis=1)[:nty, :nbx]
    row_work = jnp.sum(jnp.minimum(tiles, float(tile_cap)), axis=1)
    prefix = jnp.cumsum(row_work)
    total = prefix[-1]
    targets = jnp.arange(1, n_dev, dtype=jnp.float32) * (total / n_dev)
    mids = jnp.searchsorted(prefix, targets, side="left") + 1
    return jnp.concatenate([
        jnp.zeros((1,), jnp.int32), mids.astype(jnp.int32),
        jnp.full((1,), nty, jnp.int32)])


def _row_take(b, n_dev: int, nty: int, h: int, dev_rows: int):
    """Pixel-row gather indices reassembling D stacked full-height strips
    (device-major, dev_rows pixel rows each) into the spatial image: pixel
    row i comes from its OWNING device (the one whose window contains tile
    row i // BY) at the same local offset."""
    from tpu2dgs.raster import pallas_backend as pb

    i = jnp.arange(h, dtype=jnp.int32)
    ty = i // pb.BY
    d = jnp.searchsorted(b[1:n_dev], ty, side="right").astype(jnp.int32)
    return d * dev_rows + i


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
    balanced = False

    if settings.backend == "pallas":
        from tpu2dgs.raster import pallas_backend as pb

        nty = -(-h // pb.BY)
        balanced = settings.row_balance == "work" and n_dev > 1
        if balanced:
            # Work-balanced contiguous windows: per-device boundaries are
            # TRACED work quantiles (no recompile between cameras); each
            # device bins/blends a full-height static grid but only its
            # window's tiles carry work. Strips are reassembled by a row
            # gather after the shard_map.
            c = lax.stop_gradient(splats.box_center)
            e = lax.stop_gradient(splats.box_half)
            bnd = _balance_boundaries(
                c[:, 0] - e[:, 0], c[:, 0] + e[:, 0],
                c[:, 1] - e[:, 1], c[:, 1] + e[:, 1],
                splats.visible, w, nty, n_dev,
                tile_cap=settings.tile_capacity)
            rows_per = nty

            def strip_fn(splats, bg, b):
                idx = lax.axis_index(axis)
                img, allmap = pb.rasterize_pallas(
                    splats, settings, bg, interpret=settings.debug,
                    tile_row0=0, nty_local=nty,
                    row_lo=b[idx], row_hi=b[idx + 1],
                )
                aux = _reduce_aux(allmap, axis)
                allmap = {k: v for k, v in allmap.items()
                          if not k.startswith("_aux_")}
                return img, allmap, aux
        else:
            # strips in whole coarse-bin rows (4 tile rows of BY px)
            rows_per = -(-(-(-nty // n_dev)) // 4) * 4

            def strip_fn(splats, bg, b):
                idx = lax.axis_index(axis)
                img, allmap = pb.rasterize_pallas(
                    splats, settings, bg, interpret=settings.debug,
                    tile_row0=idx * rows_per, nty_local=rows_per,
                )
                aux = _reduce_aux(allmap, axis)
                allmap = {k: v for k, v in allmap.items()
                          if not k.startswith("_aux_")}
                return img, allmap, aux

    else:
        rows_per = _strip_rows(
            h, settings.tile_px, settings.coarse_tiles, n_dev)

        def strip_fn(splats, bg, b):
            idx = lax.axis_index(axis)
            img, allmap = tiled.rasterize_rows(
                splats, settings, bg, idx * rows_per, rows_per
            )
            aux = _reduce_aux(allmap, axis)
            allmap = {k: v for k, v in allmap.items()
                      if not k.startswith("_aux_")}
            return img, allmap, aux

    bnd_in = bnd if balanced else jnp.zeros((n_dev + 1,), jnp.int32)
    out_spec = P(axis)
    img, allmap, aux = jax.shard_map(
        strip_fn,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(out_spec, out_spec, P()),
        # The strip offset derives from axis_index, which makes loop carries
        # "varying" over the mesh axis; skip the varying-manual-axes type
        # check rather than pcast-annotating every scan init in the
        # rasterizer (which also runs unsharded).
        check_vma=False,
    )(splats, bg_color, bnd_in)

    if balanced:
        from tpu2dgs.raster import pallas_backend as pb

        take = _row_take(bnd, n_dev, nty, h, rows_per * pb.BY)
        img = jnp.take(img, take, axis=0)[:, :w]
        allmap = {k: jnp.take(v, take, axis=0)[:, :w]
                  for k, v in allmap.items()}
    else:
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
    over `axis`, compacted visible survivors all-gathered (or strip-ROUTED
    via all_to_all when settings.xfer_capacity > 0), tile-row strips
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
    balanced = settings.row_balance == "work" and n_dev > 1
    # static strips: whole coarse-bin rows; balanced: full-height windows
    rows_per = nty if balanced else -(-(-(-nty // n_dev)) // 4) * 4

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

        # Box bounds ride the merge as packed-int32 payloads (LOSSLESS:
        # compact_visible already returns integer-valued boxes and
        # pack_interval is idempotent on them).
        px = binning.pack_interval(comp.x0, comp.x1)
        py = binning.pack_interval(comp.y0, comp.y1)
        aux = {}

        kx = settings.xfer_capacity
        if kx:
            # STRIP-ROUTED exchange: records travel only to strips their
            # boxes intersect. Bytes/frame model (per device, REC=24,
            # K = D*k_loc merged survivors): the all-gather path below
            # receives 96K B of records + 16K B of merge channels and
            # psum-scatters 96K B of record cotangents, and EVERY device
            # then runs the identical K-row 5-operand merge sort. This
            # path all-gathers only the 8K B of packed boxes (balanced
            # boundaries), exchanges ~(1+overlap)*96K/D B of records per
            # device (a splat crosses ~1-2 window boundaries), and merges
            # D*kx ~= K/D rows locally — ~D-fold less ICI volume and merge
            # work. Overflowing messages drop their DEEPEST rows
            # (aux-counted, Trainer-healed via xfer_capacity).
            kx = pb._round128(min(kx, k_loc))
            if balanced:
                gx0, gx1 = binning.unpack_interval(ag(px))
                gy0, gy1 = binning.unpack_interval(ag(py))
                bnd = _balance_boundaries(
                    gx0, gx1, gy0, gy1, jnp.ones_like(gx0, bool),
                    w, nty, n_dev, tile_cap=cap)
                row0, row_lo, row_hi = 0, bnd[d], bnd[d + 1]
            else:
                bnd = jnp.minimum(
                    jnp.arange(n_dev + 1, dtype=jnp.int32) * rows_per, nty)
                row0, row_lo, row_hi = d * rows_per, None, None
            # destination strips: box y-interval vs strip pixel rows
            blo = (bnd[:-1] * pb.BY).astype(jnp.float32)        # (D,)
            bhi = (bnd[1:] * pb.BY).astype(jnp.float32) - 1.0
            hit = ((comp.y0[None, :] <= bhi[:, None])
                   & (comp.y1[None, :] >= blo[:, None])
                   & comp.valid[None, :])                       # (D, k_loc)
            pos, vx, cnts = binning.first_k_hits(hit, kx)       # (D, kx)
            empty = binning.pack_interval(jnp.float32(1e9),
                                          jnp.float32(-1e9))
            f32s = jnp.concatenate(
                [rec_loc[pos],
                 jnp.where(vx, comp.depth[pos], jnp.inf)[..., None]],
                axis=-1)                                        # (D, kx, 25)
            ints = jnp.stack(
                [jnp.where(vx, gid[pos], jnp.int32(2**31 - 1)),
                 jnp.where(vx, px[pos], empty),
                 jnp.where(vx, py[pos], empty)], axis=-1)       # (D, kx, 3)
            f32r = lax.all_to_all(f32s, axis, 0, 0, tiled=True)
            intr = lax.all_to_all(ints, axis, 0, 0, tiled=True)
            cnt_r = lax.all_to_all(jnp.minimum(cnts, kx), axis, 0, 0,
                                   tiled=True)                  # (D,)
            k_strip = n_dev * kx
            slot = jnp.arange(k_strip, dtype=jnp.int32)
            _, _, spx, spy, sslot = lax.sort(
                (f32r[..., pb.REC].reshape(k_strip),
                 intr[..., 0].reshape(k_strip),
                 intr[..., 1].reshape(k_strip),
                 intr[..., 2].reshape(k_strip), slot),
                dimension=0, is_stable=True, num_keys=2)
            sx0, sx1 = binning.unpack_interval(spx)
            sy0, sy1 = binning.unpack_interval(spy)
            rec_c = f32r[..., : pb.REC].reshape(k_strip, pb.REC)[sslot]
            n_vis = jnp.sum(cnt_r)
            aux.update({
                # fraction of this owner's D messages that overflowed
                # (deepest rows dropped), and the true per-message demand
                # maximum for the Trainer's adaptive xfer_capacity growth
                "_aux_xfer_overflow_frac": jnp.mean(
                    (cnts > kx).astype(jnp.float32)),
                "_aux_xfer_count_max": jnp.max(cnts).astype(jnp.float32),
            })
        else:
            rec_g = ag(rec_loc)                        # (K, REC)
            slot = jnp.arange(rec_g.shape[0], dtype=jnp.int32)
            # 5 sort operands instead of 7 (packed box payloads).
            _, _, spx, spy, sslot = lax.sort(
                (ag(comp.depth), ag(gid), ag(px), ag(py), slot),
                dimension=0, is_stable=True, num_keys=2)
            sx0, sx1 = binning.unpack_interval(spx)
            sy0, sy1 = binning.unpack_interval(spy)
            rec_c = rec_g[sslot]                       # global depth order
            n_vis = lax.psum(jnp.minimum(comp.num_visible, k_loc), axis)
            if balanced:
                # Boundaries from the MERGED survivor boxes — identical on
                # every device, so the windows tile the image consistently.
                bnd = _balance_boundaries(
                    sx0, sx1, sy0, sy1, jnp.ones_like(sx0, bool),
                    w, nty, n_dev, tile_cap=cap)
                row0, row_lo, row_hi = 0, bnd[d], bnd[d + 1]
            else:
                bnd = jnp.zeros((n_dev + 1,), jnp.int32)
                row0, row_lo, row_hi = d * rows_per, None, None

        col_cap = settings.col_capacity
        rec3, counts, bin_counts, col_counts = pb._bin_records(
            sx0, sx1, sy0, sy1, n_vis, lax.stop_gradient(rec_c), nbx,
            rows_per, bin_cap, cap, row0, col_cap=col_cap,
            interpret=interpret, row_lo=row_lo, row_hi=row_hi)

        aux.update({
            "_aux_bin_overflow_frac": jnp.mean(
                (bin_counts > bin_cap).astype(jnp.float32)),
            "_aux_col_overflow_frac": jnp.mean(
                (col_counts > col_cap).astype(jnp.float32)),
            # a shard with more than k_loc visible splats lost survivors
            "_aux_vis_overflow": (
                comp.num_visible > k_loc).astype(jnp.float32),
            "_aux_bin_count_max": jnp.max(bin_counts).astype(jnp.float32),
            "_aux_col_count_max": jnp.max(col_counts).astype(jnp.float32),
        })
        img, allmap = pb.blend_binned(
            rec_c, rec3, counts, settings, bg, nbx, rows_per,
            row0, False, interpret, aux)
        aux_out = _reduce_aux(allmap, axis)
        allmap = {k: v for k, v in allmap.items()
                  if not k.startswith("_aux_")}
        return img, allmap, aux_out, splats.radius, splats.mean2d, bnd

    img, allmap, aux_out, radius, mean2d, bnd = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis), P(),
                  P(axis) if oc is not None else P(),
                  P(axis) if ao is not None else P()),
        out_specs=(P(axis), P(axis), P(), P(axis), P(axis), P()),
        check_vma=False,
    )(xyz, scaling, rotation, opacity, features, mean2d_offset, live,
      bg_color, oc, ao)

    if balanced:
        take = _row_take(bnd, n_dev, nty, h, rows_per * pb.BY)
        img = jnp.take(img, take, axis=0)[:, :w]
        allmap = {k: jnp.take(v, take, axis=0)[:, :w]
                  for k, v in allmap.items()}
    else:
        img = img[:h, :w]
        allmap = {k: v[:h, :w] for k, v in allmap.items()}
    allmap.update(aux_out)
    return img, allmap, radius, mean2d
