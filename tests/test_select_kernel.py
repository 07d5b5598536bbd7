"""Pallas stream-compaction kernel vs the XLA prefix-sum reference
(binning.first_k_hits): exact list equality in interpret mode, including
the overlapping-write edge cases (row-boundary crossings, exact-multiple
counts, empty rows, capacity overflow)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu2dgs.raster import binning
from tpu2dgs.raster.select_kernel import select_rows


def _check(rects, boxes, parent, cap):
    pos, counts = select_rows(rects, boxes, parent, cap, interpret=True)
    rx0, rx1, ry0, ry1 = rects
    cx0, cx1, cy0, cy1 = boxes
    for r in range(rx0.shape[0]):
        p = int(parent[r])
        hit = ((cx0[p] <= rx1[r]) & (cx1[p] >= rx0[r])
               & (cy0[p] <= ry1[r]) & (cy1[p] >= ry0[r]))
        ref_pos, _, ref_counts = binning.first_k_hits(hit[None], cap)
        assert int(counts[r]) == int(ref_counts[0]), r
        k = min(int(ref_counts[0]), cap)
        np.testing.assert_array_equal(
            np.asarray(pos[r][:k]), np.asarray(ref_pos[0][:k]),
            err_msg=f"row {r}")
        # zero-fill past the count
        assert np.all(np.asarray(pos[r][k:]) == 0), r


def test_select_random():
    rng = np.random.default_rng(0)
    NP, M, R, CAP = 3, 1024, 12, 256
    cx0 = jnp.asarray(rng.uniform(0, 800, (NP, M)), jnp.float32)
    cx1 = cx0 + jnp.asarray(rng.uniform(5, 60, (NP, M)), jnp.float32)
    cy0 = jnp.asarray(rng.uniform(0, 800, (NP, M)), jnp.float32)
    cy1 = cy0 + jnp.asarray(rng.uniform(5, 60, (NP, M)), jnp.float32)
    rx0 = jnp.asarray(rng.uniform(0, 700, R), jnp.float32)
    ry0 = jnp.asarray(rng.uniform(0, 700, R), jnp.float32)
    parent = jnp.asarray(rng.integers(0, NP, R), jnp.int32)
    _check((rx0, rx0 + 127, ry0, ry0 + 63),
           (cx0, cx1, cy0, cy1), parent, CAP)


def test_select_dense_and_boundaries():
    """All-hit rows exercise every 128-row crossing; counts that are exact
    multiples of 128 exercise the no-partial-flush path."""
    M, R = 1024, 4
    big0 = jnp.zeros((1, M), jnp.float32)
    big1 = jnp.full((1, M), 1000.0, jnp.float32)
    boxes = (big0, big1, big0, big1)  # every candidate hits everything
    rx0 = jnp.zeros(R, jnp.float32)
    rects = (rx0, rx0 + 10, rx0, rx0 + 10)
    parent = jnp.zeros(R, jnp.int32)
    _check(rects, boxes, parent, 512)    # counts (1024) > cap (512)
    _check(rects, boxes, parent, 1024)   # counts == cap, multiple of 128


def test_select_empty_and_sparse():
    M = 1024
    rng = np.random.default_rng(1)
    cx0 = jnp.asarray(rng.uniform(0, 800, (1, M)), jnp.float32)
    boxes = (cx0, cx0 + 1.0, cx0, cx0 + 1.0)
    # row 0 hits nothing; row 1 hits a handful
    rects = (jnp.array([3000.0, 100.0]), jnp.array([3100.0, 400.0]),
             jnp.array([3000.0, 100.0]), jnp.array([3100.0, 400.0]))
    _check(rects, boxes, jnp.zeros(2, jnp.int32), 128)


def test_select_parent_counts():
    """With parent_counts, only the front of each list is walked; results
    must equal the full walk when the tail is never-hit padding."""
    rng = np.random.default_rng(2)
    NP, M, R, CAP = 2, 4096, 6, 256
    cx0 = np.asarray(rng.uniform(0, 800, (NP, M)), np.float32)
    cx1 = cx0 + 40.0
    cy0 = np.asarray(rng.uniform(0, 800, (NP, M)), np.float32)
    cy1 = cy0 + 40.0
    counts = np.array([1500, 4096], np.int32)
    for p in range(NP):
        cx0[p, counts[p]:], cx1[p, counts[p]:] = 1e9, -1e9
        cy0[p, counts[p]:], cy1[p, counts[p]:] = 1e9, -1e9
    boxes = tuple(jnp.asarray(a) for a in (cx0, cx1, cy0, cy1))
    rx0 = jnp.asarray(rng.uniform(0, 700, R), jnp.float32)
    ry0 = jnp.asarray(rng.uniform(0, 700, R), jnp.float32)
    rects = (rx0, rx0 + 127, ry0, ry0 + 63)
    parent = jnp.asarray(rng.integers(0, NP, R), jnp.int32)
    pos_full, cnt_full = select_rows(rects, boxes, parent, CAP,
                                     interpret=True)
    pos_cnt, cnt_cnt = select_rows(
        rects, boxes, parent, CAP,
        parent_counts=jnp.asarray(counts)[parent], interpret=True)
    np.testing.assert_array_equal(np.asarray(cnt_full), np.asarray(cnt_cnt))
    np.testing.assert_array_equal(np.asarray(pos_full), np.asarray(pos_cnt))
    _check(rects, boxes, parent, CAP)


def test_select_pads_to_macro_block():
    """M not a multiple of 1024 is padded internally with never-hit boxes."""
    M = 300
    cx0 = jnp.linspace(0, 500, M, dtype=jnp.float32)[None]
    boxes = (cx0, cx0 + 30.0, jnp.zeros((1, M), jnp.float32),
             jnp.full((1, M), 50.0, jnp.float32))
    rects = (jnp.array([100.0]), jnp.array([220.0]),
             jnp.array([0.0]), jnp.array([10.0]))
    _check(rects, boxes, jnp.zeros(1, jnp.int32), 128)


def test_exact_coverage_no_false_negatives():
    """The conic∪circle coverage test must pass every (splat, tile) pair
    where ANY integer pixel of the tile blends the splat (the blend
    kernels' `hit`): a false negative would change rendered outputs. Also
    sanity-check it actually prunes some AABB-overlapping pairs (it is the
    point of the test)."""
    import jax

    from tests.test_tiled import _cam, _random_scene
    from tpu2dgs.raster import pallas_backend as pb
    from tpu2dgs.raster import preprocess as pre
    from tpu2dgs.raster.pallas_backend import _EXACT_IDX, _splat_response
    from tpu2dgs.raster.select_kernel import _exact_coverage

    w, h = 512, 256
    cam = _cam(w, h)
    scene = _random_scene(n=256, seed=33)
    splats = pre.preprocess(*scene[:5], cam, w, h, 3)
    rec = np.asarray(pb.pack_records(splats))
    vis = np.asarray(splats.visible)
    box_lo = np.asarray(splats.box_center - splats.box_half)
    box_hi = np.asarray(splats.box_center + splats.box_half)

    rng = np.random.default_rng(0)
    checked = hits = covered = aabb_pairs = 0
    for s in np.nonzero(vis)[0]:
        # tiles the binning AABB touches (the only pairs binning tests)
        i0 = int(np.clip(box_lo[s, 0] // pb.BX, 0, w // pb.BX - 1))
        i1 = int(np.clip(box_hi[s, 0] // pb.BX, 0, w // pb.BX - 1))
        j0 = int(np.clip(box_lo[s, 1] // pb.BY, 0, h // pb.BY - 1))
        j1 = int(np.clip(box_hi[s, 1] // pb.BY, 0, h // pb.BY - 1))
        for ti in range(i0, i1 + 1):
            for tj in range(j0, j1 + 1):
                aabb_pairs += 1
                rx0, ry0 = ti * pb.BX, tj * pb.BY
                px = rx0 + jnp.broadcast_to(
                    jnp.arange(pb.BX, dtype=jnp.float32)[None, :],
                    (pb.BY, pb.BX))
                py = ry0 + jnp.broadcast_to(
                    jnp.arange(pb.BY, dtype=jnp.float32)[:, None],
                    (pb.BY, pb.BX))
                r = [jnp.float32(rec[s, k]) for k in range(21)]
                hit = np.asarray(
                    _splat_response(r, px, py)[2])  # (BY, BX) bool
                blocks = [jnp.full((1, 1), rec[s, c], jnp.float32)
                          for c in range(24)]
                cov = bool(np.asarray(_exact_coverage(
                    blocks, _EXACT_IDX, jnp.float32(rx0),
                    jnp.float32(rx0 + pb.BX - 1), jnp.float32(ry0),
                    jnp.float32(ry0 + pb.BY - 1)))[0, 0])
                checked += 1
                if hit.any():
                    hits += 1
                    assert cov, (
                        f"false negative: splat {s} tile ({ti},{tj})")
                if cov:
                    covered += 1
    assert hits > 50, "test scene too sparse to be meaningful"
    assert covered < aabb_pairs, (
        "coverage test never pruned an AABB pair — not effective")

def test_pack_interval_hit_set_exact():
    """Packed box bounds must reproduce EXACTLY the original hit sets
    against integer-cornered rectangles (the binning invariant), including
    empty +-1e9 culled markers and far-out-of-range bounds."""
    rng = np.random.default_rng(7)
    lo = jnp.asarray(
        np.concatenate([rng.uniform(-3000, 3000, 4096),
                        [0.0, -0.5, 1e-6, 799.99, 1e9, -1e9],
                        np.arange(120, 136, 0.25)]), jnp.float32)
    hi = lo + jnp.asarray(
        np.concatenate([rng.uniform(0, 200, 4096),
                        [0.0, 1.0, 2e-6, 0.01, -2e9, 2e9],
                        np.full(64, 37.75)]), jnp.float32)
    l2, h2 = binning.unpack_interval(binning.pack_interval(lo, hi))
    lo_np, hi_np = np.asarray(lo), np.asarray(hi)
    l2, h2 = np.asarray(l2), np.asarray(h2)
    # inward rounding: the packed interval is contained, < 1px tighter
    small = np.abs(lo_np) < 32000
    assert np.all(l2[small] >= lo_np[small])
    assert np.all(l2[small] < lo_np[small] + 1.0 + 1e-4)
    small = np.abs(hi_np) < 32000
    assert np.all(h2[small] <= hi_np[small])
    assert np.all(h2[small] > hi_np[small] - 1.0 - 1e-4)
    # hit-set equality against integer rectangles (tiles at 128px/16px)
    for edges in (np.arange(0, 801, 128), np.arange(0, 801, 16)):
        b0 = edges[:-1].astype(np.float32)
        b1 = (edges[1:] - 1).astype(np.float32)
        ref = (lo_np[:, None] <= b1[None]) & (hi_np[:, None] >= b0[None])
        got = (l2[:, None] <= b1[None]) & (h2[:, None] >= b0[None])
        np.testing.assert_array_equal(got, ref)


def test_pack_interval_idempotent():
    """Re-packing unpacked values is lossless (the cross-device survivor
    merge re-packs compact_visible's already-quantized boxes)."""
    rng = np.random.default_rng(8)
    lo = jnp.asarray(rng.uniform(-2000, 2000, 2048), jnp.float32)
    hi = lo + jnp.asarray(rng.uniform(0, 300, 2048), jnp.float32)
    l1, h1 = binning.unpack_interval(binning.pack_interval(lo, hi))
    l2, h2 = binning.unpack_interval(binning.pack_interval(l1, h1))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))


def test_select_counts_matches_select_values():
    """The count-only kernel (round-6 CSR step 1) must report EXACTLY the
    counts select_values does — AABB path and exact-coverage path — while
    carrying no values."""
    from tpu2dgs.raster.select_kernel import select_counts, select_values

    rng = np.random.default_rng(7)
    NP, M, R, CAP = 2, 1024, 10, 256
    cx0 = jnp.asarray(rng.uniform(0, 800, (NP, M)), jnp.float32)
    cx1 = cx0 + jnp.asarray(rng.uniform(5, 60, (NP, M)), jnp.float32)
    cy0 = jnp.asarray(rng.uniform(0, 800, (NP, M)), jnp.float32)
    cy1 = cy0 + jnp.asarray(rng.uniform(5, 60, (NP, M)), jnp.float32)
    rx0 = jnp.asarray(rng.uniform(0, 700, R), jnp.float32)
    ry0 = jnp.asarray(rng.uniform(0, 700, R), jnp.float32)
    rects = (rx0, rx0 + 127, ry0, ry0 + 63)
    parent = jnp.asarray(rng.integers(0, NP, R), jnp.int32)
    pcnt = jnp.asarray(rng.integers(0, M, R), jnp.int32)

    # AABB path
    boxes = (cx0, cx1, cy0, cy1)
    _, ref = select_values(rects, boxes, parent, CAP,
                           parent_counts=pcnt, interpret=True)
    got = select_counts(rects, boxes, parent, parent_counts=pcnt,
                        interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    # exact-coverage path: reuse the REAL record channels from binning
    from tests.test_tiled import _cam, _random_scene
    from tpu2dgs.raster import pallas_backend as pb
    from tpu2dgs.raster import preprocess as pre

    w, h = 256, 128
    cam = _cam(w, h)
    scene = _random_scene(n=200, seed=9)
    splats = pre.preprocess(*scene[:5], cam, w, h, 3)
    comp = binning.compact_visible(splats, 200)
    rec = pb.pack_records(splats)
    slot_f = comp.perm.astype(jnp.float32)[None, :]
    # one parent of full records in box order (like the L2 input)
    chans = jnp.transpose(rec[comp.perm][None], (0, 2, 1))
    live = (jnp.arange(chans.shape[2]) < comp.num_visible)[None, None, :]
    pads = jnp.asarray(pb._REC_PADS, jnp.float32)[None, :, None]
    chans = jnp.where(live, chans, pads)
    tx0 = jnp.asarray([0.0, 128.0, 0.0, 128.0], jnp.float32)
    ty0 = jnp.asarray([0.0, 0.0, 64.0, 64.0], jnp.float32)
    rects2 = (tx0, tx0 + 127, ty0, ty0 + 63)
    parent2 = jnp.zeros(4, jnp.int32)
    pcnt2 = jnp.broadcast_to(comp.num_visible, (4,))
    _, ref2 = select_values(
        rects2, chans, parent2, 256, parent_counts=pcnt2, box_idx=None,
        exact_idx=pb._EXACT_IDX, pad_vals=pb._REC_PADS, interpret=True)
    got2 = select_counts(
        rects2, chans, parent2, parent_counts=pcnt2, box_idx=None,
        exact_idx=pb._EXACT_IDX, pad_vals=pb._REC_PADS, interpret=True)
    np.testing.assert_array_equal(np.asarray(got2), np.asarray(ref2))
    assert int(jnp.sum(got2)) > 0  # the exact path actually selected
