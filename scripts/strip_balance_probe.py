"""Measure tile-row strip load imbalance under multi-chip sharding.

Tile-row sharding (parallel/sharded.py) runs the whole step at the slowest
strip's pace, so max/mean strip work bounds scaling efficiency (the >=80%
1-chip -> N-hosts bar in BASELINE.json needs max/mean <= ~1.25). This
probe computes the exact per-tile blended-entry counts once (the counts
each strip would compute — tile-row sharding preserves the global tile
set, asserted by tests/test_sharded.py) and aggregates them under:

  * contiguous assignment — device d owns coarse rows
    [d*rows_per, (d+1)*rows_per), exactly sharded.py's rows_per math;
  * block-cyclic assignment — coarse row r (4 tile rows) -> device r % D.

on two workloads: the bench transparency pileup and the trained-scene-like
opaque shell (eval/synthetic.py). Runs on whatever platform is attached
(TPU preferred; counts are platform-independent).

Usage: python scripts/strip_balance_probe.py [W] [N_log2]
"""

import sys

import numpy as np
import jax.numpy as jnp

import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import tpu2dgs  # noqa: E402
from tpu2dgs.eval.synthetic import make_bench_scene, make_shell_scene  # noqa: E402
from tpu2dgs.raster import binning, pallas_backend as pb  # noqa: E402
from tpu2dgs.raster import preprocess as pre  # noqa: E402


def tile_counts(cam, scene, w, h, tile_cap):
    """Exact per-tile clamped entry counts, (nbx, nty) column-major."""
    xyz, scaling, rotation, opacity, features = scene
    splats = pre.preprocess(
        xyz, scaling, rotation, opacity, features, cam, w, h, 3)
    n = xyz.shape[0]
    comp = binning.compact_visible(splats, n)
    rec = pb.pack_records(splats)
    nbx = -(-w // pb.BX)
    nty = -(-h // pb.BY)
    import jax
    interp = jax.default_backend() == "cpu"  # pallas select kernels
    _, raw_counts, _, _ = pb._bin_records(
        comp.x0, comp.x1, comp.y0, comp.y1,
        jnp.minimum(comp.num_visible, n), rec, nbx, nty,
        bin_cap=16384, cap=tile_cap, tile_row0=0, col_cap=65536,
        ids=comp.perm, interpret=interp)
    counts = np.asarray(jnp.minimum(raw_counts, tile_cap)).reshape(nbx, nty)
    return counts, nty, splats


def imbalance(row_work, nty, n_dev, cyclic):
    """max/mean strip work for D devices (coarse rows = 4 tile rows)."""
    n_coarse = -(-nty // 4)
    cw = np.zeros(n_coarse)
    for r in range(n_coarse):
        cw[r] = row_work[4 * r: 4 * (r + 1)].sum()
    dev = np.zeros(n_dev)
    if cyclic:
        for r in range(n_coarse):
            dev[r % n_dev] += cw[r]
    else:
        rows_per = -(-(-(-nty // n_dev)) // 4) * 4  # sharded.py rows_per
        for r in range(n_coarse):
            d = min(4 * r // rows_per, n_dev - 1)
            dev[d] += cw[r]
    mean = dev.sum() / n_dev
    return dev.max() / max(mean, 1e-9), dev


def balanced_imbalance(splats, row_work, w, nty, n_dev):
    """max/mean strip work under the DEPLOYED work-quantile windows
    (parallel/sharded._balance_boundaries — includes its span-proxy
    error), aggregating the TRUE per-row entry counts per window."""
    from tpu2dgs.parallel.sharded import _balance_boundaries

    c = splats.box_center
    e = splats.box_half
    b = np.asarray(_balance_boundaries(
        c[:, 0] - e[:, 0], c[:, 0] + e[:, 0],
        c[:, 1] - e[:, 1], c[:, 1] + e[:, 1],
        splats.visible, w, nty, n_dev, tile_cap=1792))
    dev = np.array([row_work[b[d]:b[d + 1]].sum() for d in range(n_dev)])
    return dev.max() / max(dev.sum() / n_dev, 1e-9), dev


def main():
    w = h = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    n = 1 << (int(sys.argv[2]) if len(sys.argv) > 2 else 17)
    for name, (cam, scene), cap in [
        ("bench-pileup", make_bench_scene(w, h, n), 1792),
        ("shell", make_shell_scene(w, h, n), 1792),
    ]:
        counts, nty, splats = tile_counts(cam, scene, w, h, cap)
        row_work = counts.sum(axis=0)  # (nty,)
        total = counts.sum()
        print(f"\n{name}: {w}x{h}, {n} splats, total entries {total}")
        for n_dev in (2, 4, 8):
            r_c, dev_c = imbalance(row_work, nty, n_dev, cyclic=False)
            r_i, dev_i = imbalance(row_work, nty, n_dev, cyclic=True)
            r_b, dev_b = balanced_imbalance(splats, row_work, w, nty, n_dev)
            print(f"  D={n_dev}: static max/mean={r_c:.3f} "
                  f"(eff bound {1/r_c:.2f})  "
                  f"cyclic={r_i:.3f} ({1/r_i:.2f})  "
                  f"BALANCED={r_b:.3f} ({1/r_b:.2f})")
            if n_dev == 8:
                print(f"       static   per-dev: "
                      f"{np.array2string(dev_c / 1e3, precision=1)}k")
                print(f"       balanced per-dev: "
                      f"{np.array2string(dev_b / 1e3, precision=1)}k")


if __name__ == "__main__":
    main()
