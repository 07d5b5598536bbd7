"""Tanks&Temples single-scene F-score: ICP-refined alignment + histogram
precision/recall at tau (reference scripts/eval_tnt/run.py + evaluation.py,
with scipy ICP replacing open3d registration)."""

from __future__ import annotations

import argparse
import json

import numpy as np


def main(argv=None):
    from tpu2dgs.eval.geometry import (
        align_icp, downsample_points, fscore, sample_mesh_points,
    )
    from tpu2dgs.mesh.extract import read_mesh_ply
    from tpu2dgs.model.splats import read_ply_vertices

    parser = argparse.ArgumentParser()
    parser.add_argument("--gt-ply", required=True)
    parser.add_argument("--ply-path", required=True)
    parser.add_argument("--tau", type=float, required=True)
    parser.add_argument("--out", default="f1.json")
    parser.add_argument("--n-samples", type=int, default=2_000_000)
    args = parser.parse_args(argv)

    verts, faces = read_mesh_ply(args.ply_path)
    # face-center + vertex augmented samples (reference run.py:95-108 style)
    data_pts = sample_mesh_points(verts, faces, n=args.n_samples)
    gt_v = read_ply_vertices(args.gt_ply)
    gt_pts = np.stack([gt_v["x"], gt_v["y"], gt_v["z"]], 1).astype(np.float64)

    density = args.tau / 2.0
    data_pts = downsample_points(data_pts, density)
    gt_down = downsample_points(gt_pts, density)

    # 3-stage ICP refinement (reference run.py:156-161)
    pts = data_pts
    for max_corr in (args.tau * 10, args.tau * 3, args.tau):
        T = align_icp(pts, gt_down, iters=15, max_corr=max_corr)
        pts = pts @ T[:3, :3].T + T[:3, 3]

    precision, recall, f1 = fscore(pts, gt_down, args.tau)
    print(f"precision {precision:.4f}  recall {recall:.4f}  f1 {f1:.4f} "
          f"(tau {args.tau})")
    with open(args.out, "w") as f:
        json.dump({"precision": precision, "recall": recall, "f1": f1,
                   "tau": args.tau}, f, indent=2)


if __name__ == "__main__":
    main()
