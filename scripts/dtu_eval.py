"""DTU full-eval harness (reference scripts/dtu_eval.py: 15 scans, -r 2
--depth_ratio 1 --lambda_dist 1000; mesh with voxel 0.004 / sdf_trunc 0.016
/ depth_trunc 3; Chamfer vs the official points with mask culling)."""

import os
from argparse import ArgumentParser

SCANS = ["scan24", "scan37", "scan40", "scan55", "scan63", "scan65",
         "scan69", "scan83", "scan97", "scan105", "scan106", "scan110",
         "scan114", "scan118", "scan122"]
TRAIN = "python -m tpu2dgs.cli.train"
RENDER = "python -m tpu2dgs.cli.render"


def main():
    parser = ArgumentParser(description="Full evaluation script parameters")
    parser.add_argument("--skip_training", action="store_true")
    parser.add_argument("--skip_rendering", action="store_true")
    parser.add_argument("--skip_metrics", action="store_true")
    parser.add_argument("--output_path", default="./eval/dtu")
    parser.add_argument("--dtu", "-dtu", type=str, default=None)
    parser.add_argument("--DTU_Official", "-DTU", type=str, default=None)
    args = parser.parse_args()

    if not args.skip_training:
        common = (" --quiet --test_iterations 30000 --depth_ratio 1.0 -r 2 "
                  "--lambda_dist 1000")
        for scan in SCANS:
            os.system(f"{TRAIN} -s {args.dtu}/{scan} "
                      f"-m {args.output_path}/{scan}{common}")

    if not args.skip_rendering:
        common = (" --quiet --skip_train --depth_ratio 1.0 --num_cluster 1 "
                  "--voxel_size 0.004 --sdf_trunc 0.016 --depth_trunc 3.0")
        for scan in SCANS:
            os.system(f"{RENDER} --iteration 30000 -s {args.dtu}/{scan} "
                      f"-m {args.output_path}/{scan}{common}")

    if not args.skip_metrics:
        script_dir = os.path.dirname(os.path.abspath(__file__))
        for scan in SCANS:
            scan_id = scan[4:]
            os.system(
                f"python {script_dir}/eval_dtu_scene.py "
                f"--input_mesh {args.output_path}/{scan}/train/ours_30000/fuse_post.ply "
                f"--scan_id {scan_id} --output_dir {script_dir}/tmp/scan{scan_id} "
                f"--mask_dir {args.dtu} --DTU {args.DTU_Official}"
            )


if __name__ == "__main__":
    main()
