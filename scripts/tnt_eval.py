"""Tanks&Temples full-eval harness (reference scripts/tnt_eval.py: 360
scenes at voxel 0.004, large scenes at 0.006; F1 via trajectory-aligned
precision/recall). NOTE: the reference prints --lambda_dist 100/10 but the
executed command drops it (tnt_eval.py:25-31) — we reproduce the *executed*
behavior (default lambda_dist)."""

import os
from argparse import ArgumentParser

TNT_360 = ["Barn", "Caterpillar", "Ignatius", "Truck"]
TNT_LARGE = ["Meetingroom", "Courthouse"]
# per-scene F1 distance thresholds (reference eval_tnt/config.py:33-41)
TAU = {"Barn": 0.01, "Caterpillar": 0.005, "Ignatius": 0.003,
       "Truck": 0.005, "Meetingroom": 0.01, "Courthouse": 0.025}
TRAIN = "python -m tpu2dgs.cli.train"
RENDER = "python -m tpu2dgs.cli.render"


def main():
    parser = ArgumentParser(description="Full evaluation script parameters")
    parser.add_argument("--skip_training", action="store_true")
    parser.add_argument("--skip_rendering", action="store_true")
    parser.add_argument("--skip_metrics", action="store_true")
    parser.add_argument("--output_path", default="eval/tnt")
    parser.add_argument("--TNT_data", type=str, default=None)
    parser.add_argument("--TNT_GT", type=str, default=None)
    args = parser.parse_args()

    if not args.skip_training:
        common = " --quiet --test_iterations 30000 --depth_ratio 1.0 -r 2"
        for scene in TNT_360 + TNT_LARGE:
            os.system(f"{TRAIN} -s {args.TNT_data}/{scene} "
                      f"-m {args.output_path}/{scene}{common}")

    if not args.skip_rendering:
        common = " --quiet --depth_ratio 1.0 --num_cluster 1"
        for scene in TNT_360:
            os.system(f"{RENDER} --iteration 30000 -s {args.TNT_data}/{scene} "
                      f"-m {args.output_path}/{scene}{common} "
                      f"--voxel_size 0.004 --sdf_trunc 0.016 --depth_trunc 3.0")
        for scene in TNT_LARGE:
            os.system(f"{RENDER} --iteration 30000 -s {args.TNT_data}/{scene} "
                      f"-m {args.output_path}/{scene}{common} "
                      f"--voxel_size 0.006 --sdf_trunc 0.024 --depth_trunc 4.5")

    if not args.skip_metrics:
        script_dir = os.path.dirname(os.path.abspath(__file__))
        for scene in TNT_360 + TNT_LARGE:
            ply = f"{args.output_path}/{scene}/train/ours_30000/fuse_post.ply"
            gt = f"{args.TNT_GT}/{scene}"
            # Official protocol inputs: GT-frame COLMAP trajectory +
            # alignment + crop volume (eval_tnt/run.py:110-161). The
            # estimated trajectory is the model dir's cameras.json.
            extra = (
                f" --traj-path {args.output_path}/{scene}/cameras.json"
                f" --gt-log {gt}/{scene}_COLMAP_SfM.log"
                f" --gt-trans {gt}/{scene}_trans.txt"
                f" --crop-json {gt}/{scene}.json"
            )
            mapping = f"{gt}/{scene}_mapping_reference.txt"
            if os.path.exists(mapping):
                extra += f" --map-file {mapping}"
            os.system(
                f"python {script_dir}/eval_tnt_scene.py "
                f"--gt-ply {gt}/{scene}.ply "
                f"--ply-path {ply} --tau {TAU[scene]} "
                f"--out {args.output_path}/{scene}/f1.json" + extra
            )


if __name__ == "__main__":
    main()
