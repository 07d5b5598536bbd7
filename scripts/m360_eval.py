"""MipNeRF-360 full-eval harness (reference scripts/m360_eval.py: 9 scenes,
outdoor at images_4, indoor at images_2, 30K iters, then render + metrics)."""

import os
from argparse import ArgumentParser

OUTDOOR = ["bicycle", "flowers", "garden", "stump", "treehill"]
INDOOR = ["room", "counter", "kitchen", "bonsai"]
TRAIN = "python -m tpu2dgs.cli.train"
RENDER = "python -m tpu2dgs.cli.render"
METRICS = "python -m tpu2dgs.cli.metrics"


def main():
    parser = ArgumentParser(description="Full evaluation script parameters")
    parser.add_argument("--skip_training", action="store_true")
    parser.add_argument("--skip_rendering", action="store_true")
    parser.add_argument("--skip_metrics", action="store_true")
    parser.add_argument("--output_path", default="eval/mipnerf360")
    parser.add_argument("--mipnerf360", "-m360", type=str, default=None)
    args = parser.parse_args()
    scenes = OUTDOOR + INDOOR

    if not args.skip_training:
        common = " --quiet --eval --test_iterations 30000"
        for scene in OUTDOOR:
            os.system(f"{TRAIN} -s {args.mipnerf360}/{scene} -i images_4 "
                      f"-m {args.output_path}/{scene}{common}")
        for scene in INDOOR:
            os.system(f"{TRAIN} -s {args.mipnerf360}/{scene} -i images_2 "
                      f"-m {args.output_path}/{scene}{common}")

    if not args.skip_rendering:
        common = " --quiet --eval --skip_train --skip_mesh"
        for scene in scenes:
            os.system(f"{RENDER} --iteration 30000 -s {args.mipnerf360}/{scene} "
                      f"-m {args.output_path}/{scene}{common}")

    if not args.skip_metrics:
        paths = " ".join(f'"{args.output_path}/{s}"' for s in scenes)
        os.system(f"{METRICS} -m {paths}")


if __name__ == "__main__":
    main()
