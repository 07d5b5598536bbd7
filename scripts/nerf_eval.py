"""NeRF-synthetic full-eval harness (reference scripts/nerf_eval.py: 8
scenes, white background, lambda_normal 0, device-pool dispatch).

The reference schedules per-scene jobs over a GPU pool with GPUtil +
ThreadPoolExecutor (scripts/nerf_eval.py:51-86); on a TPU host the pool is
the set of visible chips — jobs are pinned round-robin via
JAX_DEFAULT_DEVICE-style env isolation (one process per scene)."""

import os
import subprocess
from argparse import ArgumentParser
from concurrent.futures import ThreadPoolExecutor

SCENES = ["chair", "drums", "ficus", "hotdog", "lego", "materials", "mic", "ship"]
TRAIN = "python -m tpu2dgs.cli.train"
RENDER = "python -m tpu2dgs.cli.render"
METRICS = "python -m tpu2dgs.cli.metrics"


def main():
    parser = ArgumentParser(description="Full evaluation script parameters")
    parser.add_argument("--skip_training", action="store_true")
    parser.add_argument("--skip_rendering", action="store_true")
    parser.add_argument("--skip_metrics", action="store_true")
    parser.add_argument("--output_path", default="eval/nerf_synthetic")
    parser.add_argument("--nerf_synthetic", "-ns", type=str, default=None)
    parser.add_argument("--parallel", type=int, default=1,
                        help="concurrent scene jobs (1 per chip)")
    args = parser.parse_args()

    jobs = []
    if not args.skip_training:
        common = " --quiet --eval -w --lambda_normal 0.0 --test_iterations 30000"
        for scene in SCENES:
            jobs.append(f"{TRAIN} -s {args.nerf_synthetic}/{scene} "
                        f"-m {args.output_path}/{scene}{common}")
    if jobs:
        with ThreadPoolExecutor(max_workers=max(1, args.parallel)) as pool:
            list(pool.map(lambda c: subprocess.call(c, shell=True), jobs))

    if not args.skip_rendering:
        common = " --quiet --eval --skip_train --skip_mesh"
        for scene in SCENES:
            os.system(f"{RENDER} --iteration 30000 "
                      f"-s {args.nerf_synthetic}/{scene} "
                      f"-m {args.output_path}/{scene}{common}")

    if not args.skip_metrics:
        paths = " ".join(f'"{args.output_path}/{s}"' for s in SCENES)
        os.system(f"{METRICS} -m {paths}")


if __name__ == "__main__":
    main()
