"""Aggregate per-scene results into one table (reference scripts/summary.py).

Collects image metrics (results.json), TnT F-scores (f1.json) and DTU
Chamfer (results.json from eval_dtu_scene) under --output_path/<scene>/.
"""

import argparse
import json
import os

import pandas as pd


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--output_path", "-o", required=True)
    args = parser.parse_args()

    rows = {}
    for scene in sorted(os.listdir(args.output_path)):
        scene_dir = os.path.join(args.output_path, scene)
        if not os.path.isdir(scene_dir):
            continue
        row = {}
        res = os.path.join(scene_dir, "results.json")
        if os.path.exists(res):
            with open(res) as f:
                results = json.load(f)
            if results and isinstance(next(iter(results.values())), dict):
                # image metrics keyed by method (ours_30000 ...)
                method = sorted(results)[-1]
                row.update({k: v for k, v in results[method].items()
                            if v is not None})
            else:
                row.update({k: v for k, v in results.items()
                            if isinstance(v, (int, float))})
        f1 = os.path.join(scene_dir, "f1.json")
        if os.path.exists(f1):
            with open(f1) as f:
                row.update(json.load(f))
        if row:
            rows[scene] = row
    if not rows:
        print("no results found")
        return
    df = pd.DataFrame(rows).T
    df.loc["mean"] = df.mean(numeric_only=True)
    print(df.to_string(float_format=lambda v: f"{v:.4f}"))


if __name__ == "__main__":
    main()
