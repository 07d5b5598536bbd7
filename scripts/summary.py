"""Aggregate per-scene results.json files into one table (reference
scripts/summary.py with pandas)."""

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
        path = os.path.join(args.output_path, scene, "results.json")
        if not os.path.exists(path):
            continue
        with open(path) as f:
            results = json.load(f)
        for method, metrics in results.items():
            rows[scene] = metrics
    if not rows:
        print("no results found")
        return
    df = pd.DataFrame(rows).T
    df.loc["mean"] = df.mean()
    print(df.to_string(float_format=lambda v: f"{v:.4f}"))


if __name__ == "__main__":
    main()
