"""`tpu2dgs-metrics` — image-quality evaluation over rendered test sets.

Reference metrics.py:36-102: walks <model>/test/ours_*/{renders,gt}, computes
per-view SSIM/PSNR/LPIPS, writes results.json + per_view.json. LPIPS uses a
VGG backbone; in environments without pretrained weights it degrades
gracefully to None (and says so).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def _load_image_chw(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        arr = np.asarray(im.convert("RGB"), np.float32) / 255.0
    return arr.transpose(2, 0, 1)


def evaluate_dir(method_dir: str, use_lpips: bool = True):
    import jax.numpy as jnp

    from tpu2dgs.train import losses

    renders_dir = os.path.join(method_dir, "renders")
    gt_dir = os.path.join(method_dir, "gt")
    names = sorted(os.listdir(renders_dir))

    lpips_fn = None
    if use_lpips:
        try:
            from tpu2dgs.eval.lpips import lpips_fn as make_lpips

            lpips_fn = make_lpips()
        except Exception as e:  # missing weights, etc.
            print(f"  (LPIPS unavailable: {e})")

    ssims, psnrs, lpipss = [], [], []
    per_view = {"SSIM": {}, "PSNR": {}, "LPIPS": {}}
    for name in names:
        r = jnp.asarray(_load_image_chw(os.path.join(renders_dir, name)))
        g = jnp.asarray(_load_image_chw(os.path.join(gt_dir, name)))
        s = float(losses.ssim(r, g))
        p = float(losses.psnr(r, g))
        ssims.append(s)
        psnrs.append(p)
        per_view["SSIM"][name] = s
        per_view["PSNR"][name] = p
        if lpips_fn is not None:
            l = float(lpips_fn(r, g))
            lpipss.append(l)
            per_view["LPIPS"][name] = l
    summary = {
        "SSIM": float(np.mean(ssims)),
        "PSNR": float(np.mean(psnrs)),
        "LPIPS": float(np.mean(lpipss)) if lpipss else None,
    }
    return summary, per_view


def evaluate(model_paths: list[str], use_lpips: bool = True):
    for model_path in model_paths:
        print("Scene:", model_path)
        full_dict, per_view_dict = {}, {}
        test_dir = os.path.join(model_path, "test")
        try:
            for method in sorted(os.listdir(test_dir)):
                print("Method:", method)
                summary, per_view = evaluate_dir(
                    os.path.join(test_dir, method), use_lpips)
                full_dict[method] = summary
                per_view_dict[method] = per_view
                print(f"  SSIM : {summary['SSIM']:.7f}")
                print(f"  PSNR : {summary['PSNR']:.7f}")
                if summary["LPIPS"] is not None:
                    print(f"  LPIPS: {summary['LPIPS']:.7f}")
            with open(os.path.join(model_path, "results.json"), "w") as f:
                json.dump(full_dict, f, indent=True)
            with open(os.path.join(model_path, "per_view.json"), "w") as f:
                json.dump(per_view_dict, f, indent=True)
        except Exception as e:
            print(f"Unable to compute metrics for model {model_path}: {e}")


def main(argv=None):
    parser = argparse.ArgumentParser(description="tpu2dgs metrics")
    parser.add_argument("--model_paths", "-m", required=True, nargs="+")
    parser.add_argument("--no_lpips", action="store_true")
    args = parser.parse_args(argv)
    evaluate(args.model_paths, use_lpips=not args.no_lpips)


if __name__ == "__main__":
    main()
