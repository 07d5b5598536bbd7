"""Deterministic LPIPS(vgg) weight fetch + convert + golden generation.

Run on any machine WITH network + torchvision:

    python scripts/fetch_lpips_weights.py \
        --out tpu2dgs/eval/weights/lpips_vgg.npz

It (1) downloads the torchvision VGG16 ImageNet weights and the richzhang
LPIPS v0.1 linear heads (the exact files the reference fetches,
/root/reference/lpipsPyTorch/modules/utils.py:11-20 + torchvision hub),
(2) verifies their SHA-256 prefixes, (3) converts to the npz layout
`tpu2dgs.eval.lpips` loads, and (4) if the `lpips` pip package is
importable, computes GOLDEN distances for a fixed deterministic image pair
and stores them in the npz — `tests/test_lpips.py::test_lpips_golden`
then proves numerical parity of the JAX implementation against the
reference implementation on any machine, offline.
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys

import numpy as np

# torchvision filename embeds the first 8 sha256 hex chars; verify them.
VGG16_URL = "https://download.pytorch.org/models/vgg16-397923af.pth"
VGG16_SHA_PREFIX = "397923af"
LIN_URL = ("https://raw.githubusercontent.com/richzhang/PerceptualSimilarity/"
           "master/lpips/weights/v0.1/vgg.pth")


def _fetch(url: str, dest: str, sha_prefix: str | None = None) -> str:
    import urllib.request

    if not os.path.exists(dest):
        print(f"fetching {url}")
        urllib.request.urlretrieve(url, dest)
    if sha_prefix:
        h = hashlib.sha256(open(dest, "rb").read()).hexdigest()
        if not h.startswith(sha_prefix):
            raise RuntimeError(f"sha256 mismatch for {dest}: {h}")
    return dest


def golden_pair():
    """Deterministic image pair for the parity golden (fixed seed)."""
    rng = np.random.default_rng(1234)
    a = rng.random((3, 64, 64)).astype(np.float32)
    b = np.clip(a + 0.2 * rng.standard_normal((3, 64, 64)).astype(np.float32),
                0.0, 1.0)
    return a, b


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default=None)
    parser.add_argument("--cache", default="/tmp/lpips_fetch")
    args = parser.parse_args(argv)

    import torch

    os.makedirs(args.cache, exist_ok=True)
    vgg_path = _fetch(VGG16_URL, os.path.join(args.cache, "vgg16.pth"),
                      VGG16_SHA_PREFIX)
    lin_path = _fetch(LIN_URL, os.path.join(args.cache, "lin_vgg.pth"))

    sd = torch.load(vgg_path, map_location="cpu")
    arrays = {}
    # torchvision VGG16 `features` conv indices in order:
    conv_keys = [k[:-7] for k in sd if k.startswith("features")
                 and k.endswith(".weight")][:13]
    for idx, key in enumerate(conv_keys):
        arrays[f"conv{idx}_w"] = sd[f"{key}.weight"].numpy()
        arrays[f"conv{idx}_b"] = sd[f"{key}.bias"].numpy()
    lin = torch.load(lin_path, map_location="cpu")
    for i in range(5):
        arrays[f"lin{i}_w"] = (
            lin[f"lin{i}.model.1.weight"].numpy().reshape(-1))

    # Golden parity values against the pip `lpips` reference, if available.
    try:
        import lpips as lpips_ref

        net = lpips_ref.LPIPS(net="vgg")
        a, b = golden_pair()
        ta = torch.from_numpy(a[None] * 2.0 - 1.0)
        tb = torch.from_numpy(b[None] * 2.0 - 1.0)
        with torch.no_grad():
            arrays["golden_ab"] = np.float32(net(ta, tb).item())
            arrays["golden_aa"] = np.float32(net(ta, ta).item())
        print("goldens:", arrays["golden_ab"], arrays["golden_aa"])
    except ImportError:
        print("pip `lpips` not importable: npz written without goldens",
              file=sys.stderr)

    from tpu2dgs.eval.lpips import default_weights_path

    out = args.out or default_weights_path()
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez(out, **arrays)
    print(f"wrote {out} ({len(arrays)} arrays)")


if __name__ == "__main__":
    main()
