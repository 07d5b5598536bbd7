"""LPIPS perceptual metric in JAX (VGG16 backbone + linear heads).

Reference: lpipsPyTorch/ (SURVEY.md §2.19) — VGG16 relu1_2..relu5_3
features, unit-normalized per channel, squared differences reduced by
learned 1x1 linear heads, spatially averaged and summed over layers.

Weights ship separately (this environment has no torchvision caches and no
egress): `convert_torch_weights` converts a torchvision VGG16 state_dict +
richzhang linear weights into the npz this module loads. Set
TPU2DGS_LPIPS_WEIGHTS or pass `weights_path`. Without weights, callers get
a clear error (cli/metrics.py degrades to PSNR/SSIM-only).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv layout: (out_channels, num_convs) per block
_VGG_BLOCKS = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
# ImageNet normalization used by the reference's ScalingLayer equivalent
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def default_weights_path() -> str:
    return os.environ.get(
        "TPU2DGS_LPIPS_WEIGHTS",
        os.path.join(os.path.dirname(__file__), "weights", "lpips_vgg.npz"),
    )


def load_weights(path: str | None = None) -> dict[str, np.ndarray]:
    path = path or default_weights_path()
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"LPIPS weights not found at {path}. On any machine with "
            "network access run:\n"
            "    python scripts/fetch_lpips_weights.py "
            "--out tpu2dgs/eval/weights/lpips_vgg.npz\n"
            "(downloads + sha-verifies + converts the exact files the "
            "reference fetches), or set TPU2DGS_LPIPS_WEIGHTS to an "
            "existing npz."
        )
    z = np.load(path)
    return {k: z[k] for k in z.files}


def _vgg_features(weights, x):
    """x: (1,3,H,W) in [-1,1] (LPIPS convention). Returns 5 feature maps."""
    x = (x - jnp.asarray(_SHIFT).reshape(1, 3, 1, 1)) / jnp.asarray(
        _SCALE).reshape(1, 3, 1, 1)
    feats = []
    idx = 0
    h = x
    for b, (ch, n_convs) in enumerate(_VGG_BLOCKS):
        for c in range(n_convs):
            w = jnp.asarray(weights[f"conv{idx}_w"])  # (O,I,3,3)
            bias = jnp.asarray(weights[f"conv{idx}_b"])
            h = jax.lax.conv_general_dilated(
                h, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            ) + bias.reshape(1, -1, 1, 1)
            h = jax.nn.relu(h)
            idx += 1
        feats.append(h)
        if b < len(_VGG_BLOCKS) - 1:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
            )
    return feats


def _normalize(feat, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(feat**2, axis=1, keepdims=True))
    return feat / (norm + eps)


def lpips_fn(weights_path: str | None = None):
    """Returns lpips(img1_chw, img2_chw in [0,1]) -> scalar."""
    weights = load_weights(weights_path)

    @jax.jit
    def compute(a, b):
        a = a[None] * 2.0 - 1.0
        b = b[None] * 2.0 - 1.0
        fa = _vgg_features(weights, a)
        fb = _vgg_features(weights, b)
        total = 0.0
        for i, (x, y) in enumerate(zip(fa, fb)):
            d = (_normalize(x) - _normalize(y)) ** 2
            lin = jnp.asarray(weights[f"lin{i}_w"]).reshape(1, -1, 1, 1)
            total = total + jnp.mean(jnp.sum(d * lin, axis=1))
        return total

    return compute


def convert_torch_weights(out_path: str | None = None) -> str:
    """Convert torchvision VGG16 + richzhang LPIPS linear weights to npz.
    Requires torchvision with cached weights (not present in CI images)."""
    import torch
    from torchvision import models

    out_path = out_path or default_weights_path()
    vgg = models.vgg16(weights=models.VGG16_Weights.IMAGENET1K_V1).features
    arrays = {}
    idx = 0
    for m in vgg:
        if isinstance(m, torch.nn.Conv2d):
            arrays[f"conv{idx}_w"] = m.weight.detach().numpy()
            arrays[f"conv{idx}_b"] = m.bias.detach().numpy()
            idx += 1
    url = ("https://raw.githubusercontent.com/richzhang/PerceptualSimilarity/"
           "master/lpips/weights/v0.1/vgg.pth")
    lin = torch.hub.load_state_dict_from_url(url, map_location="cpu")
    for i in range(5):
        arrays[f"lin{i}_w"] = (
            lin[f"lin{i}.model.1.weight"].detach().numpy().reshape(-1)
        )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez(out_path, **arrays)
    return out_path
