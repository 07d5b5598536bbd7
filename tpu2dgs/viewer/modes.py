"""Viewer render modes: RGB / alpha / normal / depth / edge / curvature.

Reference utils/image_utils.py:23-61 (sobel gradient map, turbo colormap,
render_net_image mode mux). jnp implementation; single-channel outputs get
turbo-colormapped for display.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# A 64-entry turbo colormap sampled from the standard polynomial fit (the
# reference uses matplotlib's 256-entry table; linear interpolation between
# 64 anchors is visually identical at 8-bit display depth).


def _turbo_anchor(x: np.ndarray) -> np.ndarray:
    # polynomial approximation of the Google turbo colormap
    r = 0.13572138 + 4.61539260 * x - 42.66032258 * x**2 + 132.13108234 * x**3 \
        - 152.94239396 * x**4 + 59.28637943 * x**5
    g = 0.09140261 + 2.19418839 * x + 4.84296658 * x**2 - 14.18503333 * x**3 \
        + 4.27729857 * x**4 + 2.82956604 * x**5
    b = 0.10667330 + 12.64194608 * x - 60.58204836 * x**2 + 110.36276771 * x**3 \
        - 89.90310912 * x**4 + 27.34824973 * x**5
    return np.clip(np.stack([r, g, b], axis=-1), 0.0, 1.0)


_TURBO = jnp.asarray(_turbo_anchor(np.linspace(0.0, 1.0, 256)), jnp.float32)


def colormap(map_1hw: jnp.ndarray) -> jnp.ndarray:
    """(1,H,W) -> (3,H,W) turbo-mapped, min-max normalized."""
    m = map_1hw[0]
    lo, hi = jnp.min(m), jnp.max(m)
    t = (m - lo) / jnp.maximum(hi - lo, 1e-12)
    idx = jnp.clip(jnp.round(t * 255.0).astype(jnp.int32), 0, 255)
    return jnp.transpose(_TURBO[idx], (2, 0, 1))


def gradient_map(image_chw: jnp.ndarray) -> jnp.ndarray:
    """Sobel edge magnitude (1,H,W) of a (C,H,W) image."""
    sx = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32) / 4.0
    sy = sx.T
    img = image_chw[:, None]  # (C,1,H,W)
    dn = jax.lax.conv_dimension_numbers(
        img.shape, (1, 1, 3, 3), ("NCHW", "OIHW", "NCHW"))
    gx = jax.lax.conv_general_dilated(
        img, sx[None, None], (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn)
    gy = jax.lax.conv_general_dilated(
        img, sy[None, None], (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn)
    mag = jnp.sqrt(gx**2 + gy**2)[:, 0]          # (C,H,W)
    return jnp.linalg.norm(mag, axis=0, keepdims=True)


def render_net_image(render_pkg: dict, render_items: list[str],
                     render_mode: int) -> jnp.ndarray:
    """(3,H,W) display image for the selected viewer mode."""
    output = render_items[render_mode].lower()
    if output == "alpha":
        net_image = render_pkg["rend_alpha"]
    elif output == "normal":
        net_image = (render_pkg["rend_normal"] + 1.0) / 2.0
    elif output == "depth":
        net_image = render_pkg["surf_depth"]
    elif output == "edge":
        net_image = gradient_map(render_pkg["render"])
    elif output == "curvature":
        net_image = gradient_map((render_pkg["rend_normal"] + 1.0) / 2.0)
    else:
        net_image = render_pkg["render"]
    if net_image.shape[0] == 1:
        net_image = colormap(net_image)
    return net_image
