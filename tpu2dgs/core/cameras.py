"""Camera models and projective geometry.

All matrices use the ROW-VECTOR convention of the reference pipeline
(x_out = x_in_homogeneous @ M), i.e. what the reference stores after its
`.transpose(0, 1)` calls (scene/cameras.py:56-59):

  world_view:  x_view  = x_world_h @ world_view
  full_proj:   x_clip  = x_world_h @ full_proj        (= world_view @ proj)
  ndc2pix:     x_pix_h = x_clip    @ ndc2pix          (homogeneous pixels)

`Camera` is a host-side object holding per-view data; `CameraArrays` is the
pytree of device arrays consumed inside jit (image height/width are static).
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_ZNEAR = 0.01
DEFAULT_ZFAR = 100.0


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal2fov(focal: float, pixels: float) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))


def world_to_view(R: np.ndarray, t: np.ndarray, translate=None, scale: float = 1.0) -> np.ndarray:
    """Row-vector world->view matrix.

    R, t follow COLMAP conventions as stored by the reference readers
    (R = rotmat(qvec).T, t = tvec); matches getWorld2View2 transposed
    (reference utils/graphics_utils.py:44-56 + cameras.py:56).
    """
    if translate is None:
        translate = np.zeros(3)
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = R.transpose()
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    C2W = np.linalg.inv(Rt)
    cam_center = (C2W[:3, 3] + translate) * scale
    C2W[:3, 3] = cam_center
    Rt = np.linalg.inv(C2W)
    return np.float32(Rt).T  # row-vector convention


def projection(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """Row-vector perspective projection (getProjectionMatrix transposed,
    reference utils/graphics_utils.py:58-76 + cameras.py:57)."""
    tan_half_y = math.tan(fovy / 2.0)
    tan_half_x = math.tan(fovx / 2.0)
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 1.0 / tan_half_x
    P[1, 1] = 1.0 / tan_half_y
    P[2, 0] = 0.0  # principal point at image center (pinhole only)
    P[2, 1] = 0.0
    P[2, 2] = zfar / (zfar - znear)
    P[3, 2] = -(zfar * znear) / (zfar - znear)
    P[2, 3] = 1.0
    return P


def ndc_to_pix(width: int, height: int, znear: float, zfar: float):
    """Row-vector NDC->homogeneous-pixel matrix.

    Pixel centers land at integer coordinates 0..W-1 (the (W-1)/2 offset of
    gaussian_renderer/__init__.py:69-73). No perspective divide: output is
    (x*w, y*w, z', w).
    """
    A = jnp.array(
        [
            [width / 2.0, 0.0, 0.0, (width - 1) / 2.0],
            [0.0, height / 2.0, 0.0, (height - 1) / 2.0],
            [0.0, 0.0, zfar - znear, znear],
            [0.0, 0.0, 0.0, 1.0],
        ],
        dtype=jnp.float32,
    )
    return A.T


class CameraArrays(NamedTuple):
    """Device-array view of a camera for use inside jit. H/W are static."""

    world_view: jnp.ndarray  # (4,4) row-vector world->view
    full_proj: jnp.ndarray   # (4,4) row-vector world->clip
    cam_center: jnp.ndarray  # (3,)
    tanfovx: jnp.ndarray     # ()
    tanfovy: jnp.ndarray     # ()
    znear: jnp.ndarray       # ()
    zfar: jnp.ndarray        # ()


@dataclasses.dataclass
class Camera:
    """A posed view. Image data is kept on host (numpy) until the train step."""

    uid: int
    image_name: str
    R: np.ndarray  # (3,3) COLMAP-convention rotation (= rotmat(qvec).T)
    T: np.ndarray  # (3,) COLMAP translation
    fovx: float
    fovy: float
    width: int
    height: int
    image: Optional[np.ndarray] = None       # (3,H,W) float32 in [0,1]
    alpha_mask: Optional[np.ndarray] = None  # (1,H,W) float32 or None
    znear: float = DEFAULT_ZNEAR
    zfar: float = DEFAULT_ZFAR
    trans: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3))
    scale: float = 1.0

    def __post_init__(self):
        self.world_view = world_to_view(self.R, self.T, self.trans, self.scale)
        self.proj = projection(self.znear, self.zfar, self.fovx, self.fovy)
        self.full_proj = self.world_view @ self.proj
        self.cam_center = np.linalg.inv(self.world_view)[3, :3]

    @property
    def tanfovx(self) -> float:
        return math.tan(self.fovx * 0.5)

    @property
    def tanfovy(self) -> float:
        return math.tan(self.fovy * 0.5)

    def arrays(self) -> CameraArrays:
        return CameraArrays(
            world_view=jnp.asarray(self.world_view, jnp.float32),
            full_proj=jnp.asarray(self.full_proj, jnp.float32),
            cam_center=jnp.asarray(self.cam_center, jnp.float32),
            tanfovx=jnp.float32(self.tanfovx),
            tanfovy=jnp.float32(self.tanfovy),
            znear=jnp.float32(self.znear),
            zfar=jnp.float32(self.zfar),
        )


def make_camera_arrays(world_view: jnp.ndarray, znear=DEFAULT_ZNEAR, zfar=DEFAULT_ZFAR,
                       fovx: float = 1.0, fovy: float = 1.0) -> CameraArrays:
    """Build CameraArrays from a row-vector world_view matrix + fovs (for
    viewer MiniCam-style inputs, reference scene/cameras.py:61-72)."""
    world_view = jnp.asarray(world_view, jnp.float32)
    P = jnp.asarray(projection(znear, zfar, fovx, fovy))
    full_proj = world_view @ P
    cam_center = jnp.linalg.inv(world_view)[3, :3]
    return CameraArrays(
        world_view=world_view,
        full_proj=full_proj,
        cam_center=cam_center,
        tanfovx=jnp.float32(math.tan(fovx / 2)),
        tanfovy=jnp.float32(math.tan(fovy / 2)),
        znear=jnp.float32(znear),
        zfar=jnp.float32(zfar),
    )


def view_to_pix_matrix(cam: CameraArrays, width: int, height: int) -> jnp.ndarray:
    """(3,3) row-vector camera-space -> homogeneous-pixel matrix ("intrins"
    transposed; reference utils/point_utils.py:10-16 but with the reference's
    own half-pixel convention: offsets W/2, H/2)."""
    A = jnp.array(
        [
            [width / 2.0, 0.0, 0.0, width / 2.0],
            [0.0, height / 2.0, 0.0, height / 2.0],
            [0.0, 0.0, 0.0, 1.0],
        ],
        dtype=jnp.float32,
    ).T  # (4,3) row-vector ndc->pix(3)
    c2w = jnp.linalg.inv(cam.world_view)
    view2clip = c2w @ cam.full_proj
    return (view2clip @ A)[:3, :3]  # x_pix_h = x_view @ K


def depth_to_points(cam: CameraArrays, depth: jnp.ndarray, width: int, height: int) -> jnp.ndarray:
    """Backproject a (H,W) depth map to world points (H,W,3).

    Mirrors reference utils/point_utils.py:9-24 (ray directions scaled so that
    point = depth * ray_d + origin, with ray_d of unit *view-z*).
    """
    K = view_to_pix_matrix(cam, width, height)  # x_pix_h = x_view @ K
    Kinv = jnp.linalg.inv(K)
    xs = jnp.arange(width, dtype=jnp.float32)
    ys = jnp.arange(height, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")  # (H,W)
    pix = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)  # (H,W,3)
    rays_view = pix @ Kinv  # row-vector: (H,W,3) view-space dirs, z=1
    c2w = jnp.linalg.inv(cam.world_view)
    rays_world = rays_view @ c2w[:3, :3]
    origin = c2w[3, :3]
    return depth[..., None] * rays_world + origin


def depth_to_normal(cam: CameraArrays, depth: jnp.ndarray, width: int, height: int) -> jnp.ndarray:
    """Central-difference world-space normals of the backprojected depth map.

    (H,W,3); border ring is zero (reference utils/point_utils.py:26-37).
    """
    pts = depth_to_points(cam, depth, width, height)
    dx = pts[2:, 1:-1] - pts[:-2, 1:-1]
    dy = pts[1:-1, 2:] - pts[1:-1, :-2]
    n = jnp.cross(dx, dy)
    # Safe normalization with the reference's F.normalize semantics
    # (x / max(|x|, 1e-12), utils/point_utils.py:36). A bare n2 > 0 gate is
    # NOT grad-safe: subnormal |n|^2 makes d(rsqrt)/dn2 ~ n2^-1.5 overflow
    # to inf -> NaN. The eps floor caps the backward slope at 1e12, and the
    # double-where keeps the sqrt's own VJP off the n2 == 0 branch.
    n2 = jnp.sum(n * n, axis=-1, keepdims=True)
    nonzero = n2 > 0.0
    norm = jnp.sqrt(jnp.where(nonzero, n2, 1.0))
    denom = jnp.maximum(jnp.where(nonzero, norm, 0.0), 1e-12)
    n = n / denom
    out = jnp.zeros_like(pts)
    return out.at[1:-1, 1:-1, :].set(n)
