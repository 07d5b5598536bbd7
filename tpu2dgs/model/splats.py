"""Splat parameter store — the TPU-native `GaussianModel` equivalent.

The reference (scene/gaussian_model.py:24-255) holds six dynamically-sized
torch Parameters and reallocates them (plus Adam state) on every densify.
XLA wants static shapes, so here the arrays are PADDED to a fixed capacity
with a `live` mask; densification is a masked pure function and "optimizer
state surgery" (reference lines 257-326) becomes zeroing rows. Capacity
growth is a host-side re-pad at a recompile boundary.

Parameter semantics match the reference exactly so PLY checkpoints are
bit-compatible (SURVEY.md §5 checkpoint contract):
  xyz (C,3) world positions
  features_dc (C,1,3), features_rest (C,K-1,3) SH coefficients
  scaling (C,2) log tangential scales          (activation: exp)
  rotation (C,4) raw wxyz quaternion           (activation: normalize)
  opacity (C,1) logit                          (activation: sigmoid)
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from tpu2dgs.core import sh as sh_lib
from tpu2dgs.core.transforms import inverse_sigmoid
from tpu2dgs.model.knn import mean_dist2_to_3nn

INIT_OPACITY = 0.1  # reference scene/gaussian_model.py:138


class SplatParams(NamedTuple):
    """The trainable leaves (every array padded to capacity C)."""

    xyz: jnp.ndarray            # (C,3)
    features_dc: jnp.ndarray    # (C,1,3)
    features_rest: jnp.ndarray  # (C,K-1,3)
    scaling: jnp.ndarray        # (C,2) log
    rotation: jnp.ndarray       # (C,4) wxyz raw
    opacity: jnp.ndarray        # (C,1) logit


class SplatModel(NamedTuple):
    """Parameters + live mask + densification statistics (a jit-safe pytree)."""

    params: SplatParams
    live: jnp.ndarray         # (C,) bool
    max_radii2d: jnp.ndarray  # (C,) f32 — max screen radius seen (prune input)
    grad_accum: jnp.ndarray   # (C,) f32 — sum ||dL/dmean2d|| over iters
    denom: jnp.ndarray        # (C,) f32 — number of iters the splat was visible

    @property
    def capacity(self) -> int:
        return self.params.xyz.shape[0]

    def num_live(self) -> jnp.ndarray:
        return jnp.sum(self.live)


def features(params: SplatParams) -> jnp.ndarray:
    """(C,K,3) full SH coefficient stack (reference get_features)."""
    return jnp.concatenate([params.features_dc, params.features_rest], axis=1)


def round_capacity(n: int, multiple: int = 4096) -> int:
    """Pad capacity granularity: multiples of 4096 keep shapes lane-aligned
    and bound the number of distinct compiled programs."""
    return max(multiple, int(math.ceil(n / multiple)) * multiple)


def empty_model(capacity: int, sh_degree: int = 3) -> SplatModel:
    k = sh_lib.num_sh_coeffs(sh_degree)
    f32 = jnp.float32
    params = SplatParams(
        xyz=jnp.zeros((capacity, 3), f32),
        features_dc=jnp.zeros((capacity, 1, 3), f32),
        features_rest=jnp.zeros((capacity, k - 1, 3), f32),
        scaling=jnp.zeros((capacity, 2), f32),
        rotation=jnp.zeros((capacity, 4), f32).at[:, 0].set(1.0),
        opacity=jnp.zeros((capacity, 1), f32),
    )
    z = jnp.zeros((capacity,), f32)
    return SplatModel(
        params=params,
        live=jnp.zeros((capacity,), bool),
        max_radii2d=z,
        grad_accum=z,
        denom=z,
    )


def _knn_dist2(points_np, pts_jnp) -> jnp.ndarray:
    """Init-scale 3-NN distances: native Morton KNN for big clouds (COLMAP
    reaches millions of points where the exact O(N^2) sweep is infeasible),
    exact blocked jnp otherwise."""
    n = pts_jnp.shape[0]
    if n > 65536:
        from tpu2dgs import native

        if native.available():
            return jnp.asarray(
                native.knn_mean_dist2(np.asarray(points_np, np.float32)))
    return mean_dist2_to_3nn(pts_jnp)


def create_from_pcd(
    points: np.ndarray,       # (N,3)
    colors: np.ndarray,       # (N,3) RGB in [0,1]
    sh_degree: int = 3,
    capacity: int | None = None,
) -> SplatModel:
    """Reference create_from_pcd semantics (scene/gaussian_model.py:124-146):
    isotropic log-scale from 3-NN mean distance, identity rotations,
    opacity 0.1, DC color from RGB."""
    n = points.shape[0]
    cap = capacity or round_capacity(n)
    model = empty_model(cap, sh_degree)

    pts = jnp.asarray(points, jnp.float32)
    dist2 = jnp.clip(_knn_dist2(points, pts), 1e-7, None)
    log_scale = jnp.log(jnp.sqrt(dist2))  # (N,)

    p = model.params
    p = p._replace(
        xyz=p.xyz.at[:n].set(pts),
        features_dc=p.features_dc.at[:n, 0, :].set(
            sh_lib.rgb_to_sh(jnp.asarray(colors, jnp.float32))
        ),
        scaling=p.scaling.at[:n].set(log_scale[:, None]),
        opacity=p.opacity.at[:n].set(float(inverse_sigmoid(INIT_OPACITY))),
    )
    return model._replace(params=p, live=model.live.at[:n].set(True))


def grow_capacity(model: SplatModel, new_capacity: int,
                  segments: int = 1) -> SplatModel:
    """Re-pad every per-splat array (host-side; forces recompilation).

    With `segments` = S > 1 (gaussian parallelism: the capacity axis is
    sharded into S contiguous blocks and densification compacts children
    into free slots of their own block, model/densify.py) the new free
    rows are SPREAD ACROSS the segments — each old segment keeps its rows
    and gains extra/S free slots at its end. A plain end-pad would leave
    every previously-full segment full after re-sharding (new segment j
    would cover two old full segments), so dense regions could never
    densify again no matter how often capacity doubled."""
    assert new_capacity >= model.capacity
    c = model.capacity
    extra = new_capacity - c
    if extra == 0:
        return model
    s = segments
    assert c % s == 0 and extra % s == 0, (c, new_capacity, s)

    def pad(a):
        seg = a.reshape(s, c // s, *a.shape[1:])
        widths = [(0, 0), (0, extra // s)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(seg, widths).reshape(new_capacity, *a.shape[1:])

    params = SplatParams(*(pad(a) for a in model.params))
    old = pad(jnp.ones((c,), bool))  # marks pre-existing rows
    params = params._replace(
        rotation=params.rotation.at[:, 0].set(
            jnp.where(old, params.rotation[:, 0], 1.0))
    )
    return SplatModel(
        params=params,
        live=pad(model.live),
        max_radii2d=pad(model.max_radii2d),
        grad_accum=pad(model.grad_accum),
        denom=pad(model.denom),
    )


# ---------------------------------------------------------------------------
# PLY interchange (bit-compatible with the reference + ecosystem viewers;
# reference scene/gaussian_model.py:176-255). Self-contained binary PLY codec
# (no plyfile dependency).
# ---------------------------------------------------------------------------


def _ply_attribute_names(num_rest: int) -> list[str]:
    names = ["x", "y", "z", "nx", "ny", "nz"]
    names += [f"f_dc_{i}" for i in range(3)]
    names += [f"f_rest_{i}" for i in range(num_rest * 3)]
    names += ["opacity", "scale_0", "scale_1"]
    names += [f"rot_{i}" for i in range(4)]
    return names


def save_ply(model: SplatModel, path: str) -> None:
    """Write live splats in the reference attribute layout (float32 LE)."""
    live = np.asarray(model.live)
    p = model.params
    xyz = np.asarray(p.xyz)[live]
    n = xyz.shape[0]
    num_rest = p.features_rest.shape[1]
    # (N,1,3)->(N,3) and (N,R,3)->(N,3,R)->flat: channel-major, matching the
    # reference's transpose(1,2).flatten (gaussian_model.py:181-182).
    f_dc = np.asarray(p.features_dc)[live].transpose(0, 2, 1).reshape(n, -1)
    f_rest = np.asarray(p.features_rest)[live].transpose(0, 2, 1).reshape(n, -1)
    cols = np.concatenate(
        [
            xyz,
            np.zeros((n, 3), np.float32),  # nx, ny, nz
            f_dc,
            f_rest,
            np.asarray(p.opacity)[live],
            np.asarray(p.scaling)[live],
            np.asarray(p.rotation)[live],
        ],
        axis=1,
    ).astype("<f4")

    names = _ply_attribute_names(num_rest)
    assert cols.shape[1] == len(names)
    header = ["ply", "format binary_little_endian 1.0", f"element vertex {n}"]
    header += [f"property float {name}" for name in names]
    header += ["end_header"]
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        f.write(cols.tobytes())


def _parse_ply_header(f):
    magic = f.readline().strip()
    if magic != b"ply":
        raise ValueError("not a PLY file")
    fmt = None
    count = 0
    props: list[tuple[str, str]] = []
    while True:
        line = f.readline()
        if not line:
            raise ValueError("unterminated PLY header")
        tok = line.decode("ascii", "replace").strip().split()
        if not tok:
            continue
        if tok[0] == "format":
            fmt = tok[1]
        elif tok[0] == "element" and tok[1] == "vertex":
            count = int(tok[2])
        elif tok[0] == "property" and len(tok) == 3:
            props.append((tok[2], tok[1]))
        elif tok[0] == "end_header":
            break
    return fmt, count, props


_PLY_DTYPES = {
    "float": "<f4", "float32": "<f4", "double": "<f8", "float64": "<f8",
    "uchar": "u1", "uint8": "u1", "char": "i1", "int8": "i1",
    "short": "<i2", "ushort": "<u2", "int": "<i4", "uint": "<u4",
}


def read_ply_vertices(path: str) -> dict[str, np.ndarray]:
    """Read a binary/ascii PLY vertex element into {name: (N,) array}."""
    with open(path, "rb") as f:
        fmt, count, props = _parse_ply_header(f)
        if fmt == "ascii":
            data = np.loadtxt(f, dtype=np.float64, max_rows=count)
            data = data.reshape(count, len(props))
            return {name: data[:, i].astype(np.float32)
                    for i, (name, _) in enumerate(props)}
        if fmt != "binary_little_endian":
            raise ValueError(f"unsupported PLY format {fmt!r}")
        dtype = np.dtype([(name, _PLY_DTYPES[t]) for name, t in props])
        raw = np.frombuffer(f.read(dtype.itemsize * count), dtype=dtype)
        return {name: np.ascontiguousarray(raw[name]) for name, _ in props}


def load_ply(path: str, sh_degree: int = 3,
             capacity: int | None = None) -> SplatModel:
    """Load a reference-format splat PLY (scene/gaussian_model.py:214-255).

    Note the reference jumps active_sh_degree to max on load (line 255);
    callers should do the same.
    """
    v = read_ply_vertices(path)
    n = v["x"].shape[0]
    k = sh_lib.num_sh_coeffs(sh_degree)
    num_rest = k - 1

    xyz = np.stack([v["x"], v["y"], v["z"]], axis=1)
    f_dc = np.stack([v[f"f_dc_{i}"] for i in range(3)], axis=1)[:, None, :]
    rest_names = sorted(
        (name for name in v if name.startswith("f_rest_")),
        key=lambda s: int(s.split("_")[-1]),
    )
    assert len(rest_names) == num_rest * 3, (len(rest_names), num_rest)
    # stored channel-major (3, R) per splat -> (N,R,3)
    f_rest = np.stack([v[name] for name in rest_names], axis=1)
    f_rest = f_rest.reshape(n, 3, num_rest).transpose(0, 2, 1)
    opacity = v["opacity"][:, None]
    scaling = np.stack([v["scale_0"], v["scale_1"]], axis=1)
    rotation = np.stack([v[f"rot_{i}"] for i in range(4)], axis=1)

    cap = capacity or round_capacity(n)
    model = empty_model(cap, sh_degree)
    p = model.params
    p = p._replace(
        xyz=p.xyz.at[:n].set(xyz),
        features_dc=p.features_dc.at[:n].set(f_dc),
        features_rest=p.features_rest.at[:n].set(f_rest),
        scaling=p.scaling.at[:n].set(scaling),
        rotation=p.rotation.at[:n].set(rotation),
        opacity=p.opacity.at[:n].set(opacity),
    )
    return model._replace(params=p, live=model.live.at[:n].set(True))
