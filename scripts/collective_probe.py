"""Measure splat-sharded collective volume: all-gather vs strip-routed.

Lowers the full splat-sharded train-style step (render fwd+bwd) on the
8-virtual-CPU mesh for xfer_capacity = 0 (all-gather every survivor) and
a routed capacity, then sums the bytes moved by every collective in the
OPTIMIZED HLO (all-gather / all-to-all / reduce-scatter / all-reduce /
collective-permute). This is the deployable bytes/frame measurement the
one-chip environment permits — the op set and shapes are exactly what a
real mesh would execute; only link speed differs.

Usage: python scripts/collective_probe.py [N_log2] [W]
(The 8-virtual-CPU env is forced IN-PROCESS: the machine's axon
sitecustomize overwrites shell-level XLA_FLAGS at interpreter startup, so
an exported flag silently yields a 1-device mesh — measured round 5.)
"""

import os
import re
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8"
                               ).strip()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# The axon sitecustomize sets jax_platforms via jax.config (which beats
# the env var): force CPU the same way tests/conftest.py does.
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu2dgs.eval.synthetic import make_bench_scene  # noqa: E402
from tpu2dgs.parallel.sharded import make_mesh  # noqa: E402
from tpu2dgs.raster.api import RasterSettings, render  # noqa: E402

_DTYPE_BYTES = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2,
                "s16": 2, "u16": 2, "pred": 1, "s8": 1, "u8": 1, "f64": 8,
                "s64": 8, "u64": 8}
_COLLECTIVES = ("all-gather", "all-to-all", "reduce-scatter", "all-reduce",
                "collective-permute")


def collective_bytes(hlo_text: str):
    """Sum output bytes of every collective op, per op kind."""
    out = {}
    for line in hlo_text.splitlines():
        m = re.search(r"=\s*((?:\([^)]*\)|\S+))\s+(" +
                      "|".join(_COLLECTIVES) + r")\(", line)
        if not m:
            continue
        shapes, kind = m.group(1), m.group(2)
        total = 0
        for dt, dims in re.findall(r"(\w+)\[([\d,]*)\]", shapes):
            if dt not in _DTYPE_BYTES:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total += n * _DTYPE_BYTES[dt]
        out[kind] = out.get(kind, 0) + total
    return out


def main():
    n = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 14)
    w = h = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    mesh = make_mesh(8)
    cam, scene = make_bench_scene(w, h, n)
    bg = jnp.zeros(3, jnp.float32)
    k_loc = n // 8

    def measure(label, settings, shard_splats):
        def loss(xyz, scaling, rotation, opacity, features):
            out = render(cam, settings, xyz, scaling, rotation, opacity,
                         features, bg, mesh=mesh,
                         shard_splats=shard_splats)
            return jnp.sum(out["render"] ** 2) + jnp.sum(out["rend_dist"])

        txt = (jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
               .lower(*scene).compile().as_text())
        per_kind = collective_bytes(txt)
        total = sum(per_kind.values())
        print(f"{label}: {total/1e6:.2f} MB/frame total")
        for k, v in sorted(per_kind.items()):
            print(f"    {k:20s} {v/1e6:8.2f} MB")

    base = dict(width=w, height=h, sh_degree=3, backend="pallas",
                debug=True, bin_capacity=2048, tile_capacity=1024)
    # Gaussian parallelism: all-gather vs strip-routed exchange.
    for label, xfer in [("splats all-gather (xfer=0)", 0),
                        (f"splats routed (xfer={max(256, k_loc // 4)})",
                         max(256, k_loc // 4))]:
        measure(label, RasterSettings(**base, xfer_capacity=xfer), True)
    # Tile-row sharding: static strips vs balanced windows (the balanced
    # row-gather reassembly is the only extra collective; the dominant
    # term either way is the replicated-splat gradient psum).
    for mode in ("static", "work"):
        measure(f"rows row_balance={mode}",
                RasterSettings(**base, row_balance=mode), False)


if __name__ == "__main__":
    main()
