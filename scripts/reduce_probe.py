"""MEASURED comparison of per-splat moment-reduction strategies (bwd).

The backward kernel's 16 sublane reductions per entry are 43% of its time
(ROADMAP ablation). Round-2 rejected MXU-batched reductions on paper
("relayout tax exceeds savings at every layout"); this measures the
primitive head-to-head so the rejection (or a win) is empirical:

  A. VPU: 16x sublane-reduce of (16,128) planes -> (1,128) rows + stores
     into the flat scratch (the shipping design's inner step).
  B. MXU: store each plane into a (256,128) scratch slab, then one
     exact {0,1}-selector matmul per 16 planes via the 3-way mantissa
     split (bf16-exact), reducing all planes' sublanes at once.

Both kernels process the same synthetic workload: STEPS iterations of 16
fresh planes derived from a resident input (so neither can hoist work).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import tpu2dgs  # noqa: E402

BY, BX = 16, 128
NPLANES = 16
STEPS = 512


def _mk_planes(base, s, k):
    # cheap, un-hoistable plane: varies with step s and plane k
    f = (s * NPLANES + k + 1).astype(jnp.float32)
    return base * f + f


def kernel_vpu(in_ref, out_ref, scratch):
    base = in_ref[0]
    def body(s, acc):
        for k in range(NPLANES):
            p = _mk_planes(base, s, k)
            row = jnp.sum(p, axis=0, keepdims=True)          # sublane reduce
            acc = acc + row * (k + 1)   # consume each row (no store dep)
        return acc
    acc = lax.fori_loop(0, STEPS, body, jnp.zeros((1, BX), jnp.float32))
    out_ref[0, 0] = acc[0, 0]


def kernel_mxu(in_ref, out_ref, scratch):
    base = in_ref[0]
    # selector: (NPLANES, NPLANES*BY) summing each plane's 16 sublanes
    rows = lax.broadcasted_iota(jnp.int32, (NPLANES, NPLANES * BY), 0)
    cols = lax.broadcasted_iota(jnp.int32, (NPLANES, NPLANES * BY), 1)
    sel = (cols // BY == rows).astype(jnp.float32)
    top16 = jnp.uint32(0xFFFF0000)

    def body(s, acc):
        for k in range(NPLANES):
            p = _mk_planes(base, s, k)
            scratch[pl.ds(k * BY, BY), :] = p                 # plane store
        slab = scratch[:, :]                                  # (256, 128)
        hi = pltpu.bitcast(pltpu.bitcast(slab, jnp.uint32) & top16,
                           jnp.float32)
        rem = slab - hi
        mid = pltpu.bitcast(pltpu.bitcast(rem, jnp.uint32) & top16,
                            jnp.float32)
        lo = rem - mid
        out = None
        for part in (hi, mid, lo):
            r = lax.dot_general(sel, part, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=lax.Precision.DEFAULT)
            out = r if out is None else out + r               # (16, 128)
        return acc + jnp.sum(out * w16, axis=0, keepdims=True)
    w16 = (lax.broadcasted_iota(jnp.int32, (NPLANES, BX), 0) + 1).astype(
        jnp.float32)
    acc = lax.fori_loop(0, STEPS, body, jnp.zeros((1, BX), jnp.float32))
    out_ref[0, 0] = acc[0, 0]


def run(kernel, scratch_shape, name):
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, BY, BX))
    f = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec((1, BY, BX), lambda i: (0, 0, 0))],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM(scratch_shape, jnp.float32)],
    )
    g = jax.jit(lambda a: f(a)[0, 0] * 1e-30)
    float(g(x))
    t0 = time.perf_counter()
    iters = 20
    for _ in range(iters):
        v = g(x)
    float(v)
    dt = (time.perf_counter() - t0) / iters
    per_entry = dt / STEPS * 1e9
    print(f"{name}: {dt * 1e3:8.3f} ms/call  "
          f"{per_entry:7.1f} ns per 16-plane reduction set", flush=True)
    return dt


def main():
    tpu2dgs.enable_compilation_cache()
    run(kernel_vpu, (2, 8, BX), "A sublane-reduce (VPU)")
    run(kernel_mxu, (NPLANES * BY, BX), "B selector-matmul (MXU)")


if __name__ == "__main__":
    main()
