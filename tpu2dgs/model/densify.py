"""Densification: clone / split / prune under static shapes.

Reference semantics (scene/gaussian_model.py:328-407, train.py:126-135):
every 100 iters in [500, 15000), splats with mean screen-space gradient
>= 2e-4 are cloned (if small) or split into 2 (if larger than
percent_dense * scene_extent); splats with opacity < 0.05 (and, after the
first opacity reset, screen radius > 20px or world size > 0.1 * extent) are
pruned. The reference reallocates tensors + Adam state ("optimizer state
surgery"); here capacity is fixed and everything is masked scatter writes:

  * children (1 clone copy or 2 split samples per selected source) are
    compacted into free (dead) slots via a sort-based rank -> slot mapping,
  * overflow beyond free capacity drops the lowest-priority children and is
    reported so the host can grow capacity at the next recompile boundary,
  * Adam moments of changed rows are zeroed (optim.surgery).

All functions are pure and jit-compatible.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpu2dgs.core.transforms import inverse_sigmoid, quat_to_rotmat
from tpu2dgs.model import optim as optim_lib
from tpu2dgs.model.splats import SplatModel, SplatParams


@dataclasses.dataclass(frozen=True)
class DensifyConfig:
    """Defaults of record (reference arguments/__init__.py:73-95)."""

    grad_threshold: float = 2e-4
    percent_dense: float = 0.01
    opacity_cull: float = 0.05
    size_screen: float = 20.0   # max_radii2d prune threshold (px)
    size_world: float = 0.1     # * extent
    split_n: int = 2
    split_shrink: float = 0.8   # new scale = old / (split_shrink * split_n)


class DensifyInfo(NamedTuple):
    num_cloned: jnp.ndarray
    num_split: jnp.ndarray
    num_pruned: jnp.ndarray
    num_dropped: jnp.ndarray  # children lost to capacity overflow
    num_live: jnp.ndarray


def add_stats(model: SplatModel, mean2d_grad: jnp.ndarray,
              radii: jnp.ndarray) -> SplatModel:
    """Accumulate screen-space gradient norms for visible splats and track
    max screen radius (reference add_densification_stats + train.py:128-131).
    """
    visible = radii > 0
    g = jnp.linalg.norm(mean2d_grad, axis=-1)
    return model._replace(
        grad_accum=model.grad_accum + jnp.where(visible, g, 0.0),
        denom=model.denom + visible.astype(model.denom.dtype),
        max_radii2d=jnp.where(
            visible,
            jnp.maximum(model.max_radii2d, radii.astype(jnp.float32)),
            model.max_radii2d,
        ),
    )


def densify_and_prune(
    cfg: DensifyConfig,
    model: SplatModel,
    adam: optim_lib.AdamState,
    key: jax.Array,
    extent,
    use_size_prune,  # bool: True once opacity resets started (train.py:132)
    segments: int = 1,
):
    """One densification round. Returns (model, adam, DensifyInfo).

    `segments` partitions the capacity axis into S contiguous blocks and
    compacts children into free slots OF THEIR OWN BLOCK — the
    sharding-preserving formulation for gaussian parallelism: with
    segments = mesh size, the rank cumsum, the free-slot argsort, and the
    child scatter all run per-block (batched ops over a leading S axis
    GSPMD shards with zero collectives), so model + Adam state stay 1/D
    per device through densification. segments=1 is the exact global
    compaction. A block whose children exceed its local free slots drops
    the overflow (num_dropped; the Trainer's capacity growth heals it) —
    same capacity-bounded semantics as the global form, applied per block.
    """
    p = model.params
    c = model.capacity
    live = model.live
    assert c % segments == 0, (c, segments)

    grads = jnp.where(model.denom > 0, model.grad_accum / jnp.maximum(model.denom, 1.0), 0.0)
    scale_act = jnp.exp(p.scaling)          # (C,2)
    max_scale = jnp.max(scale_act, axis=1)  # (C,)
    opacity_act = jax.nn.sigmoid(p.opacity[:, 0])

    hot = live & (grads >= cfg.grad_threshold)
    small = max_scale <= cfg.percent_dense * extent
    clone_mask = hot & small
    split_mask = hot & ~small

    prune_mask = live & (opacity_act < cfg.opacity_cull)
    size_prune = live & (
        (model.max_radii2d > cfg.size_screen)
        | (max_scale > cfg.size_world * extent)
    )
    prune_mask = prune_mask | (use_size_prune & size_prune)

    # Split originals are consumed (reference densify_and_split prune_filter).
    live_after = live & ~prune_mask & ~split_mask

    # --- children -----------------------------------------------------------
    # child j in {0, 1}: j=0 exists for clones and splits, j=1 only for splits.
    rot = quat_to_rotmat(p.rotation)  # (C,3,3)
    eps = jax.random.normal(key, (cfg.split_n, c, 2), p.xyz.dtype)
    # local in-plane displacement (third axis has zero std —
    # reference gaussian_model.py:357-358), world = R @ local
    delta_local = eps * scale_act[None, :, :]                   # (J,C,2)
    delta_world = (
        rot[None, :, :, 0] * delta_local[:, :, 0:1]
        + rot[None, :, :, 1] * delta_local[:, :, 1:2]
    )  # (J,C,3)

    split_scaling = jnp.log(scale_act / (cfg.split_shrink * cfg.split_n))

    def child_params(j):
        is_split = split_mask
        xyz = jnp.where(is_split[:, None], p.xyz + delta_world[j], p.xyz)
        scaling = jnp.where(is_split[:, None], split_scaling, p.scaling)
        return SplatParams(
            xyz=xyz,
            features_dc=p.features_dc,
            features_rest=p.features_rest,
            scaling=scaling,
            rotation=p.rotation,
            opacity=p.opacity,
        )

    children = jax.tree.map(
        lambda a, b: jnp.concatenate([a, b], axis=0),
        child_params(0), child_params(1),
    )  # leaves (2C, ...)
    child_valid = jnp.concatenate([clone_mask | split_mask, split_mask])  # (2C,)

    # --- compaction: k-th valid child -> k-th free slot, per segment --------
    # Child axis order within a segment: all child-0 rows then all child-1
    # rows (with segments=1 this is exactly the global (2C,) priority).
    s = segments
    ell = c // s

    def seg_children(a):
        # (2C, ...) in (child, seg, row) order -> (S, 2*L, ...)
        return jnp.swapaxes(
            a.reshape(2, s, ell, *a.shape[1:]), 0, 1
        ).reshape(s, 2 * ell, *a.shape[1:])

    def unseg_children(a):
        # inverse of seg_children (for masks computed in segment order)
        return jnp.swapaxes(
            a.reshape(s, 2, ell, *a.shape[2:]), 0, 1
        ).reshape(2 * c, *a.shape[2:])

    free_s = (~live_after).reshape(s, ell)
    num_free = jnp.sum(free_s, axis=1)                    # (S,)
    slot_order = jnp.argsort(~free_s, axis=1, stable=True)  # free-first (S,L)
    valid_s = seg_children(child_valid)                   # (S, 2L)
    rank = jnp.cumsum(valid_s, axis=1) - 1                # (S, 2L)
    write_s = valid_s & (rank < num_free[:, None])
    dest_s = jnp.where(
        write_s,
        jnp.take_along_axis(slot_order, jnp.clip(rank, 0, ell - 1), axis=1),
        ell,
    )  # segment-local; ell = dropped

    def scatter(dst_arr, src_arr):
        # dest == L for non-written children: dropped by scatter mode.
        # Batched over segments: GSPMD shards the leading axis.
        return jax.vmap(
            lambda a, d, v: a.at[d].set(v, mode="drop")
        )(dst_arr.reshape(s, ell, *dst_arr.shape[1:]), dest_s,
          seg_children(src_arr)).reshape(dst_arr.shape)

    new_params = jax.tree.map(scatter, p, children)
    new_live = scatter(live_after, jnp.ones((2 * c,), bool))

    # --- optimizer surgery: zero moments of every changed row ---------------
    written = scatter(jnp.zeros((c,), bool), jnp.ones((2 * c,), bool))
    changed = written | (live & ~live_after)
    new_adam = optim_lib.surgery(adam, changed)
    write = unseg_children(write_s)

    zeros = jnp.zeros((c,), jnp.float32)
    info = DensifyInfo(
        num_cloned=jnp.sum(clone_mask),
        num_split=jnp.sum(split_mask),
        num_pruned=jnp.sum(prune_mask),
        num_dropped=jnp.sum(child_valid & ~write),
        num_live=jnp.sum(new_live),
    )
    return (
        model._replace(params=new_params, live=new_live, max_radii2d=zeros,
                       grad_accum=zeros, denom=zeros),
        new_adam,
        info,
    )


def reset_opacity(model: SplatModel, adam: optim_lib.AdamState,
                  ceiling: float = 0.01):
    """opacity <- inverse_sigmoid(min(sigmoid(opacity), ceiling)); opacity
    Adam moments reset (reference reset_opacity, gaussian_model.py:209-212)."""
    p = model.params
    new_op = inverse_sigmoid(
        jnp.minimum(jax.nn.sigmoid(p.opacity), ceiling)
    )
    new_op = jnp.where(model.live[:, None], new_op, p.opacity)
    new_adam = adam._replace(
        mu=adam.mu._replace(opacity=jnp.zeros_like(adam.mu.opacity)),
        nu=adam.nu._replace(opacity=jnp.zeros_like(adam.nu.opacity)),
    )
    return model._replace(params=p._replace(opacity=new_op)), new_adam
