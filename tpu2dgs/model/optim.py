"""Adam + learning-rate schedules for splat training.

Semantics follow torch.optim.Adam(eps=1e-15) with per-parameter-group LRs as
the reference configures it (scene/gaussian_model.py:148-166, defaults in
arguments/__init__.py:73-95). Implemented by hand rather than via optax so
densification can perform "optimizer state surgery" (reference
gaussian_model.py:257-326) as plain masked row writes: cloned/split splats
get zeroed first/second moments, pruned slots are zeroed entirely. The step
count is per-leaf-global, matching torch's per-tensor `step` (new rows share
the tensor's step after surgery).
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpu2dgs.model.splats import SplatParams


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    """LRs of record (reference arguments/__init__.py:73-95)."""

    position_lr_init: float = 1.6e-4
    position_lr_final: float = 1.6e-6
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 2.5e-3
    opacity_lr: float = 0.05
    scaling_lr: float = 5e-3
    rotation_lr: float = 1e-3
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-15


def expon_lr(step, lr_init: float, lr_final: float, lr_delay_steps: int = 0,
             lr_delay_mult: float = 1.0, max_steps: int = 1_000_000):
    """Log-linear interpolation with optional delay ramp (the multinerf
    schedule the reference uses, utils/general_utils.py:29-62)."""
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(
        jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t
    )
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
        )
    else:
        delay_rate = 1.0
    return delay_rate * log_lerp


class AdamState(NamedTuple):
    count: jnp.ndarray  # () int32
    mu: SplatParams
    nu: SplatParams


def init_adam(params: SplatParams) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(count=jnp.zeros((), jnp.int32), mu=zeros, nu=zeros)


def learning_rates(cfg: OptimConfig, step, spatial_lr_scale) -> SplatParams:
    """Per-leaf LRs at `step` (xyz follows the exponential schedule scaled by
    scene extent, reference gaussian_model.py:150-172)."""
    xyz_lr = expon_lr(
        step,
        cfg.position_lr_init * spatial_lr_scale,
        cfg.position_lr_final * spatial_lr_scale,
        lr_delay_mult=cfg.position_lr_delay_mult,
        max_steps=cfg.position_lr_max_steps,
    )
    return SplatParams(
        xyz=xyz_lr,
        features_dc=cfg.feature_lr,
        features_rest=cfg.feature_lr / 20.0,
        scaling=cfg.scaling_lr,
        rotation=cfg.rotation_lr,
        opacity=cfg.opacity_lr,
    )


def adam_step(
    cfg: OptimConfig,
    params: SplatParams,
    grads: SplatParams,
    state: AdamState,
    lrs: SplatParams,
    live: jnp.ndarray,  # (C,) bool — dead slots are frozen
):
    count = state.count + 1
    b1, b2 = cfg.beta1, cfg.beta2
    c1 = 1.0 - b1 ** count.astype(jnp.float32)
    c2 = 1.0 - b2 ** count.astype(jnp.float32)

    def upd(p, g, m, v, lr):
        mask = live.reshape((-1,) + (1,) * (p.ndim - 1))
        g = jnp.where(mask, g, 0.0)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        step = lr * (m / c1) / (jnp.sqrt(v / c2) + cfg.eps)
        return jnp.where(mask, p - step, p), m, v

    new_p, new_m, new_v = {}, {}, {}
    for f in params._fields:
        new_p[f], new_m[f], new_v[f] = upd(
            getattr(params, f), getattr(grads, f),
            getattr(state.mu, f), getattr(state.nu, f), getattr(lrs, f),
        )
    return (
        SplatParams(**new_p),
        AdamState(count=count, mu=SplatParams(**new_m), nu=SplatParams(**new_v)),
    )


def surgery(state: AdamState, reset_rows: jnp.ndarray) -> AdamState:
    """Zero Adam moments at `reset_rows` (bool (C,)) — the padded-capacity
    equivalent of the reference's cat/prune of exp_avg tensors."""

    def zero_rows(a):
        mask = reset_rows.reshape((-1,) + (1,) * (a.ndim - 1))
        return jnp.where(mask, 0.0, a)

    return AdamState(
        count=state.count,
        mu=jax.tree.map(zero_rows, state.mu),
        nu=jax.tree.map(zero_rows, state.nu),
    )
