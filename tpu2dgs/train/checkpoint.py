"""Full-training-state checkpointing.

Reference equivalent: `capture()`/`restore()` tuples pickled with torch.save
(scene/gaussian_model.py:61-93, train.py:37-39,142-144). Here the state is a
flat npz of the SplatModel + AdamState + host counters — dependency-free,
and memory-mappable for fast resume. The PLY interchange format (splats.py)
remains the ecosystem-facing artifact; this is the resume format.
"""

from __future__ import annotations

import os
from typing import Any

import jax.numpy as jnp
import numpy as np

from tpu2dgs.model.optim import AdamState
from tpu2dgs.model.splats import SplatModel, SplatParams


def _params_arrays(prefix: str, p: SplatParams) -> dict[str, np.ndarray]:
    return {prefix + name: np.asarray(getattr(p, name)) for name in p._fields}


def save_checkpoint(path: str, model: SplatModel, adam: AdamState,
                    step: int, extra: dict[str, Any] | None = None) -> None:
    arrays = {
        "model.live": np.asarray(model.live),
        "model.max_radii2d": np.asarray(model.max_radii2d),
        "model.grad_accum": np.asarray(model.grad_accum),
        "model.denom": np.asarray(model.denom),
        "adam.count": np.asarray(adam.count),
        "step": np.asarray(step),
    }
    arrays.update(_params_arrays("model.params/", model.params))
    arrays.update(_params_arrays("adam.mu/", adam.mu))
    arrays.update(_params_arrays("adam.nu/", adam.nu))
    for k, v in (extra or {}).items():
        arrays["extra." + k] = np.asarray(v)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)


def load_checkpoint(path: str):
    """Returns (model, adam, step, extra_dict)."""
    z = np.load(path)

    def params(prefix):
        return SplatParams(
            xyz=jnp.asarray(z[prefix + "xyz"]),
            features_dc=jnp.asarray(z[prefix + "features_dc"]),
            features_rest=jnp.asarray(z[prefix + "features_rest"]),
            scaling=jnp.asarray(z[prefix + "scaling"]),
            rotation=jnp.asarray(z[prefix + "rotation"]),
            opacity=jnp.asarray(z[prefix + "opacity"]),
        )

    model = SplatModel(
        params=params("model.params/"),
        live=jnp.asarray(z["model.live"]),
        max_radii2d=jnp.asarray(z["model.max_radii2d"]),
        grad_accum=jnp.asarray(z["model.grad_accum"]),
        denom=jnp.asarray(z["model.denom"]),
    )
    adam = AdamState(
        count=jnp.asarray(z["adam.count"]),
        mu=params("adam.mu/"),
        nu=params("adam.nu/"),
    )
    step = int(z["step"])
    extra = {k[len("extra."):]: z[k] for k in z.files if k.startswith("extra.")}
    return model, adam, step, extra
