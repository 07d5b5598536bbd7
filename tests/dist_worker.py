"""Worker for the two-process distributed rehearsal (not a pytest module).

Spawned by tests/test_distributed.py with JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID in the env: exercises the exact
multi-host bring-up path (`parallel.distributed.initialize` env parsing +
`make_global_mesh`) and one full sharded training step over the global
mesh, with gloo standing in for ICI/DCN. This is the no-hardware dress
rehearsal SURVEY.md §4(e) plans for the first real multi-host run.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from tpu2dgs.parallel import distributed

    distributed.configure_cpu_rehearsal(local_devices=2)
    distributed.initialize()  # no args: env parsing under test

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert jax.process_count() == 2, jax.process_count()
    mesh = distributed.make_global_mesh()
    n_dev = len(jax.devices())
    assert n_dev == 4, n_dev

    from tpu2dgs.core import cameras
    from tpu2dgs.model import optim as optim_lib
    from tpu2dgs.model import splats as splats_lib
    from tpu2dgs.raster.api import RasterSettings
    from tpu2dgs.train.loop import make_train_step

    w = 128
    h = 64 * n_dev
    n = 256
    settings = RasterSettings(
        width=w, height=h, sh_degree=3, backend="pallas",
        bin_capacity=128, tile_capacity=128, debug=True,
    )
    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    cols = rng.uniform(0.0, 1.0, (n, 3)).astype(np.float32)
    cam = cameras.Camera(
        uid=0, image_name="dist", R=np.eye(3), T=np.zeros(3),
        fovx=np.pi / 2, fovy=np.pi / 2, width=w, height=h,
    ).arrays()

    rep = NamedSharding(mesh, P())

    def put(tree):
        # Multi-process rule: every jit input must be a GLOBAL array.
        # Values are identical on both processes, so a replicated
        # device_put is correct (and is what a real multi-host trainer
        # does for the replicated model/optimizer state in rows mode).
        return jax.tree.map(lambda a: jax.device_put(jnp.asarray(a), rep),
                            tree)

    losses = []
    # rows (balanced windows), gaussian parallelism (all-gather), and
    # gaussian parallelism with the strip-routed all_to_all exchange —
    # the same three modes the driver dryrun compiles single-process.
    for shard_splats, xfer in ((False, 0), (True, 0), (True, 128)):
        s = settings if xfer == 0 else RasterSettings(
            width=w, height=h, sh_degree=3, backend="pallas",
            bin_capacity=128, tile_capacity=128, debug=True,
            xfer_capacity=xfer)
        step_fn = make_train_step(
            s, optim_lib.OptimConfig(), lambda_dssim=0.2,
            spatial_lr_scale=1.0, mesh=mesh, shard_splats=shard_splats,
        )
        model = put(splats_lib.create_from_pcd(pts, cols, capacity=n))
        adam = put(optim_lib.init_adam(model.params))
        gt = put(jnp.zeros((3, h, w), jnp.float32))
        bg = put(jnp.zeros(3, jnp.float32))
        model, adam, metrics = jax.jit(step_fn)(
            put(model), adam, put(cam), gt, bg, jnp.float32(1.0),
            jnp.float32(0.05), jnp.float32(100.0),
        )
        jax.block_until_ready(metrics["loss"])
        loss = float(metrics["loss"])
        assert np.isfinite(loss), metrics
        losses.append(round(loss, 6))
    assert losses[1] == losses[2], losses  # routed == all-gather exactly
    print(f"DIST_OK pid={jax.process_index()} rows_loss={losses[0]} "
          f"splats_loss={losses[1]} routed_loss={losses[2]}", flush=True)


if __name__ == "__main__":
    main()
