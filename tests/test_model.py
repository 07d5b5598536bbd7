"""Model layer: KNN init, PLY round-trip, Adam semantics, densify/prune."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu2dgs.core.transforms import inverse_sigmoid
from tpu2dgs.model import densify as densify_lib
from tpu2dgs.model import optim as optim_lib
from tpu2dgs.model import splats as splats_lib
from tpu2dgs.model.knn import mean_dist2_to_3nn


def test_knn_matches_bruteforce():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(300, 3)).astype(np.float32)
    got = np.asarray(mean_dist2_to_3nn(jnp.asarray(pts), row_block=64, col_chunk=128))
    d2 = np.sum((pts[:, None] - pts[None, :]) ** 2, axis=-1)
    np.fill_diagonal(d2, np.inf)
    want = np.mean(np.sort(d2, axis=1)[:, :3], axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_create_from_pcd_and_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    n = 50
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    cols = rng.uniform(size=(n, 3)).astype(np.float32)
    model = splats_lib.create_from_pcd(pts, cols, capacity=64)
    assert int(model.num_live()) == n
    np.testing.assert_allclose(np.asarray(model.params.xyz[:n]), pts, atol=1e-6)
    # opacity init 0.1 logit
    np.testing.assert_allclose(
        np.asarray(jax.nn.sigmoid(model.params.opacity[:n])), 0.1, atol=1e-5
    )

    # randomize rest coefficients to exercise ordering
    p = model.params
    p = p._replace(
        features_rest=p.features_rest.at[:n].set(
            jnp.asarray(rng.normal(size=(n, 15, 3)), jnp.float32)
        ),
        scaling=p.scaling.at[:n].set(jnp.asarray(rng.normal(size=(n, 2)), jnp.float32)),
        rotation=p.rotation.at[:n].set(jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)),
    )
    model = model._replace(params=p)

    path = str(tmp_path / "pc.ply")
    splats_lib.save_ply(model, path)
    loaded = splats_lib.load_ply(path, capacity=128)
    assert int(loaded.num_live()) == n
    for a, b in zip(model.params, loaded.params):
        np.testing.assert_allclose(
            np.asarray(a)[:n], np.asarray(b)[:n], atol=1e-6
        )


def test_ply_attribute_order_matches_reference():
    names = splats_lib._ply_attribute_names(15)
    assert names[:6] == ["x", "y", "z", "nx", "ny", "nz"]
    assert names[6:9] == ["f_dc_0", "f_dc_1", "f_dc_2"]
    assert names[9] == "f_rest_0" and names[53] == "f_rest_44"
    assert names[54:57] == ["opacity", "scale_0", "scale_1"]
    assert names[57:] == ["rot_0", "rot_1", "rot_2", "rot_3"]


def test_adam_matches_torch_semantics():
    import torch

    cfg = optim_lib.OptimConfig()
    rng = np.random.default_rng(2)
    c = 8
    x0 = rng.normal(size=(c, 3)).astype(np.float32)

    model = splats_lib.empty_model(c)
    p = model.params._replace(xyz=jnp.asarray(x0))
    live = jnp.ones((c,), bool)
    adam = optim_lib.init_adam(p)

    tp = torch.nn.Parameter(torch.tensor(x0))
    topt = torch.optim.Adam([tp], lr=1e-2, eps=1e-15)

    params = p
    for step in range(5):
        g = rng.normal(size=(c, 3)).astype(np.float32)
        grads = jax.tree.map(jnp.zeros_like, params)._replace(xyz=jnp.asarray(g))
        lrs = splats_lib.SplatParams(1e-2, 0.0, 0.0, 0.0, 0.0, 0.0)
        params, adam = optim_lib.adam_step(cfg, params, grads, adam, lrs, live)
        tp.grad = torch.tensor(g)
        topt.step()
    np.testing.assert_allclose(
        np.asarray(params.xyz), tp.detach().numpy(), rtol=1e-5, atol=1e-6
    )


def test_expon_lr_schedule():
    # endpoints + monotone decay (reference get_expon_lr_func defaults)
    lr0 = float(optim_lib.expon_lr(0, 1.6e-4, 1.6e-6, max_steps=30000))
    lr_end = float(optim_lib.expon_lr(30000, 1.6e-4, 1.6e-6, max_steps=30000))
    np.testing.assert_allclose(lr0, 1.6e-4, rtol=1e-6)
    np.testing.assert_allclose(lr_end, 1.6e-6, rtol=1e-6)
    mid = float(optim_lib.expon_lr(15000, 1.6e-4, 1.6e-6, max_steps=30000))
    np.testing.assert_allclose(mid, np.sqrt(1.6e-4 * 1.6e-6), rtol=1e-5)


def _toy_model(c=16, n=6, seed=3):
    rng = np.random.default_rng(seed)
    model = splats_lib.empty_model(c)
    p = model.params
    p = p._replace(
        xyz=p.xyz.at[:n].set(jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)),
        scaling=p.scaling.at[:n].set(jnp.float32(np.log(0.005))),
        opacity=p.opacity.at[:n].set(float(inverse_sigmoid(0.8))),
    )
    return model._replace(params=p, live=model.live.at[:n].set(True)), n


def test_densify_clone_and_split():
    cfg = densify_lib.DensifyConfig()
    model, n = _toy_model()
    extent = 1.0
    # splat 0: high grad + small scale -> clone; splat 1: high grad + big -> split
    model = model._replace(
        grad_accum=model.grad_accum.at[0].set(1.0).at[1].set(1.0),
        denom=model.denom.at[:n].set(1.0),
    )
    p = model.params
    model = model._replace(
        params=p._replace(scaling=p.scaling.at[1].set(float(np.log(0.5))))
    )
    adam = optim_lib.init_adam(model.params)
    adam = adam._replace(mu=adam.mu._replace(xyz=jnp.ones_like(adam.mu.xyz)))

    new_model, new_adam, info = densify_lib.densify_and_prune(
        cfg, model, adam, jax.random.PRNGKey(0), extent, use_size_prune=False
    )
    assert int(info.num_cloned) == 1
    assert int(info.num_split) == 1
    assert int(info.num_pruned) == 0
    # live: n - 1 (split original) + 1 clone + 2 split children
    assert int(info.num_live) == n + 2
    # split children scale shrunk by 1/(0.8*2)
    live_scales = np.exp(np.asarray(new_model.params.scaling))[
        np.asarray(new_model.live)
    ]
    assert np.sum(np.isclose(live_scales[:, 0], 0.5 / 1.6, rtol=1e-4)) == 2
    # stats reset
    assert float(jnp.sum(new_model.grad_accum)) == 0.0
    # adam moments zeroed on changed rows (children landed in slots 1, 6, 7:
    # the freed split-original slot is reused first), kept on unchanged rows
    mu = np.asarray(new_adam.mu.xyz)
    live = np.asarray(new_model.live)
    changed = live.copy()
    changed[[0, 2, 3, 4, 5]] = False  # survivors that kept their moments
    assert np.all(mu[changed] == 0.0)
    assert np.all(mu[[0, 2, 3, 4, 5]] == 1.0)


def test_densify_prune_low_opacity():
    cfg = densify_lib.DensifyConfig()
    model, n = _toy_model()
    p = model.params
    model = model._replace(
        params=p._replace(
            opacity=p.opacity.at[0].set(float(inverse_sigmoid(0.01)))
        )
    )
    adam = optim_lib.init_adam(model.params)
    new_model, _, info = densify_lib.densify_and_prune(
        cfg, model, adam, jax.random.PRNGKey(0), 1.0, use_size_prune=False
    )
    assert int(info.num_pruned) == 1
    assert int(info.num_live) == n - 1
    assert not bool(new_model.live[0])


def test_densify_capacity_overflow_drops_and_reports():
    cfg = densify_lib.DensifyConfig()
    model, n = _toy_model(c=8, n=6)
    model = model._replace(
        grad_accum=model.grad_accum.at[:n].set(1.0),
        denom=model.denom.at[:n].set(1.0),
    )  # all 6 clone -> need 6 free, only 2
    adam = optim_lib.init_adam(model.params)
    new_model, _, info = densify_lib.densify_and_prune(
        cfg, model, adam, jax.random.PRNGKey(0), 1.0, use_size_prune=False
    )
    assert int(info.num_dropped) == 4
    assert int(info.num_live) == 8


def test_reset_opacity():
    model, n = _toy_model()
    adam = optim_lib.init_adam(model.params)
    adam = adam._replace(mu=adam.mu._replace(opacity=jnp.ones_like(adam.mu.opacity)))
    new_model, new_adam = densify_lib.reset_opacity(model, adam)
    op = np.asarray(jax.nn.sigmoid(new_model.params.opacity[:n, 0]))
    np.testing.assert_allclose(op, 0.01, rtol=1e-4)
    assert float(jnp.sum(jnp.abs(new_adam.mu.opacity))) == 0.0


def test_grow_capacity_preserves_state():
    from tpu2dgs.train.loop import grow_with_adam

    model, n = _toy_model(c=8, n=6)
    adam = optim_lib.init_adam(model.params)
    adam = adam._replace(nu=adam.nu._replace(xyz=jnp.ones_like(adam.nu.xyz)))
    big_model, big_adam = grow_with_adam(model, adam, 32)
    assert big_model.capacity == 32
    assert int(big_model.num_live()) == n
    np.testing.assert_allclose(
        np.asarray(big_model.params.xyz[:8]), np.asarray(model.params.xyz)
    )
    assert np.all(np.asarray(big_adam.nu.xyz)[:8] == 1.0)
    assert np.all(np.asarray(big_adam.nu.xyz)[8:] == 0.0)
    # padded rotation rows keep valid quaternions
    assert np.all(np.asarray(big_model.params.rotation)[8:, 0] == 1.0)


def test_grow_capacity_segmented_spreads_free_slots():
    """Segmented growth (splat sharding) must give EVERY segment free
    slots: an end-pad leaves previously-full segments full, so dense
    regions would drop densification children forever (round-3 advisor
    finding)."""
    from tpu2dgs.train.loop import grow_with_adam

    s = 4
    model, n = _toy_model(c=8, n=8)  # every segment of 2 rows is full
    adam = optim_lib.init_adam(model.params)
    adam = adam._replace(nu=adam.nu._replace(xyz=jnp.ones_like(adam.nu.xyz)))
    big_model, big_adam = grow_with_adam(model, adam, 16, segments=s)
    assert big_model.capacity == 16
    assert int(big_model.num_live()) == n
    live = np.asarray(big_model.live).reshape(s, 4)
    # each new segment: its old 2 live rows first, then 2 free slots
    assert np.all(live == np.array([True, True, False, False])[None, :])
    # old rows land contiguously at each segment start, state intact
    np.testing.assert_allclose(
        np.asarray(big_model.params.xyz).reshape(s, 4, 3)[:, :2],
        np.asarray(model.params.xyz).reshape(s, 2, 3),
    )
    nu = np.asarray(big_adam.nu.xyz).reshape(s, 4, 3)
    assert np.all(nu[:, :2] == 1.0) and np.all(nu[:, 2:] == 0.0)
    # padded rotation rows keep valid quaternions
    rot = np.asarray(big_model.params.rotation).reshape(s, 4, 4)
    assert np.all(rot[:, 2:, 0] == 1.0)
    # and a subsequent segment-local densify can now place children in
    # every segment: mark all rows hot -> 8 clones need 8 free slots
    big_model = big_model._replace(
        grad_accum=big_model.grad_accum.at[:].set(
            jnp.where(big_model.live, 1.0, 0.0)),
        denom=jnp.ones_like(big_model.denom),
    )
    cfg = densify_lib.DensifyConfig(grad_threshold=0.5, percent_dense=1e9)
    _, _, info = densify_lib.densify_and_prune(
        cfg, big_model, big_adam, jax.random.PRNGKey(0), 1.0,
        use_size_prune=False, segments=s)
    assert int(info.num_dropped) == 0
    assert int(info.num_live) == 16


def test_native_knn_close_to_exact():
    from tpu2dgs import native

    if not native.available():
        import pytest

        pytest.skip("no g++ toolchain")
    rng = np.random.default_rng(5)
    pts = rng.normal(size=(5000, 3)).astype(np.float32)
    approx = native.knn_mean_dist2(pts, window=24)
    exact = np.asarray(mean_dist2_to_3nn(jnp.asarray(pts)))
    rel = np.abs(approx - exact) / np.maximum(exact, 1e-12)
    # Morton-window KNN is approximate; scale init only needs log-accuracy
    assert np.median(rel) < 0.02, np.median(rel)
    assert np.mean(rel < 0.5) > 0.95, np.mean(rel < 0.5)
    assert np.all(approx >= exact - 1e-6)  # never underestimates
