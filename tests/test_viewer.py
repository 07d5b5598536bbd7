"""Viewer bridge: wire protocol loopback + render mode mux."""

import json
import socket
import struct
import threading

import jax.numpy as jnp
import numpy as np

from tpu2dgs.viewer.modes import colormap, gradient_map, render_net_image
from tpu2dgs.viewer.network_gui import NetworkGUI, image_to_bytes


def _recv_exact(sock, n):
    buf = b""
    while len(buf) < n:
        buf += sock.recv(n - len(buf))
    return buf


def test_network_gui_loopback():
    gui = NetworkGUI("127.0.0.1", 0)
    gui.init()
    port = gui.listener.getsockname()[1]

    w, h = 8, 4
    results = {}

    def client():
        s = socket.create_connection(("127.0.0.1", port))
        # on-connect render items
        (n,) = struct.unpack("<I", _recv_exact(s, 4))
        results["items"] = json.loads(_recv_exact(s, n))
        # send a camera request (identity view matrix, SIBR convention)
        msg = {
            "resolution_x": w, "resolution_y": h, "train": True,
            "fov_y": 1.0, "fov_x": 1.0, "z_near": 0.01, "z_far": 100.0,
            "keep_alive": True, "scaling_modifier": 1.0,
            "shs_python": False, "rot_scale_python": False,
            "view_matrix": list(np.eye(4).flatten().astype(float)),
            "view_projection_matrix": list(np.eye(4).flatten().astype(float)),
            "render_mode": 0,
        }
        payload = json.dumps(msg).encode()
        s.sendall(struct.pack("<I", len(payload)) + payload)
        # image bytes + verify + metrics
        results["image"] = _recv_exact(s, w * h * 3)
        (vn,) = struct.unpack("<I", _recv_exact(s, 4))
        results["verify"] = _recv_exact(s, vn).decode()
        (mn,) = struct.unpack("<I", _recv_exact(s, 4))
        results["metrics"] = json.loads(_recv_exact(s, mn))
        s.close()

    t = threading.Thread(target=client)
    t.start()
    # server side
    while gui.conn is None:
        gui.try_connect(["RGB", "Depth"])
    cam, (rw, rh), do_training, keep_alive, sm, mode = gui.receive()
    assert (rw, rh) == (w, h)
    assert do_training and keep_alive and sm == 1.0 and mode == 0
    assert cam is not None
    # axis flips applied: cols 1,2 negated from identity
    wv = np.asarray(cam.world_view)
    np.testing.assert_allclose(np.diag(wv), [1, -1, -1, 1], atol=1e-6)

    img = np.zeros((3, h, w), np.float32)
    img[0] = 1.0  # pure red
    gui.send(image_to_bytes(img), "verify-str", {"#": 42})
    t.join(timeout=5)

    assert results["items"] == ["RGB", "Depth"]
    arr = np.frombuffer(results["image"], np.uint8).reshape(h, w, 3)
    assert np.all(arr[:, :, 0] == 255) and np.all(arr[:, :, 1] == 0)
    assert results["verify"] == "verify-str"
    assert results["metrics"] == {"#": 42}
    gui.disconnect()


def test_render_modes():
    h = w = 8
    pkg = {
        "render": jnp.ones((3, h, w)) * 0.5,
        "rend_alpha": jnp.linspace(0, 1, h * w).reshape(1, h, w),
        "rend_normal": jnp.zeros((3, h, w)).at[2].set(1.0),
        "surf_depth": jnp.ones((1, h, w)) * 2.0,
    }
    items = ["RGB", "Alpha", "Normal", "Depth", "Edge", "Curvature"]
    for mode in range(len(items)):
        img = render_net_image(pkg, items, mode)
        assert img.shape == (3, h, w), items[mode]
        assert np.all(np.isfinite(np.asarray(img)))
    # normal mode maps +z to 1.0 in blue channel
    nrm = render_net_image(pkg, items, 2)
    np.testing.assert_allclose(np.asarray(nrm)[2], 1.0)
    # edge of a constant image is zero -> colormap handles degenerate range
    edge = render_net_image(pkg, items, 4)
    assert np.all(np.isfinite(np.asarray(edge)))


def test_gradient_and_colormap_shapes():
    img = jnp.zeros((3, 16, 16)).at[:, :, 8:].set(1.0)
    g = gradient_map(img)
    assert g.shape == (1, 16, 16)
    assert float(g[0, 8, 8]) > 0.1  # edge detected
    cm = colormap(g)
    assert cm.shape == (3, 16, 16)


def test_gui_polling_during_training():
    """A viewer client connected mid-training receives frames without
    stalling the loop (reference train.py:146-168)."""
    import numpy as np
    import jax.numpy as jnp

    from tests.test_train import _gt_scene, _orbit_camera
    from tpu2dgs.model import splats as splats_lib
    from tpu2dgs.raster.api import RasterSettings, render as render_op
    from tpu2dgs.train.loop import TrainConfig, Trainer

    w = h = 32
    gt_splats, gt_xyz, gt_rgb = _gt_scene(n=10, seed=8)
    cams = [_orbit_camera(i, a, w=w, h=h)
            for i, a in enumerate(np.linspace(0, 2 * np.pi, 3, endpoint=False))]
    st = RasterSettings(width=w, height=h, sh_degree=0, backend="tiled",
                        bin_capacity=16, tile_capacity=16)
    for cam in cams:
        cam.image = np.asarray(
            render_op(cam.arrays(), st, *gt_splats, jnp.zeros(3))["render"])

    model = splats_lib.create_from_pcd(gt_xyz, gt_rgb, capacity=16)
    trainer = Trainer(
        model, cams, w, h, spatial_lr_scale=1.0, scene_extent=3.0,
        train_cfg=TrainConfig(densify_from_iter=10_000,
                              normal_from_iter=10_000, dist_from_iter=10_000),
        max_sh_degree=0,
        raster_kwargs=dict(backend="tiled", bin_capacity=16, tile_capacity=16),
    )
    gui = NetworkGUI("127.0.0.1", 0)
    gui.init()
    port = gui.listener.getsockname()[1]
    trainer.gui = gui
    trainer.source_path = "/data/test"

    results = {}

    def client():
        s = socket.create_connection(("127.0.0.1", port))
        s.settimeout(120)
        (n,) = struct.unpack("<I", _recv_exact(s, 4))
        json.loads(_recv_exact(s, n))
        msg = {
            "resolution_x": 16, "resolution_y": 16, "train": True,
            "fov_y": 1.0, "fov_x": 1.0, "z_near": 0.01, "z_far": 100.0,
            "keep_alive": False, "scaling_modifier": 1.0,
            "view_matrix": list(np.eye(4).flatten().astype(float)),
            "view_projection_matrix": list(np.eye(4).flatten().astype(float)),
            "render_mode": 0,
        }
        payload = json.dumps(msg).encode()
        s.sendall(struct.pack("<I", len(payload)) + payload)
        results["image"] = _recv_exact(s, 16 * 16 * 3)
        (vn,) = struct.unpack("<I", _recv_exact(s, 4))
        results["verify"] = _recv_exact(s, vn).decode()
        (mn,) = struct.unpack("<I", _recv_exact(s, 4))
        results["metrics"] = json.loads(_recv_exact(s, mn))
        s.close()

    t = threading.Thread(target=client)
    t.start()
    # first train block accepts; client sends one request; training continues
    trainer.train(num_iters=30)
    t.join(timeout=10)
    assert not t.is_alive()
    assert len(results["image"]) == 16 * 16 * 3
    assert results["verify"] == "/data/test"
    assert results["metrics"]["#"] == 10
    assert trainer.step == 30  # training was not stalled
    gui.disconnect()


def test_gui_pause_resume():
    """A client that sets do_training=False pauses the training loop until
    it allows resuming (reference train.py:146-168 blocks in the GUI loop)."""
    import time

    import numpy as np
    import jax.numpy as jnp

    from tests.test_train import _gt_scene, _orbit_camera
    from tpu2dgs.model import splats as splats_lib
    from tpu2dgs.raster.api import RasterSettings, render as render_op
    from tpu2dgs.train.loop import TrainConfig, Trainer

    w = h = 32
    gt_splats, gt_xyz, gt_rgb = _gt_scene(n=10, seed=8)
    cams = [_orbit_camera(i, a, w=w, h=h)
            for i, a in enumerate(np.linspace(0, 2 * np.pi, 3, endpoint=False))]
    st = RasterSettings(width=w, height=h, sh_degree=0, backend="tiled",
                        bin_capacity=16, tile_capacity=16)
    for cam in cams:
        cam.image = np.asarray(
            render_op(cam.arrays(), st, *gt_splats, jnp.zeros(3))["render"])

    model = splats_lib.create_from_pcd(gt_xyz, gt_rgb, capacity=16)
    trainer = Trainer(
        model, cams, w, h, spatial_lr_scale=1.0, scene_extent=3.0,
        train_cfg=TrainConfig(densify_from_iter=10_000,
                              normal_from_iter=10_000, dist_from_iter=10_000),
        max_sh_degree=0,
        raster_kwargs=dict(backend="tiled", bin_capacity=16, tile_capacity=16),
    )
    gui = NetworkGUI("127.0.0.1", 0)
    gui.init()
    port = gui.listener.getsockname()[1]
    trainer.gui = gui
    trainer.source_path = "/data/test"

    state = {}

    def client():
        s = socket.create_connection(("127.0.0.1", port))
        s.settimeout(120)
        try:
            (n,) = struct.unpack("<I", _recv_exact(s, 4))
            json.loads(_recv_exact(s, n))

            def send_msg(train_flag):
                msg = {
                    "resolution_x": 16, "resolution_y": 16,
                    "train": train_flag,
                    "fov_y": 1.0, "fov_x": 1.0, "z_near": 0.01,
                    "z_far": 100.0, "keep_alive": True,
                    "scaling_modifier": 1.0,
                    "view_matrix": list(np.eye(4).flatten().astype(float)),
                    "view_projection_matrix": list(
                        np.eye(4).flatten().astype(float)),
                    "render_mode": 0,
                }
                payload = json.dumps(msg).encode()
                s.sendall(struct.pack("<I", len(payload)) + payload)
                _recv_exact(s, 16 * 16 * 3)
                (vn,) = struct.unpack("<I", _recv_exact(s, 4))
                _recv_exact(s, vn)
                (mn,) = struct.unpack("<I", _recv_exact(s, 4))
                _recv_exact(s, mn)

            send_msg(False)  # pause: trainer must block on this socket
            step0 = trainer.step
            time.sleep(0.7)
            step1 = trainer.step
            state["frozen"] = (step0, step1)
            send_msg(True)   # resume
        finally:
            s.close()

    t = threading.Thread(target=client)
    t.start()
    trainer.train(num_iters=60)
    t.join(timeout=10)
    assert not t.is_alive()
    step0, step1 = state["frozen"]
    assert step0 == step1, f"trainer advanced while paused: {step0}->{step1}"
    assert trainer.step == 60  # resumed and finished
    gui.disconnect()
