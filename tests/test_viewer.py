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
