"""SIBR remote-viewer TCP bridge — wire-compatible with the reference
(gaussian_renderer/network_gui.py:27-98) so existing viewer binaries connect
unchanged:

  server -> client on connect: u32-LE length + JSON list of render items
  client -> server per frame:  u32-LE length + JSON control message
  server -> client response:   raw H*W*3 u8 image bytes (if a camera was
                               given), then u32-LE length + ascii verify
                               string, then u32-LE length + JSON metrics

The received view matrix gets the reference's axis flips (columns 1, 2 of
view, column 1 of view-projection) before use.
"""

from __future__ import annotations

import json
import socket
import struct
import traceback
from typing import Optional

import numpy as np

from tpu2dgs.core.cameras import CameraArrays, focal2fov

_DEFAULT_RENDER_ITEMS = ["RGB", "Alpha", "Normal", "Depth", "Edge", "Curvature"]


class NetworkGUI:
    def __init__(self, host: str = "127.0.0.1", port: int = 6009):
        self.host = host
        self.port = port
        self.listener: Optional[socket.socket] = None
        self.conn: Optional[socket.socket] = None

    def init(self) -> None:
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.listener.bind((self.host, self.port))
        self.listener.listen()
        self.listener.settimeout(0)

    def try_connect(self, render_items=None) -> None:
        if self.listener is None:
            return
        try:
            self.conn, _ = self.listener.accept()
            self.conn.settimeout(None)
            self._send_json(render_items or _DEFAULT_RENDER_ITEMS)
        except (BlockingIOError, socket.timeout, OSError):
            pass

    def _send_json(self, data) -> None:
        payload = json.dumps(data).encode("utf-8")
        self.conn.sendall(struct.pack("<I", len(payload)))
        self.conn.sendall(payload)

    def _read_json(self) -> dict:
        raw_len = self._recv_exact(4)
        (length,) = struct.unpack("<I", raw_len)
        return json.loads(self._recv_exact(length).decode("utf-8"))

    def _recv_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.conn.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("viewer closed")
            buf += chunk
        return buf

    def receive(self):
        """Returns (cam_arrays|None, (w,h), do_training, keep_alive,
        scaling_modifier, render_mode)."""
        msg = self._read_json()
        width = msg["resolution_x"]
        height = msg["resolution_y"]
        if width == 0 or height == 0:
            return None, (0, 0), None, None, None, None
        try:
            do_training = bool(msg["train"])
            keep_alive = bool(msg["keep_alive"])
            scaling_modifier = msg["scaling_modifier"]
            world_view = np.array(msg["view_matrix"], np.float32).reshape(4, 4)
            world_view[:, 1] = -world_view[:, 1]
            world_view[:, 2] = -world_view[:, 2]
            full_proj = np.array(
                msg["view_projection_matrix"], np.float32).reshape(4, 4)
            full_proj[:, 1] = -full_proj[:, 1]
            import jax.numpy as jnp
            import math

            cam_center = np.linalg.inv(world_view)[3, :3]
            cam = CameraArrays(
                world_view=jnp.asarray(world_view),
                full_proj=jnp.asarray(full_proj),
                cam_center=jnp.asarray(cam_center),
                tanfovx=jnp.float32(math.tan(msg["fov_x"] * 0.5)),
                tanfovy=jnp.float32(math.tan(msg["fov_y"] * 0.5)),
                znear=jnp.float32(msg["z_near"]),
                zfar=jnp.float32(msg["z_far"]),
            )
            render_mode = msg.get("render_mode", 0)
            return (cam, (width, height), do_training, keep_alive,
                    scaling_modifier, render_mode)
        except Exception:
            traceback.print_exc()
            return None, (0, 0), None, None, None, None

    def send(self, image_bytes: Optional[bytes], verify: str,
             metrics: dict) -> None:
        if image_bytes is not None:
            self.conn.sendall(image_bytes)
        self.conn.sendall(struct.pack("<I", len(verify)))
        self.conn.sendall(verify.encode("ascii"))
        self._send_json(metrics)

    def disconnect(self) -> None:
        if self.conn is not None:
            try:
                self.conn.close()
            except OSError:
                pass
            self.conn = None


def image_to_bytes(chw: np.ndarray) -> bytes:
    """(3,H,W) float [0,1] -> raw HWC u8 bytes (the viewer's frame format)."""
    arr = np.clip(np.asarray(chw), 0.0, 1.0)
    return np.ascontiguousarray(
        (arr * 255.0).astype(np.uint8).transpose(1, 2, 0)
    ).tobytes()
