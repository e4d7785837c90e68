"""SIBR remote-viewer wire protocol (reference gaussian_renderer/network_gui.py).

Same TCP protocol so the stock SIBR ``remote`` viewer connects unchanged:
- inbound: 4-byte little-endian length + JSON (camera matrices, resolution,
  train/keep_alive flags, python-path toggles, scaling modifier);
- outbound: raw H*W*3 uint8 bytes followed by 4-byte length + ascii source
  path string (reference :50-55).

The viewer ships matrices in the reference's transposed (row-vector) storage
with columns 1,2 sign-flipped (:75-78); ``receive`` converts them to this
framework's ``M @ p`` convention (transpose after the flips).
"""

from __future__ import annotations

import json
import socket

import numpy as np

from neuralgaussiansplatting_tpu.scene.cameras import minicam

host = "127.0.0.1"
port = 6009

conn = None
addr = None
listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)


def init(wish_host: str, wish_port: int):
    global host, port, listener
    host = wish_host
    port = wish_port
    listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    listener.bind((host, port))
    listener.listen()
    listener.settimeout(0)


def try_connect():
    global conn, addr
    try:
        conn, addr = listener.accept()
        print(f"\nConnected by {addr}")
        conn.settimeout(None)
    except Exception:
        pass


def read():
    n = int.from_bytes(conn.recv(4), "little")
    buf = b""
    while len(buf) < n:
        chunk = conn.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("viewer closed")
        buf += chunk
    return json.loads(buf.decode("utf-8"))


def send(message_bytes, verify: str):
    if message_bytes is not None:
        conn.sendall(message_bytes)
    conn.sendall(len(verify).to_bytes(4, "little"))
    conn.sendall(bytes(verify, "ascii"))


def receive():
    """Returns (CameraParams|None, do_training, shs_python,
    rot_scale_python, keep_alive, scaling_modifier)."""
    message = read()
    width = message["resolution_x"]
    height = message["resolution_y"]
    if width == 0 or height == 0:
        return None, None, None, None, None, None

    wv = np.array(message["view_matrix"], np.float32).reshape(4, 4)
    wv[:, 1] = -wv[:, 1]
    wv[:, 2] = -wv[:, 2]
    fp = np.array(message["view_projection_matrix"], np.float32).reshape(4, 4)
    fp[:, 1] = -fp[:, 1]
    cam = minicam(
        width, height, message["fov_x"], message["fov_y"],
        message["z_near"], message["z_far"],
        wv.T,   # reference stores transposed; ours is M @ p
        fp.T,
    )
    return (cam, bool(message["train"]), bool(message["shs_python"]),
            bool(message["rot_scale_python"]), bool(message["keep_alive"]),
            message["scaling_modifier"])


def render_to_bytes(image) -> memoryview:
    """(3, H, W) float -> interleaved uint8 bytes for the wire."""
    arr = np.asarray(image)
    arr = (np.clip(arr, 0.0, 1.0) * 255).astype(np.uint8)
    return memoryview(np.ascontiguousarray(arr.transpose(1, 2, 0)))
