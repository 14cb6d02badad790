"""Edge-image visualization: keylines painted over the frame.

Parity feature for the reference's edge-image publisher
(ros_rebvio.cpp:32-51, keylines painted red over the camera image),
ROS-free: renders to an RGB numpy array and/or writes a PNG.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def render_edge_image(frame: np.ndarray, edge_map, gain: float = 1.0,
                      max_val: float = 255.0) -> np.ndarray:
    """[H,W,3] uint8: grayscale frame with valid keylines in red; matched
    keylines brighter."""
    img = np.clip(np.asarray(frame, np.float32) * gain, 0, max_val)
    g = (img / max_val * 255).astype(np.uint8)
    out = np.stack([g, g, g], axis=-1)
    pos = np.asarray(edge_map.pos)
    valid = np.asarray(edge_map.valid)
    matched = np.asarray(edge_map.match_id) >= 0
    H, W = g.shape
    xs = np.clip(np.floor(pos[:, 0] + 0.5).astype(int), 0, W - 1)
    ys = np.clip(np.floor(pos[:, 1] + 0.5).astype(int), 0, H - 1)
    sel = valid & ~matched
    out[ys[sel], xs[sel]] = [200, 40, 40]
    sel = valid & matched
    out[ys[sel], xs[sel]] = [255, 64, 64]
    return out


def write_png_rgb(path: str, img: np.ndarray) -> None:
    """Minimal RGB PNG writer (no external deps)."""
    H, W, C = img.shape
    assert C == 3
    raw = b"".join(b"\x00" + img[r].astype(np.uint8).tobytes() for r in range(H))

    def chunk(typ, data):
        c = typ + data
        return struct.pack(">I", len(data)) + c + struct.pack(">I", zlib.crc32(c))

    ihdr = struct.pack(">IIBBBBB", W, H, 8, 2, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", zlib.compress(raw)))
        f.write(chunk(b"IEND", b""))
