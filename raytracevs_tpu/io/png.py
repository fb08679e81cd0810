"""Minimal pure-Python PNG writer (fallback when PIL is unavailable)."""
from __future__ import annotations

import struct
import zlib

import numpy as np


def write_png(path: str, rgba: np.ndarray) -> None:
    """Write an RGBA8 [H,W,4] (or RGB8 [H,W,3]) array as a PNG file."""
    a = np.asarray(rgba, dtype=np.uint8)
    h, w = a.shape[:2]
    channels = a.shape[2] if a.ndim == 3 else 1
    color_type = {1: 0, 3: 2, 4: 6}[channels]

    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)))
        f.write(chunk(b"IDAT", zlib.compress(raw, 6)))
        f.write(chunk(b"IEND", b""))
