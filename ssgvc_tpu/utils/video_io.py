"""Frame IO: PNG sequences and raw YUV420 planar files.

Rebuild of src/utils/video_reader.py:10-90 / video_writer.py:9-52 — PNG
readers/writers with the reference's ``im%05d.png`` naming, and planar
YUV420 8-bit raw IO. PIL is used when available; PNG support degrades
gracefully to raising with a clear message otherwise.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

try:
    from PIL import Image
except Exception:  # pragma: no cover
    Image = None


class PNGReader:
    """Reads im00001.png, im00002.png, ... as float RGB in [0,1]."""

    def __init__(self, directory: str, start: int = 1):
        self.directory = directory
        self.idx = start

    def read_one_frame(self) -> Optional[np.ndarray]:
        if Image is None:
            raise RuntimeError("PIL not available for PNG IO")
        path = os.path.join(self.directory, f"im{self.idx:05d}.png")
        if not os.path.exists(path):
            return None
        self.idx += 1
        rgb = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
        return rgb


class PNGWriter:
    def __init__(self, directory: str, start: int = 1):
        os.makedirs(directory, exist_ok=True)
        self.directory = directory
        self.idx = start

    def write_one_frame(self, rgb: np.ndarray):
        if Image is None:
            raise RuntimeError("PIL not available for PNG IO")
        path = os.path.join(self.directory, f"im{self.idx:05d}.png")
        self.idx += 1
        img = np.clip(rgb * 255.0 + 0.5, 0, 255).astype(np.uint8)
        Image.fromarray(img).save(path)


class YUV420Reader:
    """Raw planar YUV420 8-bit reader returning (y, uv) in [0,1]."""

    def __init__(self, path: str, height: int, width: int):
        self.f = open(path, "rb")
        self.h, self.w = height, width

    def read_one_frame(self) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        h, w = self.h, self.w
        n = h * w + 2 * (h // 2) * (w // 2)
        buf = self.f.read(n)
        if len(buf) < n:
            return None
        arr = np.frombuffer(buf, np.uint8)
        y = arr[: h * w].reshape(h, w).astype(np.float32) / 255.0
        u = arr[h * w: h * w + (h // 2) * (w // 2)].reshape(h // 2, w // 2)
        v = arr[h * w + (h // 2) * (w // 2):].reshape(h // 2, w // 2)
        uv = np.stack([u, v], axis=-1).astype(np.float32) / 255.0
        return y, uv

    def close(self):
        self.f.close()


class YUV420Writer:
    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.f = open(path, "wb")

    def write_one_frame(self, y: np.ndarray, uv: np.ndarray):
        for plane in (y, uv[..., 0], uv[..., 1]):
            self.f.write(np.clip(plane * 255.0 + 0.5, 0, 255)
                         .astype(np.uint8).tobytes())

    def close(self):
        self.f.close()
