"""Top-lidar occupancy projection onto the FRONT camera.

Rebuild of the reference's lidar path (src/dataset/seg_waymo_dataset.py:86-126
plus ext/.../utils.py:216-259 range-image parsing): the Waymo Frame proto
stores, per laser, a zlib-compressed MatrixFloat range image [H, W, 4]
(range, intensity, elongation, nlz) and a MatrixInt32 camera projection
[H, W, 6] ((cam, u, v) x 2). Projecting to the camera needs no 3-D math —
the projection channels already carry pixel coordinates.

Proto field numbers (dataset.proto): Frame.lasers=5, Laser.name=1,
Laser.ri_return1=2, RangeImage.range_image_compressed=2,
RangeImage.camera_projection_compressed=3; MatrixFloat/Int32: data=1 (packed),
shape=2 (MatrixShape.dims=1 packed).
"""

from __future__ import annotations

import zlib
from typing import Optional, Tuple

import numpy as np

from .waymo_proto import FRONT, _read_varint, iter_fields

TOP_LIDAR = 1  # LaserName.TOP


def _parse_packed_shape(payload: memoryview) -> Tuple[int, ...]:
    dims = []
    for f, w, p in iter_fields(payload):
        if f == 1:
            if w == 0:
                dims.append(p)
            elif w == 2:  # packed varints
                pos = 0
                while pos < len(p):
                    v, pos = _read_varint(p, pos)
                    dims.append(v)
    return tuple(dims)


def parse_matrix_float(data: bytes) -> np.ndarray:
    arr = None
    shape: Tuple[int, ...] = ()
    for f, w, p in iter_fields(memoryview(data)):
        if f == 1 and w == 2:  # packed floats
            arr = np.frombuffer(bytes(p), np.float32)
        elif f == 2 and w == 2:
            shape = _parse_packed_shape(p)
    if arr is None:
        raise ValueError("MatrixFloat without data")
    return arr.reshape(shape) if shape else arr


def parse_matrix_int32(data: bytes) -> np.ndarray:
    vals = None
    shape: Tuple[int, ...] = ()
    for f, w, p in iter_fields(memoryview(data)):
        if f == 1 and w == 2:  # packed varints
            out = []
            pos = 0
            while pos < len(p):
                v, pos = _read_varint(p, pos)
                # int32 negative values come as 10-byte varints (two's compl.)
                out.append(v - (1 << 64) if v >= (1 << 63) else v)
            vals = np.asarray(out, np.int32)
        elif f == 2 and w == 2:
            shape = _parse_packed_shape(p)
    if vals is None:
        raise ValueError("MatrixInt32 without data")
    return vals.reshape(shape) if shape else vals


def extract_laser_blobs(frame_bytes: bytes, laser_name: int = TOP_LIDAR
                        ) -> Optional[Tuple[bytes, bytes]]:
    """Frame proto -> (range_image_compressed, camera_projection_compressed)
    of the requested laser's first return, or None."""
    for field, wire, payload in iter_fields(memoryview(frame_bytes)):
        if field != 5 or wire != 2:  # Frame.lasers
            continue
        name = None
        ri1 = None
        for f2, w2, p2 in iter_fields(payload):
            if f2 == 1 and w2 == 0:
                name = p2
            elif f2 == 2 and w2 == 2:
                ri1 = p2
        if name != laser_name or ri1 is None:
            continue
        ri_blob = cam_blob = None
        for f3, w3, p3 in iter_fields(ri1):
            if f3 == 2 and w3 == 2:
                ri_blob = bytes(p3)
            elif f3 == 3 and w3 == 2:
                cam_blob = bytes(p3)
        if ri_blob is not None and cam_blob is not None:
            return ri_blob, cam_blob
    return None


def project_top_lidar(frame_bytes: bytes, height: int, width: int,
                      camera_name: int = FRONT,
                      mode: str = "occupancy") -> np.ndarray:
    """(H, W, 3) float projection aligned to the camera image.

    ``mode='occupancy'`` (default): channel 0 top-lidar occupancy, channel 1
    range (/75m), channel 2 intensity — richer than the reference's
    occupancy-only flag (src/dataset/seg_waymo_dataset.py:86-126).

    ``mode='legacy3'``: the OLDER reference pipeline's depth/intensity/
    elongation channels (src/dataset/waymo_dataset.py:20-79 — depth/75,
    clip(intensity, 0, 1.5)/1.5, elongation/1.5). That code measured depth
    as the camera-frame X of the 3-D point cloud; this projection reads the
    proto's pixel-projection channels directly, so lidar RANGE stands in for
    depth (a monotone proxy; no extrinsic solve needed).
    """
    proj = np.zeros((height, width, 3), np.float32)
    blobs = extract_laser_blobs(frame_bytes)
    if blobs is None:
        return proj
    ri = parse_matrix_float(zlib.decompress(blobs[0]))      # (H, W, 4)
    cp = parse_matrix_int32(zlib.decompress(blobs[1]))      # (H, W, 6)

    rng = ri[..., 0].reshape(-1)
    intensity = ri[..., 1].reshape(-1)
    elong = ri[..., 2].reshape(-1)
    cp = cp.reshape(-1, 6)
    for base in (0, 3):  # first and second projections
        cam = cp[:, base]
        u = cp[:, base + 1]
        v = cp[:, base + 2]
        keep = ((rng > 0) & (cam == camera_name)
                & (u >= 0) & (u < width) & (v >= 0) & (v < height))
        if mode == "legacy3":
            proj[v[keep], u[keep], 0] = rng[keep] / 75.0
            proj[v[keep], u[keep], 1] = np.clip(intensity[keep], 0, 1.5) / 1.5
            proj[v[keep], u[keep], 2] = elong[keep] / 1.5
        else:
            proj[v[keep], u[keep], 0] = 1.0
            proj[v[keep], u[keep], 1] = np.clip(rng[keep] / 75.0, 0, 1)
            proj[v[keep], u[keep], 2] = np.clip(intensity[keep], 0, 1)
    return proj


def build_range_image_blobs(range_image: np.ndarray,
                            cam_projection: np.ndarray) -> Tuple[bytes, bytes]:
    """Inverse of the parse path (for tests / synthetic frames)."""

    def varint(v: int) -> bytes:
        out = b""
        v &= (1 << 64) - 1
        while True:
            b7 = v & 0x7F
            v >>= 7
            if v:
                out += bytes([b7 | 0x80])
            else:
                return out + bytes([b7])

    def ld(field, payload):
        return varint((field << 3) | 2) + varint(len(payload)) + payload

    def shape_msg(shape):
        packed = b"".join(varint(d) for d in shape)
        return ld(1, packed)

    ri = range_image.astype(np.float32)
    mf = ld(1, ri.reshape(-1).tobytes()) + ld(2, shape_msg(ri.shape))

    cp = cam_projection.astype(np.int64)
    packed = b"".join(varint(int(v)) for v in cp.reshape(-1))
    mi = ld(1, packed) + ld(2, shape_msg(cp.shape))
    return zlib.compress(mf), zlib.compress(mi)


def build_laser_proto(ri_blob: bytes, cam_blob: bytes,
                      laser_name: int = TOP_LIDAR) -> bytes:
    """Minimal Frame fragment with one laser (field 5) for tests."""

    def varint(v):
        out = b""
        while True:
            b7 = v & 0x7F
            v >>= 7
            if v:
                out += bytes([b7 | 0x80])
            else:
                return out + bytes([b7])

    def ld(field, payload):
        return varint((field << 3) | 2) + varint(len(payload)) + payload

    ri_msg = ld(2, ri_blob) + ld(3, cam_blob)
    laser = varint((1 << 3) | 0) + varint(laser_name) + ld(2, ri_msg)
    return ld(5, laser)
