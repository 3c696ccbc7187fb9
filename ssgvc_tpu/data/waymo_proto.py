"""Minimal protobuf wire-format walker for Waymo Frame protos.

Instead of vendoring 1500 lines of protoc-generated pb2 (as the reference's
ext/simple-waymo-open-dataset-reader does), we walk the wire format directly
for the two fields the codec pipeline needs:

    Frame.images        = field 4 (repeated CameraImage)      [dataset.proto:282]
    CameraImage.name    = field 1 (enum; FRONT = 1)           [dataset.proto:225]
    CameraImage.image   = field 2 (bytes, JPEG)               [dataset.proto:227]
    Frame.context.name  = context field 1 -> name field 1     [dataset.proto:275]

This keeps the data pipeline free of protobuf version pins (the reference
requires protobuf<=3.20; this parser works with none at all).
"""

from __future__ import annotations

import io
from typing import Dict, Iterator, Optional, Tuple

FRONT = 1  # CameraName.FRONT


def _read_varint(buf: memoryview, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def iter_fields(data: memoryview) -> Iterator[Tuple[int, int, memoryview]]:
    """Yield (field_number, wire_type, payload_view) over one message."""
    pos = 0
    n = len(data)
    while pos < n:
        tag, pos = _read_varint(data, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:  # varint
            val, pos = _read_varint(data, pos)
            yield field, wire, val
        elif wire == 1:  # 64-bit
            yield field, wire, data[pos:pos + 8]
            pos += 8
        elif wire == 2:  # length-delimited
            length, pos = _read_varint(data, pos)
            yield field, wire, data[pos:pos + length]
            pos += length
        elif wire == 5:  # 32-bit
            yield field, wire, data[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")


def parse_camera_images(frame_bytes: bytes) -> Dict[int, bytes]:
    """Frame proto -> {camera_name: jpeg_bytes}."""
    out: Dict[int, bytes] = {}
    for field, wire, payload in iter_fields(memoryview(frame_bytes)):
        if field == 4 and wire == 2:  # Frame.images
            name = None
            image = None
            for f2, w2, p2 in iter_fields(payload):
                if f2 == 1 and w2 == 0:
                    name = p2
                elif f2 == 2 and w2 == 2:
                    image = bytes(p2)
            if name is not None and image is not None:
                out[name] = image
    return out


def parse_front_jpeg(frame_bytes: bytes) -> Optional[bytes]:
    return parse_camera_images(frame_bytes).get(FRONT)


def parse_context_name(frame_bytes: bytes) -> Optional[str]:
    for field, wire, payload in iter_fields(memoryview(frame_bytes)):
        if field == 1 and wire == 2:  # Frame.context
            for f2, w2, p2 in iter_fields(payload):
                if f2 == 1 and w2 == 2:  # Context.name
                    return bytes(p2).decode("utf-8", "replace")
    return None


def decode_jpeg(jpeg_bytes: bytes):
    """JPEG -> (H, W, 3) uint8 RGB (PIL; cv2 is not in this image)."""
    from PIL import Image
    import numpy as np

    img = Image.open(io.BytesIO(jpeg_bytes)).convert("RGB")
    return np.asarray(img, dtype=np.uint8)


def encode_jpeg(rgb, quality: int = 95) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def build_frame_proto(jpeg_bytes: bytes, camera_name: int = FRONT,
                      context_name: str = "synthetic") -> bytes:
    """Construct a minimal Frame proto (for tests / synthetic datasets)."""

    def varint(v: int) -> bytes:
        out = b""
        while True:
            b7 = v & 0x7F
            v >>= 7
            if v:
                out += bytes([b7 | 0x80])
            else:
                return out + bytes([b7])

    def ld(field: int, payload: bytes) -> bytes:
        return varint((field << 3) | 2) + varint(len(payload)) + payload

    cam = (varint((1 << 3) | 0) + varint(camera_name) +
           ld(2, jpeg_bytes))
    ctx = ld(1, context_name.encode())
    return ld(1, ctx) + ld(4, cam)
