"""Minimal TFRecord reader/writer (the Waymo container format).

Our own implementation of the framing the vendored reader parses
(ext/simple-waymo-open-dataset-reader/__init__.py:19-91): each record is

    uint64  length        (little endian)
    uint32  masked_crc32c(length bytes)
    bytes   data[length]
    uint32  masked_crc32c(data)

CRC verification is optional (off by default — the cache pipeline re-reads
files it just wrote). The CRC32C uses the Castagnoli polynomial with the
TFRecord masking  masked = ((crc >> 15 | crc << 17) + 0xa282ead8) & 0xffffffff.
"""

from __future__ import annotations

import os
import struct
from typing import Iterator, List, Optional

import numpy as np

_CRC_TABLE: Optional[np.ndarray] = None
_POLY = 0x82F63B78  # Castagnoli, reflected


def _crc_table() -> np.ndarray:
    global _CRC_TABLE
    if _CRC_TABLE is None:
        table = np.zeros(256, np.uint32)
        for i in range(256):
            crc = i
            for _ in range(8):
                crc = (crc >> 1) ^ (_POLY if crc & 1 else 0)
            table[i] = crc
        _CRC_TABLE = table
    return _CRC_TABLE


def crc32c(data: bytes) -> int:
    table = _crc_table()
    crc = np.uint32(0xFFFFFFFF)
    buf = np.frombuffer(data, np.uint8)
    # table-driven, vectorized in chunks via python loop on bytes is slow;
    # use numpy cumulative approach per byte (data sizes here are small
    # headers or verification-only payloads)
    crc_int = int(crc)
    tab = table
    for b in buf:
        crc_int = (crc_int >> 8) ^ int(tab[(crc_int ^ int(b)) & 0xFF])
    return crc_int ^ 0xFFFFFFFF


def masked_crc32c(data: bytes) -> int:
    crc = crc32c(data)
    return ((crc >> 15 | crc << 17) + 0xA282EAD8) & 0xFFFFFFFF


def read_records(path: str, verify_crc: bool = False) -> Iterator[bytes]:
    """Yield raw record payloads from a TFRecord file."""
    with open(path, "rb") as f:
        while True:
            header = f.read(12)
            if len(header) < 12:
                return
            (length,) = struct.unpack("<Q", header[:8])
            if verify_crc:
                (len_crc,) = struct.unpack("<I", header[8:12])
                if masked_crc32c(header[:8]) != len_crc:
                    raise IOError(f"{path}: corrupt length crc")
            data = f.read(length)
            if len(data) < length:
                raise IOError(f"{path}: truncated record")
            data_crc_raw = f.read(4)
            if verify_crc:
                (data_crc,) = struct.unpack("<I", data_crc_raw)
                if masked_crc32c(data) != data_crc:
                    raise IOError(f"{path}: corrupt data crc")
            yield data


def count_records(path: str) -> int:
    """Count records by walking headers only (no payload copies)."""
    n = 0
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        pos = 0
        while pos + 12 <= size:
            header = f.read(8)
            (length,) = struct.unpack("<Q", header)
            pos += 12 + length + 4
            f.seek(pos)
            n += 1
    return n


def record_offsets(path: str) -> List[int]:
    """Byte offsets of each record (for random access)."""
    offsets = []
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        pos = 0
        while pos + 12 <= size:
            offsets.append(pos)
            f.seek(pos)
            (length,) = struct.unpack("<Q", f.read(8))
            pos += 12 + length + 4
    return offsets


def read_record_at(f, offset: int) -> bytes:
    f.seek(offset)
    (length,) = struct.unpack("<Q", f.read(8))
    f.seek(offset + 12)
    return f.read(length)


def write_records(path: str, records) -> None:
    """Write payloads as a TFRecord file (with proper CRCs)."""
    with open(path, "wb") as f:
        for data in records:
            header = struct.pack("<Q", len(data))
            f.write(header)
            f.write(struct.pack("<I", masked_crc32c(header)))
            f.write(data)
            f.write(struct.pack("<I", masked_crc32c(data)))
