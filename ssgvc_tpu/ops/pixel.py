"""Pixel (un)shuffle for NHWC tensors with torch-compatible channel ordering.

The codec patches frames 8x at the front of every transform
(reference: src/models/video_model.py:66, src/models/image_model.py:32) and
un-patches at the tail. We keep the exact channel ordering of
``torch.nn.functional.pixel_unshuffle`` so that imported PyTorch checkpoints
(and CPU-torch parity tests) line up channel-for-channel, while operating on
NHWC which is the natural TPU layout.
"""

from __future__ import annotations

import jax.numpy as jnp


def pixel_unshuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(B, H*r, W*r, C) -> (B, H, W, C*r*r).

    Output channel ``c*r*r + i*r + j`` holds input pixel offset ``(i, j)`` of
    channel ``c`` — identical ordering to torch's NCHW pixel_unshuffle.
    """
    b, hr, wr, c = x.shape
    h, w = hr // r, wr // r
    x = x.reshape(b, h, r, w, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (B, H, W, C, i, j)
    return x.reshape(b, h, w, c * r * r)


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(B, H, W, C*r*r) -> (B, H*r, W*r, C). Inverse of :func:`pixel_unshuffle`."""
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (B, H, i, W, j, C)
    return x.reshape(b, h * r, w * r, c)
