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


# ---------------------------------------------------------------------------
# fused patching convs
#
# pixel_unshuffle(r) followed by a 1x1 conv is mathematically one stride-r
# rxr conv on the raw frame; a 1x1 conv followed by pixel_shuffle(r) is one
# stride-r transposed conv. Profiling the 1080p P-frame loop shows the
# explicit (un)shuffles cost ~1.5 ms/frame of pure data formatting (layout
# copies at ~35 GB/s effective), so the models apply these fused forms while
# keeping the PARAMETER layout of the unfused 1x1 convs — torch checkpoints
# and earlier JAX checkpoints load unchanged, and the math is identical up to
# float summation order.
# ---------------------------------------------------------------------------

# Empirically toggled: whether the conv-fused forms beat the explicit
# (un)shuffle + matmul on the target TPU. Measured on v5e (1080p,
# experiments/bench_sweep.py): BOTH fused forms LOSE — the stride-8 conv is
# lane-starved by the 3-channel input (88.3 vs 97.4 fps) and conv_transpose
# lowers to a dilated conv (85.0 fps) — so the defaults stay off and the
# shuffles run explicitly. The real fix for the ~1.5 ms/frame of 1080p
# formatting is DMCConfig.packed_io (keep the whole loop in the unshuffled
# domain); these flags remain for re-tuning on other TPU generations.
import os as _os

FUSE_DOWN = _os.environ.get("SSGVC_FUSE_DOWN", "0") == "1"
FUSE_UP = _os.environ.get("SSGVC_FUSE_UP", "0") == "1"


def patch_down_conv(x: jnp.ndarray, kernel_1x1: jnp.ndarray,
                    bias: jnp.ndarray, r: int) -> jnp.ndarray:
    """Fused pixel_unshuffle(r) + 1x1 conv.

    x: (B, H*r, W*r, C); kernel_1x1: (1, 1, C*r*r, O) in the channel order of
    :func:`pixel_unshuffle` (c*r*r + i*r + j); returns (B, H, W, O).
    """
    import jax

    if not FUSE_DOWN:
        u = pixel_unshuffle(x, r)
        out = jnp.einsum("bhwc,co->bhwo", u, kernel_1x1[0, 0].astype(u.dtype))
        return out + bias.astype(out.dtype)

    crr, o = kernel_1x1.shape[2], kernel_1x1.shape[3]
    c = crr // (r * r)
    k = kernel_1x1.reshape(c, r, r, o).transpose(1, 2, 0, 3)  # (r, r, C, O)
    out = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), window_strides=(r, r), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + bias.astype(out.dtype)


def patch_up_conv(x: jnp.ndarray, kernel_1x1: jnp.ndarray,
                  bias: jnp.ndarray, r: int) -> jnp.ndarray:
    """Fused 1x1 conv + pixel_shuffle(r).

    x: (B, H, W, I); kernel_1x1: (1, 1, I, C*r*r); returns (B, H*r, W*r, C).
    The bias is per shuffled output channel, i.e. position-dependent after
    the shuffle — added as an r x r tiled pattern.
    """
    import jax

    i_ch, crr = kernel_1x1.shape[2], kernel_1x1.shape[3]
    c = crr // (r * r)
    if not FUSE_UP:
        out = jnp.einsum("bhwc,co->bhwo", x,
                         kernel_1x1[0, 0].astype(x.dtype))
        return pixel_shuffle(out + bias.astype(out.dtype), r)

    # (r, r, I, C), spatially flipped: conv_transpose convolves with the
    # un-flipped kernel, so pre-flip to get the direct scatter semantics
    k = kernel_1x1.reshape(i_ch, c, r, r).transpose(2, 3, 0, 1)[::-1, ::-1]
    out = jax.lax.conv_transpose(
        x, k.astype(x.dtype), strides=(r, r), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    bias_tile = bias.reshape(c, r, r).transpose(1, 2, 0)  # (r, r, C)
    h, w = out.shape[1] // r, out.shape[2] // r
    bias_img = jnp.tile(bias_tile, (h, w, 1))
    return out + bias_img.astype(out.dtype)
