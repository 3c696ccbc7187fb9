"""Pallas TPU kernels: fused pixel-(un)shuffle + 1x1 conv.

The codec's frame boundaries are 8x pixel (un)shuffles around 1x1 convs
(Encoder front: unshuffle(8) -> conv1x1 192->ch_d; Recon tail: conv1x1
ch_recon->192 -> shuffle(8) -> clamp). Under XLA these lower to 6-D
transposes + copies with a 3-channel minor dimension — ~15% of the P-frame
step at 1080p (profiled). These kernels keep the data in VMEM, do the
(i, j, c) permutation on registers, and feed the MXU directly:

  patch_embed:    out[h, w, o]           = sum_{c,i,j} x[8h+i, 8w+j, c] * W[(c,i,j), o] + b[o]
  patch_deembed:  out[8h+i, 8w+j, c]     = clip(sum_k f[h, w, k] * W[k, (c,i,j)] + b[(c,i,j)])

Weight layout matches the models' HWIO 1x1 kernels reshaped to 2-D, so the
kernels are drop-in replacements with identical parameters.

STATUS: experimental. Current Mosaic (jax 0.9) rejects the in-kernel
rank-4 -> rank-2 shape cast ("infer-vector-layout: unsupported shape cast"),
so these compile only in interpret mode; XLA's own lowering is within ~15%
of the step budget at 1080p, so the win is bounded. Kept as infrastructure +
tests for when Mosaic grows relayout support.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _embed_kernel(x_ref, w_ref, b_ref, o_ref, *, patch: int, in_ch: int):
    # x_ref: (patch, W*patch, in_ch) — `patch` input rows for one output row
    # w_ref: (patch*patch*in_ch, out_ch) with torch (c, i, j) input ordering
    # o_ref: (1, W, out_ch)
    p = patch
    w_out = o_ref.shape[1]
    x = x_ref[...]  # (p, W*p, C)
    x = x.reshape(p, w_out, p, in_ch)          # (i, w, j, c)
    x = x.transpose(1, 3, 0, 2)                # (w, c, i, j)
    x = x.reshape(w_out, p * p * in_ch)
    acc = jnp.dot(x, w_ref[...], preferred_element_type=jnp.float32)
    o_ref[0, :, :] = (acc + b_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def patch_embed(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                patch: int = 8, interpret: bool = False) -> jnp.ndarray:
    """x: (B, H*p, W*p, C); kernel: (1, 1, C*p*p, O) HWIO of the conv applied
    after pixel_unshuffle (input channel order c*p*p + i*p + j); bias: (O,).
    Returns (B, H, W, O)."""
    b, hp, wp, c = x.shape
    p = patch
    h, w = hp // p, wp // p
    out_ch = kernel.shape[-1]
    w2d = kernel.reshape(c * p * p, out_ch)

    def run(x1):
        return pl.pallas_call(
            functools.partial(_embed_kernel, patch=p, in_ch=c),
            grid=(h,),
            in_specs=[
                pl.BlockSpec((p, wp, c), lambda i: (i, 0, 0),
                             memory_space=pl.ANY if interpret else pltpu.VMEM),
                pl.BlockSpec((c * p * p, out_ch), lambda i: (0, 0),
                             memory_space=pl.ANY if interpret else pltpu.VMEM),
                pl.BlockSpec((out_ch,), lambda i: (0,),
                             memory_space=pl.ANY if interpret else pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, w, out_ch), lambda i: (i, 0, 0),
                                   memory_space=pl.ANY if interpret else pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((h, w, out_ch), x.dtype),
            interpret=interpret,
        )(x1, w2d, bias)

    return jax.vmap(run)(x)


def _deembed_kernel(f_ref, w_ref, b_ref, o_ref, *, patch: int, out_ch: int,
                    clip: Optional[Tuple[float, float]]):
    # f_ref: (1, W, K); w_ref: (K, out_ch*p*p) with torch (c, i, j) output
    # ordering; o_ref: (patch, W*patch, out_ch)
    p = patch
    w_in = f_ref.shape[1]
    acc = jnp.dot(f_ref[0], w_ref[...], preferred_element_type=jnp.float32)
    acc = acc + b_ref[...].astype(jnp.float32)
    if clip is not None:
        acc = jnp.clip(acc, clip[0], clip[1])
    y = acc.reshape(w_in, out_ch, p, p)        # (w, c, i, j)
    y = y.transpose(2, 0, 3, 1)                # (i, w, j, c)
    o_ref[...] = y.reshape(p, w_in * p, out_ch).astype(o_ref.dtype)


def patch_deembed(f: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                  patch: int = 8, clip: Optional[Tuple[float, float]] = (0.0, 1.0),
                  interpret: bool = False) -> jnp.ndarray:
    """f: (B, H, W, K); kernel: (1, 1, K, C*p*p) HWIO of the head conv whose
    output feeds pixel_shuffle (output channel order c*p*p + i*p + j);
    bias: (C*p*p,). Returns (B, H*p, W*p, C), optionally clipped."""
    b, h, w, k = f.shape
    p = patch
    cpp = kernel.shape[-1]
    out_ch = cpp // (p * p)
    w2d = kernel.reshape(k, cpp)

    def run(f1):
        return pl.pallas_call(
            functools.partial(_deembed_kernel, patch=p, out_ch=out_ch,
                              clip=clip),
            grid=(h,),
            in_specs=[
                pl.BlockSpec((1, w, k), lambda i: (i, 0, 0),
                             memory_space=pl.ANY if interpret else pltpu.VMEM),
                pl.BlockSpec((k, cpp), lambda i: (0, 0),
                             memory_space=pl.ANY if interpret else pltpu.VMEM),
                pl.BlockSpec((cpp,), lambda i: (0,),
                             memory_space=pl.ANY if interpret else pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((p, w * p, out_ch), lambda i: (i, 0, 0),
                                   memory_space=pl.ANY if interpret else pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((h * p, w * p, out_ch), f.dtype),
            interpret=interpret,
        )(f1, w2d, bias)

    return jax.vmap(run)(f)
