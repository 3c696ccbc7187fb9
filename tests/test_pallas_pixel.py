"""Fused pixel-(un)shuffle + 1x1 conv Pallas kernels vs the XLA reference
composition (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssgvc_tpu.ops.pallas_pixel import patch_deembed, patch_embed
from ssgvc_tpu.ops.pixel import pixel_shuffle, pixel_unshuffle


def test_patch_embed_matches_unshuffle_conv():
    rng = np.random.default_rng(0)
    p = 8
    x = jnp.asarray(rng.normal(size=(2, 32, 48, 3)), jnp.float32)
    kernel = jnp.asarray(rng.normal(size=(1, 1, 3 * p * p, 16), scale=0.1),
                         jnp.float32)
    bias = jnp.asarray(rng.normal(size=(16,)), jnp.float32)

    ref = jax.lax.conv_general_dilated(
        pixel_unshuffle(x, p), kernel, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    out = patch_embed(x, kernel, bias, patch=p, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4,
                               rtol=1e-4)


def test_patch_deembed_matches_conv_shuffle_clip():
    rng = np.random.default_rng(1)
    p = 8
    f = jnp.asarray(rng.normal(size=(2, 4, 6, 32)), jnp.float32)
    kernel = jnp.asarray(rng.normal(size=(1, 1, 32, 3 * p * p), scale=0.1),
                         jnp.float32)
    bias = jnp.asarray(rng.normal(size=(3 * p * p,)), jnp.float32)

    conv = jax.lax.conv_general_dilated(
        f, kernel, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    ref = jnp.clip(pixel_shuffle(conv, p), 0.0, 1.0)
    out = patch_deembed(f, kernel, bias, patch=p, clip=(0.0, 1.0),
                        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4,
                               rtol=1e-4)


def test_patch_deembed_no_clip():
    rng = np.random.default_rng(2)
    p = 2
    f = jnp.asarray(rng.normal(size=(1, 3, 5, 8)), jnp.float32)
    kernel = jnp.asarray(rng.normal(size=(1, 1, 8, 4 * p * p)), jnp.float32)
    bias = jnp.zeros((4 * p * p,), jnp.float32)
    conv = jax.lax.conv_general_dilated(
        f, kernel, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ref = pixel_shuffle(conv, p)
    out = patch_deembed(f, kernel, bias, patch=p, clip=None, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4,
                               rtol=1e-4)
