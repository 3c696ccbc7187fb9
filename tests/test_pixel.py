"""Pixel (un)shuffle: round-trip + channel-order parity with torch."""

import numpy as np
import jax.numpy as jnp
import pytest

from ssgvc_tpu.ops.pixel import pixel_shuffle, pixel_unshuffle


@pytest.mark.parametrize("r", [2, 8])
def test_round_trip(r):
    x = np.random.default_rng(0).normal(size=(2, 2 * r, 3 * r, 5)).astype(np.float32)
    y = pixel_unshuffle(jnp.asarray(x), r)
    assert y.shape == (2, 2, 3, 5 * r * r)
    x2 = pixel_shuffle(y, r)
    np.testing.assert_allclose(np.asarray(x2), x, rtol=0, atol=0)


@pytest.mark.parametrize("r", [2, 8])
def test_torch_channel_order(r):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    x = np.random.default_rng(1).normal(size=(2, 3, 2 * r, 4 * r)).astype(np.float32)
    ref = F.pixel_unshuffle(torch.from_numpy(x), r).numpy()  # NCHW
    ours = pixel_unshuffle(jnp.asarray(x.transpose(0, 2, 3, 1)), r)  # NHWC
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref, atol=0)

    ref_s = F.pixel_shuffle(torch.from_numpy(ref), r).numpy()
    ours_s = pixel_shuffle(ours, r)
    np.testing.assert_allclose(np.asarray(ours_s).transpose(0, 3, 1, 2), ref_s, atol=0)


def test_patch_down_conv_matches_unshuffle_plus_1x1():
    import numpy as np
    from ssgvc_tpu.ops.pixel import patch_down_conv, pixel_unshuffle

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 24, 3)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 1, 3 * 64, 7)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(7,)), jnp.float32)

    ref = jnp.einsum("bhwc,co->bhwo", pixel_unshuffle(x, 8), k[0, 0]) + b
    out = patch_down_conv(x, k, b, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_patch_up_conv_matches_1x1_plus_shuffle():
    import numpy as np
    from ssgvc_tpu.ops.pixel import patch_up_conv, pixel_shuffle

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 3, 5, 11)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 1, 11, 3 * 64)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(3 * 64,)), jnp.float32)

    ref = pixel_shuffle(jnp.einsum("bhwc,co->bhwo", x, k[0, 0]) + b, 8)
    out = patch_up_conv(x, k, b, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
