"""Checkerboard masks, padding helpers, masked quantization."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssgvc_tpu.models.common import (
    checkerboard_masks_2x,
    checkerboard_masks_4x,
    get_downsampled_shape,
    get_padding_size,
    pad_for_y,
    process_with_mask,
)

from conftest import add_reference_to_path, reference_available


def test_masks_2x_complementary():
    m0, m1 = checkerboard_masks_2x(8, 6, 10)
    np.testing.assert_array_equal(np.asarray(m0 + m1), np.ones((1, 6, 10, 8)))


def test_masks_4x_complementary():
    masks = checkerboard_masks_4x(8, 6, 10)
    total = sum(np.asarray(m) for m in masks)
    np.testing.assert_array_equal(total, np.ones((1, 6, 10, 8)))


@pytest.mark.skipif(not reference_available(), reason="no reference oracle")
def test_masks_match_reference():
    add_reference_to_path()
    torch = pytest.importorskip("torch")
    from src.models.common_model import CompressionModel as RefCM

    cm = RefCM(z_channel=8)
    ref0, ref1 = cm.get_mask_2x(1, 8, 6, 10, torch.float32, "cpu")
    m0, m1 = checkerboard_masks_2x(8, 6, 10)
    np.testing.assert_array_equal(np.asarray(m0).transpose(0, 3, 1, 2), ref0.numpy())
    np.testing.assert_array_equal(np.asarray(m1).transpose(0, 3, 1, 2), ref1.numpy())

    refs = cm.get_mask_4x(1, 8, 6, 10, torch.float32, "cpu")
    ours = checkerboard_masks_4x(8, 6, 10)
    for r, o in zip(refs, ours):
        np.testing.assert_array_equal(np.asarray(o).transpose(0, 3, 1, 2), r.numpy())


def test_padding_size():
    assert get_padding_size(100, 200, 64) == (56, 28)
    assert get_padding_size(128, 128, 64) == (0, 0)
    assert get_downsampled_shape(1080, 1920, 64) == (17, 30)


def test_pad_for_y_replicates_edge():
    y = jnp.arange(2 * 3 * 5 * 1, dtype=jnp.float32).reshape(2, 3, 5, 1)
    out = pad_for_y(y, 4)
    assert out.shape == (2, 4, 8, 1)
    np.testing.assert_array_equal(np.asarray(out[:, 3]), np.asarray(out[:, 2]))
    np.testing.assert_array_equal(np.asarray(out[:, :, 7]), np.asarray(out[:, :, 4]))


def test_process_with_mask_eval():
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=(1, 4, 4, 2)).astype(np.float32))
    scales = jnp.ones_like(y) * 0.7
    means = jnp.asarray(rng.normal(size=(1, 4, 4, 2)).astype(np.float32))
    m0, _ = checkerboard_masks_2x(2, 4, 4)
    out = process_with_mask(y, scales, means, m0, None, train=False)
    res = np.asarray(out.y_res)
    np.testing.assert_array_equal(res * np.asarray(m0), res)  # masked out
    np.testing.assert_allclose(np.asarray(out.y_hat),
                               np.asarray(out.y_q_hat + means * m0), atol=1e-6)
    # quantized residuals are integers
    q = np.asarray(out.y_q_hat)
    np.testing.assert_allclose(q, np.round(q), atol=1e-6)


def test_fm_s_hook_identity_and_fold():
    """Optional fm_s feature modulation on the 2x prior
    (src/refactor/common_model.py:147-188): fm_s=1 is bit-identical to no
    fm_s; fm_s>1 shrinks the coded symbols (y quantized in the divided
    domain) while y_hat returns to the original domain."""
    from ssgvc_tpu.models.common import compress_prior_2x

    rng = np.random.default_rng(0)
    c = 8
    y = jnp.asarray(rng.normal(size=(1, 6, 10, c)) * 4, jnp.float32)
    common = jnp.asarray(
        np.concatenate([np.ones((1, 6, 10, c)),                 # q_dec
                        np.full((1, 6, 10, c), 1.0),            # scales
                        rng.normal(size=(1, 6, 10, c)) * 0.1],  # means
                       axis=-1), jnp.float32)

    prior = lambda t: jnp.concatenate(
        [jnp.ones_like(t[0]), jnp.zeros_like(t[0])], axis=-1)

    base = compress_prior_2x(y, common, prior, None, False)
    ident = compress_prior_2x(y, common, prior, None, False,
                              fm_s=jnp.ones((1, 1, 1, c)))
    np.testing.assert_array_equal(np.asarray(base.y_hat),
                                  np.asarray(ident.y_hat))
    np.testing.assert_array_equal(np.asarray(base.y_q_hat_write),
                                  np.asarray(ident.y_q_hat_write))

    fm = jnp.full((1, 1, 1, c), 4.0)
    folded = compress_prior_2x(y, common, prior, None, False, fm_s=fm)
    # coded symbols live in the divided domain: ~4x smaller magnitude
    assert (np.abs(np.asarray(folded.y_q_hat_write)).mean()
            < 0.5 * np.abs(np.asarray(base.y_q_hat_write)).mean())
    # y_hat is multiplied back into the original domain (coarser quant, but
    # same scale as y)
    err = np.abs(np.asarray(folded.y_hat) - np.asarray(y)).mean()
    assert err < 4.0 * 0.5 + 0.3  # within the coarsened quant step
