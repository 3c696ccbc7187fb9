"""Shared codec math: checkerboard masks, masked quantization, spatial priors.

Functional TPU rebuild of the reference's ``CompressionModel`` base
(src/models/common_model.py, src/refactor/common_model.py). Everything here is
pure: masks are built at trace time from static shapes (they become XLA
constants), quantizer noise comes from explicit PRNG keys, and the 2-/4-pass
checkerboard priors are expressed as straight-line jitted code.

Layout is NHWC; "channel halves/quarters" in mask construction refer to the
last axis.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..layers.quant import noise_quant, ste_round


# ---------------------------------------------------------------------------
# checkerboard masks (src/models/common_model.py:92-169)
# ---------------------------------------------------------------------------

def qp_gain_ramp_init(lo: float = 0.25, hi: float = 5.0,
                      inverse: bool = False):
    """Initializer for per-QP gain tables of shape (qp_total, C): a
    geometric ramp from ``lo`` (qp 0) to ``hi`` (last row), constant across
    channels. Higher qp -> larger encoder gain -> larger latent magnitude ->
    more bits, matching lambda(qp) rising 50 -> 38400, so the variable-rate
    ladder exists at step 0 of a from-scratch run. The reference inits ones
    (src/models/video_model.py:201-202) and relies on DCVC-RT pretrained
    tables; checkpoint import overwrites this init either way. The 20x
    lo->hi span (widened from 13x after the r04 2.1 dB QP-ladder
    compression) gives QP 8->56 a ~9x latent-magnitude ratio at init."""
    def init(key, shape, dtype=jnp.float32):
        ramp = jnp.exp(jnp.linspace(jnp.log(lo), jnp.log(hi), shape[0]))
        if inverse:
            ramp = 1.0 / ramp
        return jnp.broadcast_to(ramp[:, None], shape).astype(dtype)

    return init


def _parity_grids(height: int, width: int, channel: int):
    """On-device (H, W, C) index parities. Generated with broadcasted_iota so
    no multi-MB mask constants get baked into the HLO (which stalls
    compilation at 1080p latents)."""
    hh = jax.lax.broadcasted_iota(jnp.int32, (1, height, width, channel), 1)
    ww = jax.lax.broadcasted_iota(jnp.int32, (1, height, width, channel), 2)
    cc = jax.lax.broadcasted_iota(jnp.int32, (1, height, width, channel), 3)
    return hh % 2, ww % 2, cc


def checkerboard_masks_2x(channel: int, height: int, width: int,
                          dtype=jnp.float32):
    """Two complementary (1, H, W, C) masks: checker pattern ((1,0),(0,1))
    on the first channel half, inverted on the second; mask_1 swaps them
    (src/models/common_model.py:101-114)."""
    assert channel % 2 == 0
    hp, wp, cc = _parity_grids(height, width, channel)
    checker = (hp + wp) % 2 == 0          # the ((1,0),(0,1)) micro pattern
    first_half = cc < (channel // 2)
    mask_0 = jnp.where(first_half, checker, ~checker).astype(dtype)
    mask_1 = (1.0 - mask_0).astype(dtype)
    return mask_0, mask_1


def checkerboard_masks_4x(channel: int, height: int, width: int,
                          dtype=jnp.float32):
    """Four complementary (1, H, W, C) masks over channel quarters with the
    reference's pass orders (src/models/common_model.py:152-169):
      mask_0 quarters use micro patterns (0,1,2,3), mask_1 (3,2,1,0),
      mask_2 (2,3,0,1), mask_3 (1,0,3,2), where pattern k lights pixel
      (h%2, w%2) == (k//2, k%2)."""
    assert channel % 4 == 0
    hp, wp, cc = _parity_grids(height, width, channel)
    pattern = hp * 2 + wp                 # which micro-cell this pixel is
    quarter = cc // (channel // 4)
    orders = jnp.asarray([(0, 1, 2, 3), (3, 2, 1, 0), (2, 3, 0, 1),
                          (1, 0, 3, 2)], jnp.int32)

    def build(i):
        want = jnp.take(orders[i], quarter)
        return (pattern == want).astype(dtype)

    return build(0), build(1), build(2), build(3)


# ---------------------------------------------------------------------------
# masked quantization (src/models/common_model.py:81-90)
# ---------------------------------------------------------------------------

class MaskedQuant(NamedTuple):
    y_res: jnp.ndarray
    y_q_hat: jnp.ndarray        # STE twin (drives reconstruction gradients)
    y_q_hat_write: jnp.ndarray  # noise twin (drives the bit estimate)
    y_hat: jnp.ndarray
    scales_hat: jnp.ndarray


def process_with_mask(y, scales, means, mask, rng: Optional[jax.Array],
                      train: bool) -> MaskedQuant:
    scales_hat = scales * mask
    means_hat = means * mask
    y_res = (y - means_hat) * mask
    y_q_hat = ste_round(y_res) * mask
    y_q_hat_write = noise_quant(y_res, rng, train) * mask
    y_hat = y_q_hat + means_hat
    return MaskedQuant(y_res, y_q_hat, y_q_hat_write, y_hat, scales_hat)


# ---------------------------------------------------------------------------
# padding helpers (src/models/common_model.py:54-72)
# ---------------------------------------------------------------------------

def get_padding_size(height: int, width: int, p: int = 64) -> Tuple[int, int]:
    new_h = (height + p - 1) // p * p
    new_w = (width + p - 1) // p * p
    return new_w - width, new_h - height  # (pad_right, pad_bottom)


def get_downsampled_shape(height: int, width: int, p: int) -> Tuple[int, int]:
    return (height + p - 1) // p, (width + p - 1) // p


def pad_for_y(y: jnp.ndarray, p: int = 4) -> jnp.ndarray:
    """Replicate-pad bottom/right to a multiple of p (NHWC)."""
    _, h, w, _ = y.shape
    pad_r, pad_b = get_padding_size(h, w, p)
    if pad_r == 0 and pad_b == 0:
        return y
    return jnp.pad(y, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)), mode="edge")


# ---------------------------------------------------------------------------
# prior separation + checkerboard passes
# ---------------------------------------------------------------------------

class PriorOut(NamedTuple):
    y_res: jnp.ndarray
    y_q_hat: jnp.ndarray
    y_q_hat_write: jnp.ndarray
    y_hat: jnp.ndarray
    scales_hat: jnp.ndarray


def compress_prior_2x(y: jnp.ndarray, common_params: jnp.ndarray,
                      spatial_prior: Callable[[jnp.ndarray], jnp.ndarray],
                      rng: Optional[jax.Array], train: bool,
                      fm_s: Optional[jnp.ndarray] = None) -> PriorOut:
    """Two-pass checkerboard prior for P-frames
    (src/models/common_model.py:121-149).

    common_params carries (q_dec, scales, means) stacked on channels; q_dec is
    clamped at 0.5 and folded into y as a reciprocal before quantization.

    ``fm_s`` (optional): per-channel feature-modulation scale, shape
    broadcastable to (B, 1, 1, C) — folded into the coded domain as y/fm_s
    with the FIRST pass's scales/means divided likewise, and multiplied back
    into y_hat after dequant (the second pass's spatial prior already
    predicts in the divided domain). Mirrors the refactor hook
    (src/refactor/common_model.py:147-188); unused by the live reference
    variants but exposed for parity.
    """
    q_dec, scales, means = jnp.split(common_params, 3, axis=-1)
    q_dec = jnp.maximum(q_dec, 0.5)
    y = y * (1.0 / q_dec)
    if fm_s is not None:
        y = y / fm_s
        scales = scales / fm_s
        means = means / fm_s

    c, h, w = y.shape[-1], y.shape[1], y.shape[2]
    mask_0, mask_1 = checkerboard_masks_2x(c, h, w, dtype=y.dtype)
    rng0, rng1 = jax.random.split(rng) if rng is not None else (None, None)

    p0 = process_with_mask(y, scales, means, mask_0, rng0, train)
    # tuple input: the prior's first conv consumes the concat implicitly
    scales1, means1 = jnp.split(spatial_prior((p0.y_hat, common_params)),
                                2, axis=-1)
    p1 = process_with_mask(y, scales1, means1, mask_1, rng1, train)

    y_hat = (p0.y_hat + p1.y_hat) * q_dec
    if fm_s is not None:
        y_hat = y_hat * fm_s
    return PriorOut(
        y_res=p0.y_res + p1.y_res,
        y_q_hat=p0.y_q_hat + p1.y_q_hat,
        y_q_hat_write=p0.y_q_hat_write + p1.y_q_hat_write,
        y_hat=y_hat,
        scales_hat=p0.scales_hat + p1.scales_hat,
    )


def separate_prior_image(params: jnp.ndarray):
    """Image-model prior split: first 2 channels -> sigmoid q_enc/q_dec in
    [0.5, 2.0]; rest -> scales/means (src/models/common_model.py:171-181)."""
    q = jax.nn.sigmoid(params[..., :2]) * 1.5 + 0.5
    q_enc = q[..., 0:1]
    q_dec = q[..., 1:2]
    scales, means = jnp.split(params[..., 2:], 2, axis=-1)
    return q_enc, q_dec, scales, means


def compress_prior_4x(y: jnp.ndarray, common_params: jnp.ndarray,
                      reduction: Callable, adaptors: Tuple[Callable, Callable, Callable],
                      spatial_prior: Callable,
                      rng: Optional[jax.Array], train: bool,
                      fm_s: Optional[jnp.ndarray] = None) -> PriorOut:
    """Four-pass checkerboard prior for the intra model
    (src/models/common_model.py:188-248). ``fm_s`` as in
    :func:`compress_prior_2x` (src/refactor/common_model.py:227-298)."""
    q_enc, q_dec, scales, means = separate_prior_image(common_params)
    if fm_s is not None:
        y = y / fm_s
        scales = scales / fm_s
        means = means / fm_s
    reduced = reduction(common_params)

    c, h, w = y.shape[-1], y.shape[1], y.shape[2]
    masks = checkerboard_masks_4x(c, h, w, dtype=y.dtype)
    rngs = jax.random.split(rng, 4) if rng is not None else (None,) * 4

    y = y * q_enc

    passes = []
    p = process_with_mask(y, scales, means, masks[0], rngs[0], train)
    passes.append(p)
    y_hat_so_far = p.y_hat
    for i, adaptor in enumerate(adaptors):
        params_i = (y_hat_so_far, reduced)
        scales_i, means_i = jnp.split(spatial_prior(adaptor(params_i)), 2, axis=-1)
        p = process_with_mask(y, scales_i, means_i, masks[i + 1], rngs[i + 1], train)
        passes.append(p)
        y_hat_so_far = y_hat_so_far + p.y_hat

    y_hat = y_hat_so_far * q_dec
    if fm_s is not None:
        y_hat = y_hat * fm_s
    return PriorOut(
        y_res=sum(p.y_res for p in passes),
        y_q_hat=sum(p.y_q_hat for p in passes),
        y_q_hat_write=sum(p.y_q_hat_write for p in passes),
        y_hat=y_hat,
        scales_hat=sum(p.scales_hat for p in passes),
    )


def bpp_from_bits(bits: jnp.ndarray, pixel_num: int) -> jnp.ndarray:
    """Sum bits over (H, W, C), divide by source pixels -> per-sample bpp."""
    return jnp.sum(bits, axis=(1, 2, 3)) / pixel_num
