"""DMCI — the DCVC-RT intra (I-frame) codec, TPU-native.

Rebuild of src/models/image_model.py (and its parameterized twin
src/refactor/image_model.py): 8x pixel-unshuffle front end, 7-block
DepthConv encoder to N=256 latents at 1/16 resolution, factorized hyper z at
1/64, a 4-pass checkerboard spatial prior, and a 13-block decoder.

Differences from the reference implementation:
  * NHWC + HWIO throughout; per-QP q tables are (QP, C) gathers so a traced
    scalar qp serves all 64 QPs from one compiled graph.
  * Quantizer noise comes from the flax 'noise' RNG collection.
  * forward returns estimated bpp (training path); the real coded path lives
    in coding/ and reuses the same prior modules.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import DMCIConfig
from ..layers.blocks import (
    DepthConvBlock,
    ResidualBlockUpsample,
    ResidualBlockWithStride2,
    conv,
)
from ..layers.quant import noise_quant, ste_round
from ..ops.pixel import pixel_shuffle
from .common import (bpp_from_bits, compress_prior_4x, pad_for_y,
                     qp_gain_ramp_init)
from .entropy import BitEstimator, gaussian_bits_cdf


class IntraEncoder(nn.Module):
    """pixel_unshuffle(8) -> DCB -> xq -> 6 DCB -> s2 conv to N
    (src/models/image_model.py:16-43)."""

    cfg: DMCIConfig
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, quant_step: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        # enc_1's adaptor fuses the pixel_unshuffle(8) (same param layout)
        out = DepthConvBlock(c.enc_dec, name="enc_1", patch_in=c.patch_size,
                             dtype=self.dtype)(x)
        out = out * quant_step
        for i in range(6):
            out = DepthConvBlock(c.enc_dec, name=f"enc_2_{i}", dtype=self.dtype)(out)
        return conv(c.N, 3, stride=2, padding=1, name="enc_2_6", dtype=self.dtype)(out)


class IntraDecoder(nn.Module):
    """Mirror decoder: subpel up + 12 DCB -> xq -> DCB -> pixel_shuffle(8)
    (src/models/image_model.py:46-75)."""

    cfg: DMCIConfig
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, quant_step: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        out = ResidualBlockUpsample(c.enc_dec, name="dec_1_0", dtype=self.dtype)(x)
        for i in range(1, 13):
            out = DepthConvBlock(c.enc_dec, name=f"dec_1_{i}", dtype=self.dtype)(out)
        out = out * quant_step
        out = DepthConvBlock(c.src, name="dec_2", dtype=self.dtype)(out)
        return pixel_shuffle(out, c.patch_size)


class DMCI(nn.Module):
    """Intra codec (src/models/image_model.py:96-261)."""

    cfg: DMCIConfig = DMCIConfig()

    @property
    def dtype(self):
        return jnp.bfloat16 if self.cfg.dtype == "bfloat16" else None

    def setup(self):
        c = self.cfg
        dt = self.dtype
        self.enc = IntraEncoder(c, dtype=dt)
        self.hyper_enc_0 = DepthConvBlock(c.z_channel, dtype=dt)
        self.hyper_enc_1 = ResidualBlockWithStride2(c.z_channel, dtype=dt)
        self.hyper_enc_2 = ResidualBlockWithStride2(c.z_channel, dtype=dt)
        self.hyper_dec_0 = ResidualBlockUpsample(c.z_channel, dtype=dt)
        self.hyper_dec_1 = ResidualBlockUpsample(c.z_channel, dtype=dt)
        self.hyper_dec_2 = DepthConvBlock(c.N, dtype=dt)
        self.y_prior_fusion_0 = DepthConvBlock(c.N * 2, dtype=dt)
        self.y_prior_fusion_1 = DepthConvBlock(c.N * 2, dtype=dt)
        self.y_prior_fusion_2 = DepthConvBlock(c.N * 2, dtype=dt)
        self.y_prior_fusion_3 = conv(c.N * 2 + 2, 1, dtype=dt)
        self.y_spatial_prior_reduction = conv(c.N, 1, dtype=dt)
        self.y_spatial_prior_adaptor_1 = DepthConvBlock(c.N * 2, force_adaptor=True, dtype=dt)
        self.y_spatial_prior_adaptor_2 = DepthConvBlock(c.N * 2, force_adaptor=True, dtype=dt)
        self.y_spatial_prior_adaptor_3 = DepthConvBlock(c.N * 2, force_adaptor=True, dtype=dt)
        self.y_spatial_prior_0 = DepthConvBlock(c.N * 2, dtype=dt)
        self.y_spatial_prior_1 = DepthConvBlock(c.N * 2, dtype=dt)
        self.y_spatial_prior_2 = DepthConvBlock(c.N * 2, dtype=dt)
        self.y_spatial_prior_3 = conv(c.N * 2, 1, dtype=dt)
        self.dec = IntraDecoder(c, dtype=dt)
        enc_init = (qp_gain_ramp_init() if c.qp_ramp_init
                    else nn.initializers.ones)
        dec_init = (qp_gain_ramp_init(inverse=True) if c.qp_ramp_init
                    else nn.initializers.ones)
        self.q_scale_enc = self.param(
            "q_scale_enc", enc_init, (c.qp_num, c.enc_dec))
        self.q_scale_dec = self.param(
            "q_scale_dec", dec_init, (c.qp_num, c.enc_dec))
        # Bootstrap gain on z (ones == reference identity; calibrated for
        # from-scratch runs — see models/dmc.py setup + training/calibrate.py)
        self.z_gain = self.param("z_gain", nn.initializers.ones,
                                 (c.z_channel,))
        self.bit_estimator_z = BitEstimator(c.qp_num, c.z_channel)

    def hyper_enc(self, x):
        return (self.hyper_enc_2(self.hyper_enc_1(self.hyper_enc_0(x)))
                * self.z_gain.astype(self.dtype or jnp.float32))

    def hyper_dec(self, x):
        return self.hyper_dec_2(self.hyper_dec_1(self.hyper_dec_0(x)))

    def y_prior_fusion(self, x):
        x = self.y_prior_fusion_2(self.y_prior_fusion_1(self.y_prior_fusion_0(x)))
        return self.y_prior_fusion_3(x)

    def y_spatial_prior(self, x):
        x = self.y_spatial_prior_2(self.y_spatial_prior_1(self.y_spatial_prior_0(x)))
        return self.y_spatial_prior_3(x)

    def transform_analysis(self, x, qp):
        """Source frame -> (y, q_dec) — shared by forward and compress."""
        qdt = self.dtype or self.q_scale_enc.dtype
        q_enc = (jnp.take(self.q_scale_enc, qp, axis=0)
                 .reshape(1, 1, 1, -1).astype(qdt))
        q_dec = (jnp.take(self.q_scale_dec, qp, axis=0)
                 .reshape(1, 1, 1, -1).astype(qdt))
        return self.enc(x, q_enc), q_dec

    def prior_params(self, z_hat, y_shape):
        """z_hat -> fused prior params cropped to y's spatial dims."""
        params = self.y_prior_fusion(self.hyper_dec(z_hat))
        return params[:, : y_shape[1], : y_shape[2], :]

    def __call__(self, x: jnp.ndarray, qp: jnp.ndarray, train: bool = False):
        """x: (B, H, W, 3) YCbCr in [0,1]; qp: int32 scalar. Returns dict of
        dpb/bpp like the reference forward (src/models/image_model.py:205-261)."""
        y, q_dec = self.transform_analysis(x, qp)
        y_pad = pad_for_y(y)

        z = self.hyper_enc(y_pad)
        z_hat = ste_round(z)
        rng = self.make_rng("noise") if train else None
        rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
        z_hat_write = noise_quant(z, rngs[0], train)

        params = self.prior_params(z_hat, y.shape)
        prior = compress_prior_4x(
            y, params,
            reduction=self.y_spatial_prior_reduction,
            adaptors=(self.y_spatial_prior_adaptor_1,
                      self.y_spatial_prior_adaptor_2,
                      self.y_spatial_prior_adaptor_3),
            spatial_prior=self.y_spatial_prior,
            rng=rngs[1], train=train)

        x_hat = jnp.clip(self.dec(prior.y_hat, q_dec), 0.0, 1.0)

        pixel_num = x.shape[1] * x.shape[2]
        bits_y = gaussian_bits_cdf(prior.y_q_hat_write, prior.scales_hat)
        bits_z = self.bit_estimator_z.bits(z_hat_write, qp)
        bpp_y = bpp_from_bits(bits_y, pixel_num)
        bpp_z = bpp_from_bits(bits_z, pixel_num)

        return {
            "dpb": {"frame": x_hat, "feature": None},
            "bpp": bpp_y + bpp_z,
            "bpp_y": bpp_y,
            "bpp_z": bpp_z,
        }
