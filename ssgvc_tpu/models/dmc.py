"""DMC — the conditional inter (P-frame) codec, TPU-native, all variants.

One parameterized model replaces the reference's four near-identical files
(src/models/video_model.py, src/refactor/video_model.py,
src/refactor/seg_video_model.py, seg_video_model_fast.py,
mask_prop_seg_video_model.py). Conditioning is selected by DMCConfig:

  mask_mode='none'        baseline DMC ('old' with legacy_old=True, else the
                          refactor 'plain' rewrite)
  mask_mode='sft_latent'  'performance': a mask-driven SFT (gamma, beta)
                          modulates the latent y BEFORE the hyper-encoder and
                          before checkerboard coding
                          (src/refactor/seg_video_model.py:327-338)
  mask_mode='film_hyper'  'fast': a light FiLM conditions only the
                          hyper-encoder input; the coded y is untouched
                          (src/refactor/seg_video_model_fast.py:287-325)
  mask_source='propagated' 'mask_prop': after the first P-frame the mask is
                          predicted decoder-side by MaskPredictor instead of
                          transmitted (src/refactor/mask_prop_seg_video_model.py:365-368)

No optical flow / warping anywhere: temporal redundancy flows through the
decoded feature of the previous frame (dpb) into FeatureExtractor -> (ctx,
ctx_t) conditioning, exactly like DCVC-RT.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import DMCConfig
from ..layers.blocks import (
    DepthConvBlock,
    PatchDownConv,
    PatchUpConv,
    ResidualBlockUpsample,
    ResidualBlockWithStride2,
    SubpelConv2x,
    _pallas_chain_wanted,
    conv,
    wsilu,
)
from ..ops.pallas_dcb_chain import dcb_chain_fused
from ..layers.quant import noise_quant, ste_round
from .common import (bpp_from_bits, compress_prior_2x, pad_for_y,
                     qp_gain_ramp_init)
from .entropy import BitEstimator, gaussian_bits, gaussian_bits_cdf


def _dcb_pair(f, names, ch, dtype):
    """Run consecutive adaptor-free DCBs, as ONE chained Pallas kernel when
    SSGVC_PALLAS_DCB=2 and the shapes qualify, else as the XLA composition.
    Param tree is identical either way (DepthConvBlock(return_params=True)
    declares the same names), so the flag stays runtime-only."""
    if _pallas_chain_wanted(f, ch, len(names)):
        blocks = [DepthConvBlock(ch, name=nm, dtype=dtype)(
            None, return_params=True) for nm in names]
        return dcb_chain_fused(f, blocks)
    for nm in names:
        f = DepthConvBlock(ch, name=nm, dtype=dtype)(f)
    return f


class FeatureExtractor(nn.Module):
    """2 DCB -> (x1, ctx_t = x1*q); 4 more DCB -> ctx
    (src/models/video_model.py:23-49)."""

    cfg: DMCConfig
    dtype: Any = None

    def setup(self):
        d = self.cfg.ch_d
        self.conv1_0 = DepthConvBlock(d, dtype=self.dtype)
        self.conv1_1 = DepthConvBlock(d, dtype=self.dtype)
        self.conv2_0 = DepthConvBlock(d, dtype=self.dtype)
        self.conv2_1 = DepthConvBlock(d, dtype=self.dtype)
        self.conv2_2 = DepthConvBlock(d, dtype=self.dtype)
        self.conv2_3 = DepthConvBlock(d, dtype=self.dtype)

    def part1(self, x, quant):
        if _pallas_chain_wanted(x, self.cfg.ch_d, 2):
            blocks = [m(None, return_params=True)
                      for m in (self.conv1_0, self.conv1_1)]
            x1 = dcb_chain_fused(x, blocks)
        else:
            x1 = self.conv1_1(self.conv1_0(x))
        return x1, x1 * quant

    def part2(self, x1):
        if _pallas_chain_wanted(x1, self.cfg.ch_d, 4):
            blocks = [m(None, return_params=True)
                      for m in (self.conv2_0, self.conv2_1,
                                self.conv2_2, self.conv2_3)]
            return dcb_chain_fused(x1, blocks)
        return self.conv2_3(self.conv2_2(self.conv2_1(self.conv2_0(x1))))

    def __call__(self, x, quant):
        x1, ctx_t = self.part1(x, quant)
        return self.part2(x1), ctx_t


class Encoder(nn.Module):
    """Contextual analysis transform: unshuffle(8) -> 1x1 -> 3 DCB over
    cat(x, ctx) -> xq -> s2 conv to ch_y (src/refactor/seg_video_model.py:41-59;
    legacy naming from src/models/video_model.py:52-75)."""

    cfg: DMCConfig
    dtype: Any = None

    @nn.compact
    def __call__(self, x, ctx, quant_step):
        c = self.cfg
        if c.packed_io:
            # x arrives pre-unshuffled (B, H/8, W/8, 192): plain 1x1
            f = conv(c.ch_d, 1, name="conv1", dtype=self.dtype)(x)
        else:
            # pixel_unshuffle(8) + 1x1 in one op (same conv1 params)
            f = PatchDownConv(c.ch_d, c.patch_size, name="conv1",
                              dtype=self.dtype)(x)
        # (f, ctx) tuple: implicit concat through the first block's adaptor
        f = DepthConvBlock(c.ch_d, name="conv2_0", dtype=self.dtype)((f, ctx))
        names = ("conv2_1", "conv3" if c.legacy_old else "conv2_2")
        if _pallas_chain_wanted(f, c.ch_d, len(names)):
            # chain the adaptor-free tail (conv2_0 keeps the XLA path so its
            # Concat1x1 adaptor fuses with neighbors); the trailing
            # f*quant_step folds into the last block's q
            blocks = [DepthConvBlock(c.ch_d, name=nm, dtype=self.dtype)(
                None, return_params=True) for nm in names]
            f = dcb_chain_fused(f, blocks, q_last=quant_step)
        else:
            for nm in names:
                f = DepthConvBlock(c.ch_d, name=nm, dtype=self.dtype)(f)
            f = f * quant_step
        return conv(c.ch_y, 3, stride=2, padding=1, name="down", dtype=self.dtype)(f)


class Decoder(nn.Module):
    """Contextual synthesis transform. legacy ('old'): up -> 3 DCB(cat ctx)
    -> 1x1 -> xq (src/models/video_model.py:78-97); refactor: up -> xq ->
    3 DCB(cat ctx) -> 1x1 (src/refactor/seg_video_model.py:62-77)."""

    cfg: DMCConfig
    dtype: Any = None

    @nn.compact
    def __call__(self, x, ctx, quant_step):
        c = self.cfg
        # recon_residual: the final projection starts at zero and the
        # (identity-at-init) extracted context is added back, so a fresh
        # decoder emits exactly the DPB feature — see DMCConfig.recon_residual
        f = SubpelConv2x(c.ch_d, 3, padding=1, name="up", dtype=self.dtype)(x)
        if c.legacy_old:
            f = DepthConvBlock(c.ch_d, name="conv1_0", dtype=self.dtype)((f, ctx))
            f = _dcb_pair(f, ("conv1_1", "conv1_2"), c.ch_d, self.dtype)
            f = conv(c.ch_d, 1, name="conv2", dtype=self.dtype,
                     zero_init=c.recon_residual)(f)
            f = f * quant_step
            return f + ctx if c.recon_residual else f
        f = f * quant_step
        f = DepthConvBlock(c.ch_d, name="conv_0", dtype=self.dtype)((f, ctx))
        f = _dcb_pair(f, ("conv_1", "conv_2"), c.ch_d, self.dtype)
        f = conv(c.ch_d, 1, name="proj", dtype=self.dtype,
                 zero_init=c.recon_residual)(f)
        return f + ctx if c.recon_residual else f


class ReconGeneration(nn.Module):
    """feature -> 4 DCB(recon width) -> xq -> 1x1 head -> shuffle(8) -> clamp
    (src/models/video_model.py:100-120)."""

    cfg: DMCConfig
    dtype: Any = None

    @nn.compact
    def __call__(self, x, quant_step, prev=None):
        c = self.cfg
        # recon_residual: zero-init head + previous-frame skip — a fresh
        # model reconstructs the previous decoded frame exactly (copy-prev
        # bound from step 0); see DMCConfig.recon_residual
        residual = c.recon_residual and prev is not None
        f = DepthConvBlock(c.ch_recon, name="conv_0", dtype=self.dtype)(x)
        f = DepthConvBlock(c.ch_recon, name="conv_1", dtype=self.dtype)(f)
        f = DepthConvBlock(c.ch_recon, name="conv_2", dtype=self.dtype)(f)
        f = DepthConvBlock(c.ch_recon, name="conv_3", dtype=self.dtype)(f)
        f = f * quant_step
        if c.packed_io:
            # emit the PACKED frame (B, H/8, W/8, 192); clip commutes with
            # the (skipped) channel->pixel permutation
            f = conv(c.src, 1, name="head", dtype=self.dtype,
                     zero_init=c.recon_residual)(f)
        else:
            # 1x1 head + pixel_shuffle(8) in one op (same head params)
            f = PatchUpConv(c.src // (c.patch_size ** 2), c.patch_size,
                            name="head", dtype=self.dtype,
                            zero_init=c.recon_residual)(f)
        if residual:
            f = f + prev.astype(f.dtype)
        return jnp.clip(f, 0.0, 1.0)


class HyperEncoder(nn.Module):
    """DCB -> 2x RBS2, /4 in space (src/models/video_model.py:123-133)."""

    cfg: DMCConfig
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = DepthConvBlock(c.ch_z, name="conv_0", dtype=self.dtype)(x)
        x = ResidualBlockWithStride2(c.ch_z, name="conv_1", dtype=self.dtype)(x)
        return ResidualBlockWithStride2(c.ch_z, name="conv_2", dtype=self.dtype)(x)


class HyperDecoder(nn.Module):
    """2x RBU -> DCB to ch_y (src/models/video_model.py:136-146)."""

    cfg: DMCConfig
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = ResidualBlockUpsample(c.ch_z, name="conv_0", dtype=self.dtype)(x)
        x = ResidualBlockUpsample(c.ch_z, name="conv_1", dtype=self.dtype)(x)
        return DepthConvBlock(c.ch_y, name="conv_2", dtype=self.dtype)(x)


class PriorFusion(nn.Module):
    """3 DCB + 1x1 over cat(hyper, temporal) -> 3*ch_y params
    (src/models/video_model.py:149-160)."""

    cfg: DMCConfig
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        w = self.cfg.ch_y * 3
        # (hierarchical, temporal) widths sum to w -> conv_0 has no adaptor
        # (implicit plain concat): the whole 3-block stack is chain-eligible
        if isinstance(x, (tuple, list)) \
                and sum(t.shape[-1] for t in x) == w:
            x = jnp.concatenate(x, axis=-1)
        if isinstance(x, jnp.ndarray):
            x = _dcb_pair(x, ("conv_0", "conv_1", "conv_2"), w, self.dtype)
        else:  # adaptor case: conv_0 absorbs the tuple, rest chain-eligible
            x = DepthConvBlock(w, name="conv_0", dtype=self.dtype)(x)
            x = _dcb_pair(x, ("conv_1", "conv_2"), w, self.dtype)
        return conv(w, 1, name="conv_3", dtype=self.dtype)(x)


class SpatialPrior(nn.Module):
    """2 DCB + 1x1: cat(y_hat, params) -> (scales, means)
    (src/models/video_model.py:163-173)."""

    cfg: DMCConfig
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = DepthConvBlock(c.ch_y * 3, name="conv_0", dtype=self.dtype)(x)
        x = DepthConvBlock(c.ch_y * 3, name="conv_1", dtype=self.dtype)(x)
        return conv(c.ch_y * 2, 1, name="conv_2", dtype=self.dtype)(x)


class SFT(nn.Module):
    """Mask SFT for the 'performance' variant: mirrors the Encoder on the
    pixel-unshuffled mask, xq_sft, s2 conv to 2*ch_y -> (gamma, beta)
    (src/refactor/seg_video_model.py:159-196)."""

    cfg: DMCConfig
    dtype: Any = None

    @nn.compact
    def __call__(self, mask, q_sft):
        c = self.cfg
        if c.packed_io:
            x = conv(c.ch_d, 1, name="conv1", dtype=self.dtype)(mask)
        else:
            x = PatchDownConv(c.ch_d, c.patch_size, name="conv1",
                              dtype=self.dtype)(mask)
        x = DepthConvBlock(c.ch_d, name="conv2_0", dtype=self.dtype)(x)
        x = DepthConvBlock(c.ch_d, name="conv2_1", dtype=self.dtype)(x)
        x = DepthConvBlock(c.ch_d, name="conv2_2", dtype=self.dtype)(x)
        x = x * q_sft
        x = conv(c.ch_y * 2, 3, stride=2, padding=1, name="down", dtype=self.dtype)(x)
        gamma, beta = jnp.split(x, 2, axis=-1)
        return gamma, beta


class MaskFiLM(nn.Module):
    """Light mask FiLM for 'fast'/'mask_prop': 3x3 -> ReLU -> 1x1 to 2*ch_y
    (src/refactor/seg_video_model_fast.py:159-180)."""

    ch_y: int
    mid: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(self, m):
        x = conv(self.mid, 3, padding=1, name="net_0", dtype=self.dtype)(m)
        x = nn.relu(x)
        x = conv(self.ch_y * 2, 1, name="net_2", dtype=self.dtype)(x)
        gamma, beta = jnp.split(x, 2, axis=-1)
        return gamma, beta


class MaskPredictor(nn.Module):
    """Decoder-side mask propagation FCN (src/refactor/mask_predictor.py:7-46):
    bilinear-down prev mask to ctx res, embed, fuse with (ctx, ctx_t),
    predict logits, bilinear-up back."""

    cfg: DMCConfig
    dtype: Any = None

    @nn.compact
    def __call__(self, prev_mask, ctx, ctx_t):
        c = self.cfg
        mid = c.ch_d // 4
        b, hm, wm, _ = prev_mask.shape
        hf, wf = ctx.shape[1], ctx.shape[2]
        m = jax.image.resize(prev_mask, (b, hf, wf, 1), method="bilinear")
        m = conv(c.ch_d, 3, padding=1, name="mask_embed", dtype=self.dtype)(m)
        fused = jnp.concatenate([m, ctx, ctx_t], axis=-1)
        x = conv(mid, 3, padding=1, name="net_0", dtype=self.dtype)(fused)
        x = wsilu(x)
        x = conv(mid, 3, padding=1, name="net_2", dtype=self.dtype)(x)
        x = wsilu(x)
        logits = conv(1, 1, name="net_4", dtype=self.dtype)(x)
        if (hf, wf) != (hm, wm):
            logits = jax.image.resize(logits, (b, hm, wm, 1), method="bilinear")
        return logits


class DMC(nn.Module):
    """Unified conditional P-frame codec."""

    cfg: DMCConfig = DMCConfig()

    @property
    def dtype(self):
        return jnp.bfloat16 if self.cfg.dtype == "bfloat16" else None

    def setup(self):
        c = self.cfg
        dt = self.dtype
        qp_total = c.qp_num + c.extra_qp
        # adaptor absorbs the frame's pixel_unshuffle(8): takes the RAW frame
        # (or, with packed_io, the already-unshuffled one — same params)
        self.feature_adaptor_i = DepthConvBlock(
            c.ch_d, patch_in=0 if c.packed_io else c.patch_size, dtype=dt)
        self.feature_adaptor_p = conv(c.ch_d, 1, dtype=dt)
        self.feature_extractor = FeatureExtractor(c, dtype=dt)
        self.encoder = Encoder(c, dtype=dt)
        self.hyper_encoder = HyperEncoder(c, dtype=dt)
        self.hyper_decoder = HyperDecoder(c, dtype=dt)
        self.temporal_prior_encoder = ResidualBlockWithStride2(c.ch_y * 2, dtype=dt)
        self.y_prior_fusion = PriorFusion(c, dtype=dt)
        self.y_spatial_prior = SpatialPrior(c, dtype=dt)
        self.decoder = Decoder(c, dtype=dt)
        self.recon_generation_net = ReconGeneration(c, dtype=dt)

        if c.mask_mode == "sft_latent":
            self.mask_sft = SFT(c, dtype=dt)
            self.q_sft = self.param("q_sft", nn.initializers.ones,
                                    (qp_total, c.ch_d))
        elif c.mask_mode == "film_hyper":
            self.mask_film = MaskFiLM(c.ch_y, dtype=dt)
        if c.mask_source == "propagated":
            self.mask_predictor = MaskPredictor(c, dtype=dt)

        enc_init = (qp_gain_ramp_init() if c.qp_ramp_init
                    else nn.initializers.ones)
        dec_init = (qp_gain_ramp_init(inverse=True) if c.qp_ramp_init
                    else nn.initializers.ones)
        self.q_encoder = self.param("q_encoder", enc_init,
                                    (qp_total, c.ch_d))
        self.q_decoder = self.param("q_decoder", dec_init,
                                    (qp_total, c.ch_d))
        self.q_feature = self.param("q_feature", nn.initializers.ones,
                                    (qp_total, c.ch_d))
        self.q_recon = self.param("q_recon", nn.initializers.ones,
                                  (qp_total, c.ch_recon))
        # Bootstrap gain on the hyper latent z. The reference has no such
        # parameter because it always finetunes pretrained DCVC-RT weights
        # whose hyper analysis already emits unit-scale latents; a fresh
        # flax init gives std(z) ~ 0.1, so round(z) == 0 everywhere and the
        # hyperprior is dead from step 0 (see training/calibrate.py). Ones
        # == identity, so checkpoint import keeps reference semantics.
        self.z_gain = self.param("z_gain", nn.initializers.ones, (c.ch_z,))
        self.bit_estimator_z = BitEstimator(qp_total, c.ch_z)

    # -- helpers -----------------------------------------------------------

    def shift_qp(self, qp, fa_idx):
        """qp + qp_shift[fa_idx]; fa_idx may be traced
        (src/models/video_model.py:335-336)."""
        shift = jnp.asarray(self.cfg.qp_shift, dtype=jnp.int32)
        return qp + jnp.take(shift, fa_idx)

    def predict_mask(self, prev_mask, ctx, ctx_t):
        """Decoder-side mask propagation, packed_io-aware.

        With packed_io the mask circulates pixel-unshuffled
        (B, H/8, W/8, 64); the propagation FCN's bilinear resizes need raw
        resolution, so unpack just the 1-channel mask, predict, and repack
        the logits. pixel_shuffle/unshuffle are lossless permutations, so
        the packed chain is bit-identical to the raw-domain one (and the
        1-ch 1080p permutes are ~2 MB — negligible next to the conv stack).
        """
        c = self.cfg
        if c.packed_io:
            from ..ops.pixel import pixel_shuffle, pixel_unshuffle
            raw = pixel_shuffle(prev_mask, c.patch_size)
            logits = self.mask_predictor(raw, ctx, ctx_t)
            return pixel_unshuffle(logits, c.patch_size)
        return self.mask_predictor(prev_mask, ctx, ctx_t)

    def apply_feature_adaptor(self, dpb: Dict[str, jnp.ndarray], after_i):
        """Select the I- or P-frame feature adaptor.

        ``after_i`` may be a traced bool; both branches are cheap relative to
        the rest of the network, and in the GOP scan we keep it static per
        step when possible. dpb carries both 'frame' and 'feature'.
        """
        feat_i = lambda: self.feature_adaptor_i(dpb["frame"])
        feat_p = lambda: self.feature_adaptor_p(dpb["feature"])
        if isinstance(after_i, bool):
            return feat_i() if after_i else feat_p()
        return jnp.where(after_i, feat_i(), feat_p())

    def hyper_z(self, y, current_mask):
        """Hyper analysis incl. the bootstrap z gain — single definition so
        the training forward and the real coded path quantize the same z."""
        return (self.hyper_encoder(self._hyper_input(y, current_mask))
                * self.z_gain.astype(self.dtype or jnp.float32))

    def res_prior_param_decoder(self, z_hat, ctx_t):
        hierarchical = self.hyper_decoder(z_hat)
        temporal = self.temporal_prior_encoder(ctx_t)
        h, w = temporal.shape[1], temporal.shape[2]
        hierarchical = hierarchical[:, :h, :w, :]
        return self.y_prior_fusion((hierarchical, temporal))

    def _mask_to_latent_res(self, mask, y):
        """Average-pool the mask to y's spatial resolution (the reference's
        adaptive_avg_pool2d with integer ratio)."""
        b, hm, wm, _ = mask.shape
        hy, wy = y.shape[1], y.shape[2]
        fh, fw = hm // hy, wm // wy
        m = mask[:, : hy * fh, : wy * fw, :]
        m = m.reshape(b, hy, fh, wy, fw, 1).mean(axis=(2, 4))
        return jnp.clip(m, 0.0, 1.0)

    def _hyper_input(self, y, mask):
        """Variant-dependent hyper-encoder input."""
        c = self.cfg
        if c.mask_mode == "film_hyper":
            # fast/mask_prop: pad y, FiLM with the (pooled, zero-padded) mask
            # (src/refactor/seg_video_model_fast.py:287-325)
            y_pad = pad_for_y(y)
            if c.packed_io:
                # channel-mean of the packed mask == 8x8 block mean; the
                # remaining spatial pool then matches the raw-domain pooling
                mask = mask.mean(axis=-1, keepdims=True)
            m = self._mask_to_latent_res(mask, y)
            pad_b = y_pad.shape[1] - y.shape[1]
            pad_r = y_pad.shape[2] - y.shape[2]
            if pad_b or pad_r:
                m = jnp.pad(m, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
            gamma, beta = self.mask_film(m)
            return y_pad * (1.0 + gamma) + beta
        if c.mask_mode == "sft_latent":
            # performance: y is already SFT-modulated; hyper input is raw y
            # (src/refactor/seg_video_model.py:331)
            return y
        return pad_for_y(y)

    # -- forward -----------------------------------------------------------

    def __call__(self, x: jnp.ndarray, qp: jnp.ndarray,
                 dpb: Dict[str, jnp.ndarray], after_i=True,
                 mask: Optional[jnp.ndarray] = None, train: bool = False):
        """x: (B, H, W, 3) YCbCr; mask: (B, H, W, 1) or None; qp: int32.

        Returns {'dpb': {'frame', 'feature'}, 'bpp', 'bpp_y', 'bpp_z',
        'mask_pred'} — estimated-bpp training path
        (src/refactor/seg_video_model.py:301-365 and variants).
        """
        c = self.cfg
        if c.packed_io:
            # x: (B, H/8, W/8, 192) pre-unshuffled; mask likewise (.., 64)
            if mask is None:
                mask = jnp.zeros(x.shape[:3] + (c.patch_size ** 2,), x.dtype)
        else:
            if x.shape[-1] > 3:
                # reference-style packed input: 4th channel is the mask
                # (src/refactor/seg_video_model.py:303-308)
                if mask is None:
                    mask = x[..., 3:4]
                x = x[..., :3]
            if mask is None:
                mask = jnp.zeros(x.shape[:3] + (1,), x.dtype)

        # cast the gathered per-QP vectors to the compute dtype up front —
        # otherwise each `* q` upcasts a full (H/8, W/8, C) activation to f32
        # (a 33 MB materialization per site at 1080p, seen in traces)
        qdt = self.dtype or self.q_encoder.dtype
        take = lambda t: jnp.take(t, qp, axis=0).reshape(1, 1, 1, -1).astype(qdt)
        q_encoder = take(self.q_encoder)
        q_decoder = take(self.q_decoder)
        q_feature = take(self.q_feature)
        q_recon = take(self.q_recon)

        feature = self.apply_feature_adaptor(dpb, after_i)
        ctx, ctx_t = self.feature_extractor(feature, q_feature)
        y = self.encoder(x, ctx, q_encoder)

        mask_pred = None
        current_mask = mask
        if c.mask_source == "propagated":
            # after the first P-frame, the decoder-side prediction replaces
            # the transmitted mask (mask_prop_seg_video_model.py:365-368)
            pred_logits = self.predict_mask(mask, ctx, ctx_t)
            if isinstance(after_i, bool):
                current_mask = mask if after_i else pred_logits
            else:
                current_mask = jnp.where(after_i, mask, pred_logits)
            mask_pred = pred_logits

        if c.mask_mode == "sft_latent":
            q_sft = take(self.q_sft)
            gamma, beta = self.mask_sft(current_mask, q_sft)
            y = y * (1.0 + gamma) + beta

        z = self.hyper_z(y, current_mask)
        z_hat = ste_round(z)
        rng = self.make_rng("noise") if train else None
        rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
        z_hat_write = noise_quant(z, rngs[0], train)

        params = self.res_prior_param_decoder(z_hat, ctx_t)
        prior = compress_prior_2x(y, params, self.y_spatial_prior,
                                  rngs[1], train)

        feature_out = self.decoder(prior.y_hat, ctx, q_decoder)
        x_hat = self.recon_generation_net(
            feature_out, q_recon,
            prev=dpb["frame"] if c.recon_residual else None)

        pixel_num = x.shape[1] * x.shape[2]
        if c.packed_io:
            pixel_num *= c.patch_size ** 2  # x is at 1/8 res; bpp is per
            #                                 SOURCE pixel
        scales_for_bit = (jnp.maximum(prior.scales_hat, c.bits_sigma_floor)
                          if c.bits_sigma_floor else prior.scales_hat)
        if c.legacy_old:
            bits_y = gaussian_bits_cdf(prior.y_q_hat_write, scales_for_bit)
        else:
            # The reference clamps to +-6 "to keep z-scores sane"
            # (src/refactor/seg_video_model.py:347) — torch needs it, but it
            # UNDERCOUNTS the symbol tail exactly where high-QP rates live
            # (r04: 15-19% estimated-vs-real bpp gap at QP56). gaussian_bits
            # here is already z-clipped and prob-floored, so we clamp only
            # to the coder's actual symbol domain (+-127, the int8 packed
            # (sym<<8)|idx stream format — coding/codec.py SYM_MIN/MAX).
            y_for_bit = jnp.clip(prior.y_q_hat_write, -127.0, 127.0)
            bits_y = gaussian_bits(y_for_bit, scales_for_bit)
        bits_z = self.bit_estimator_z.bits(z_hat_write, qp)
        bpp_y = bpp_from_bits(bits_y, pixel_num)
        bpp_z = bpp_from_bits(bits_z, pixel_num)

        return {
            "dpb": {"frame": x_hat, "feature": feature_out},
            "bpp": bpp_y + bpp_z,
            "bpp_y": bpp_y,
            "bpp_z": bpp_z,
            "mask_pred": mask_pred,
        }
