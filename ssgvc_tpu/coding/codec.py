"""Real bitstream encode/decode for DMCI (I-frames) and DMC (P-frames).

The reference's compress/decompress path is broken as shipped (undefined
``round_and_to_int8``/``get_cuda_stream``, commented-out decompress priors —
see src/models/video_model.py:256-333 and src/models/common_model.py:250-340).
This is a working reconstruction, TPU-native:

  * All NN stages are jitted device functions with static shapes; the entropy
    coder is host-side C++ rANS (coding/rans.py).
  * **The encoder calls the decoder's jitted stages** to derive prior params,
    scale indexes and reconstructions. Encoder-side and decoder-side floats
    therefore come from the *same compiled programs*, making the bitstream
    self-consistent by construction (no XLA fusion-order divergence can
    desync the arithmetic coder).
  * Checkerboard folding: each pass's symbols collapse across complementary
    channel halves/quarters (single_part_for_writing_*,
    src/models/common_model.py:116-119,183-186); decode restores with
    restore_y_2x/4x semantics (src/layers/inference.py:46-62).
  * Decode needs 2 (P) / 4 (I) symbol round-trips — one per checkerboard
    pass, the same structure DCVC-RT pipelines with its dual streams.
"""

from __future__ import annotations

import functools
import math
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..models import common
from ..models.dmc import DMC
from ..models.dmci import DMCI
from ..ops.pixel import pixel_shuffle, pixel_unshuffle
from . import cdf as cdf_mod
from .rans import EntropyCoder

SYM_MIN, SYM_MAX = -127, 127  # packed (symbol<<8)|index keeps symbols int8


def _fold2(x: jnp.ndarray) -> jnp.ndarray:
    a, b = jnp.split(x, 2, axis=-1)
    return a + b


def _fold4(x: jnp.ndarray) -> jnp.ndarray:
    a, b, c, d = jnp.split(x, 4, axis=-1)
    return (a + b) + (c + d)


def _restore2(y_q: jnp.ndarray, means: jnp.ndarray, mask: jnp.ndarray):
    return (jnp.concatenate([y_q, y_q], axis=-1) + means) * mask


def _restore4(y_q: jnp.ndarray, means: jnp.ndarray, mask: jnp.ndarray):
    return (jnp.concatenate([y_q] * 4, axis=-1) + means) * mask


def _pack(symbols: np.ndarray, indexes: np.ndarray) -> np.ndarray:
    """Fused (symbol<<8) | index int16 words (src/layers/inference.py:75-84)."""
    return ((symbols.astype(np.int32) << 8)
            + indexes.astype(np.int32)).astype(np.int16).reshape(-1)


class VideoCodec:
    """Trained DMCI + DMC params + rANS tables + jitted per-stage programs.

    ``skip_thres`` (optional) enables decode-side skip sparsification of the
    y coder: positions whose (decoder-derived) scale is <= skip_thres are not
    entropy-coded at all and restore as zero symbols — both sides compute the
    same skip set from the same jitted scales, so the stream stays in sync
    (src/layers/inference.py:75-84 ``skip`` packing).

    ``coder_profile``: None keeps the RT-style 128-level 0.11-16 Gaussian
    table; 'gaussian' / 'laplace' select the refactor GaussianEncoder's wide
    256-level tables (src/refactor/entropy_models.py:220-243).

    ``packed_dmc`` runs the P-frame stages in the PACKED (pixel-unshuffled)
    domain — the same ``DMCConfig.packed_io`` fast path the forward bench
    measures, with identical params (the 8x8 patching is a lossless
    permutation). Frames still enter and leave this API raw; the (un)shuffle
    happens inside the jitted stages, and the DPB carries the packed frame
    between P-frames so the hot loop never materializes raw-domain layout
    copies. Incompatible with mask_prop (raw-resolution mask resize)."""

    def __init__(self, dmci: DMCI, dmci_params, dmc: DMC, dmc_params,
                 scale_levels: int = 128, ec_part: int = 0,
                 skip_thres: float = 0.0, coder_profile: str = None,
                 packed_dmc: bool = False):
        if packed_dmc and not dmc.cfg.packed_io:
            import dataclasses
            dmc = DMC(dataclasses.replace(dmc.cfg, packed_io=True))
        self.dmci = dmci
        self.dmc = dmc
        self.params_i = dmci_params
        self.params_p = dmc_params
        self.ec_part = int(ec_part)
        self.skip_thres = float(skip_thres)
        if coder_profile is None:
            self.scale_min, self.scale_max = 0.11, 16.0
            self.scale_levels = scale_levels
            # pmf support must cover ~3.9 sigma of the LARGEST table scale,
            # else high-rate symbols fall off the row and escape-code: with
            # the old scan=8, 6% of pass-0 symbols escaped at QP56 on the
            # trained mid checkpoints (+25-30% real-vs-estimated bpp). The
            # refactor GaussianEncoder scans 50 for the same reason
            # (src/refactor/entropy_models.py:252).
            dist, scan = "gaussian", min(64, int(math.ceil(3.9 * 16.0)))
        else:
            prof = cdf_mod.REFRACTOR_PROFILES[coder_profile]
            self.scale_min = prof["scale_min"]
            self.scale_max = prof["scale_max"]
            self.scale_levels = prof["levels"]
            # scan 50 covers scale_max=64 (src/refactor/entropy_models.py:252)
            dist, scan = coder_profile, 50

        # quantized CDF tables — the reference's update() (SURVEY §2.4)
        self.ec_i = EntropyCoder()
        self.ec_p = EntropyCoder()
        y_tables = cdf_mod.build_y_cdf_tables(
            scale_min=self.scale_min, scale_max=self.scale_max,
            levels=self.scale_levels, scan_range=scan, distribution=dist)
        z_i = cdf_mod.build_z_cdf_tables(
            dmci_params["bit_estimator_z"], dmci.cfg.qp_num, dmci.cfg.z_channel)
        z_p = cdf_mod.build_z_cdf_tables(
            dmc_params["bit_estimator_z"], dmc.cfg.qp_num + dmc.cfg.extra_qp,
            dmc.cfg.ch_z)
        self.y_group_i = self.ec_i.add_cdf(*y_tables)
        self.z_group_i = self.ec_i.add_cdf(*z_i)
        self.y_group_p = self.ec_p.add_cdf(*y_tables)
        self.z_group_p = self.ec_p.add_cdf(*z_p)
        if self.ec_part:
            # split symbols across two rANS streams so decode parallelizes
            # (set_use_two_entropy_coders, src/models/entropy_models.py:79-81)
            self.ec_i.set_use_two_entropy_coders(True)
            self.ec_p.set_use_two_entropy_coders(True)

        self.enc_time = 0.0
        self.dec_time = 0.0

    def _build_idx(self, scales: jnp.ndarray) -> jnp.ndarray:
        """Scale -> table row for THIS codec's scale table (profile-aware)."""
        return cdf_mod.build_indexes_decoder(
            scales, scale_min=self.scale_min, scale_max=self.scale_max,
            levels=self.scale_levels)

    # ================================================================= DMC =

    @functools.partial(jax.jit, static_argnums=(0,))
    def _dmc_analysis(self, params, x, mask, qp, ctx, ctx_t):
        """Encoder-only transform: source frame -> (y, z_int8).
        Takes (ctx, ctx_t) from ``_dmc_fe`` so the FeatureExtractor runs
        exactly once per encoded frame. ``mask`` must already be the CURRENT
        frame's mask — for mask_prop the caller runs ``_dmc_predict_mask``
        first, so encoder and decoder derive the mask chain from the SAME
        jitted program (bit-identical chains by construction)."""
        m = self.dmc
        c = m.cfg

        def run(mod):
            nonlocal x, mask
            if c.packed_io:
                # raw API, packed hot path: unshuffle fuses into this stage
                x = pixel_unshuffle(x, c.patch_size)
                mask = pixel_unshuffle(mask, c.patch_size)
            q_encoder = jnp.take(mod.q_encoder, qp, axis=0).reshape(1, 1, 1, -1)
            y = mod.encoder(x, ctx, q_encoder)

            if c.mask_mode == "sft_latent":
                q_sft = jnp.take(mod.q_sft, qp, axis=0).reshape(1, 1, 1, -1)
                gamma, beta = mod.mask_sft(mask, q_sft)
                y = y * (1.0 + gamma) + beta

            z = mod.hyper_z(y, mask)
            z_int8 = jnp.clip(jnp.round(z), -128, 127).astype(jnp.int8)
            return {"y": y, "z_int8": z_int8}

        return m.apply({"params": params}, method=run)

    @functools.partial(jax.jit, static_argnums=(0, 4))
    def _dmc_fe(self, params, qp, dpb, after_i: bool):
        """Decoder-side temporal conditioning — depends ONLY on the DPB, so
        it is dispatched BEFORE the host entropy-decodes z and the device
        computes ctx while the host rANS runs (the reference's side-stream
        overlap, src/models/video_model.py:312-327)."""
        m = self.dmc

        def run(mod):
            d = dpb
            if m.cfg.packed_io and d["frame"].shape[-1] == 3:
                # raw I-frame recon entering the packed P-loop: pack once
                d = dict(d, frame=pixel_unshuffle(d["frame"],
                                                  m.cfg.patch_size))
            q_feature = jnp.take(mod.q_feature, qp, axis=0).reshape(1, 1, 1, -1)
            feature = mod.apply_feature_adaptor(d, after_i)
            x1, ctx_t = mod.feature_extractor.part1(feature, q_feature)
            ctx = mod.feature_extractor.part2(x1)
            return {"ctx_t": ctx_t, "ctx": ctx}

        return m.apply({"params": params}, method=run)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _dmc_prior(self, params, z_hat, ctx_t):
        """z -> prior params + pass-0 scale indexes (+ keep mask if skip)."""
        m = self.dmc

        def run(mod):
            params3 = mod.res_prior_param_decoder(z_hat, ctx_t)
            _, scales0, _ = jnp.split(params3, 3, axis=-1)
            ch, hh, ww = scales0.shape[-1], scales0.shape[1], scales0.shape[2]
            m0, _ = common.checkerboard_masks_2x(ch, hh, ww, dtype=scales0.dtype)
            folded = _fold2(scales0 * m0)
            idx0 = self._build_idx(folded)
            out = {"params3": params3, "idx0": idx0}
            if self.skip_thres > 0:
                # Clamp before the skip test, matching build_index_dec
                # (src/layers/inference.py): the reference clamps scales to
                # [scale_min, scale_max] and only then compares to skip_thres.
                out["keep0"] = jnp.clip(
                    folded, self.scale_min, self.scale_max) > self.skip_thres
            return out

        return m.apply({"params": params}, method=run)

    @functools.partial(jax.jit, static_argnums=(0, 4))
    def _dmc_quantize_pass(self, params, y, params3_or_means, pass_idx: int):
        """Encoder-only: quantize pass ``pass_idx`` residuals to folded int
        symbols. pass 0 takes params3; pass 1 takes means1."""
        m = self.dmc

        def run(mod):
            if pass_idx == 0:
                q_dec, _, means = jnp.split(params3_or_means, 3, axis=-1)
            else:
                q_dec = None
                means = params3_or_means["means"]
                q_dec = params3_or_means["q_dec"]
            q_dec = jnp.maximum(q_dec, 0.5)
            y_s = y * (1.0 / q_dec)
            ch, hh, ww = y.shape[-1], y.shape[1], y.shape[2]
            masks = common.checkerboard_masks_2x(ch, hh, ww, dtype=y.dtype)
            mk = masks[pass_idx]
            y_res = (y_s - means * mk) * mk
            y_q = jnp.clip(jnp.round(y_res), SYM_MIN, SYM_MAX) * mk
            return _fold2(y_q)

        return m.apply({"params": params}, method=run)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _dmc_stage_b(self, params, params3, y_q_r0):
        """Shared: restore pass 0, run spatial prior, pass-1 indexes."""
        m = self.dmc

        def run(mod):
            q_dec, _, means0 = jnp.split(params3, 3, axis=-1)
            ch, hh, ww = means0.shape[-1], means0.shape[1], means0.shape[2]
            m0, m1 = common.checkerboard_masks_2x(ch, hh, ww, dtype=means0.dtype)
            y_hat_0 = _restore2(y_q_r0, means0 * m0, m0)
            scales1, means1 = jnp.split(
                mod.y_spatial_prior((y_hat_0, params3)), 2, axis=-1)
            folded = _fold2(scales1 * m1)
            idx1 = self._build_idx(folded)
            out = {"y_hat_0": y_hat_0, "means1": means1, "idx1": idx1,
                   "q_dec": jnp.maximum(q_dec, 0.5)}
            if self.skip_thres > 0:
                # Clamp-then-test to match reference skip semantics (see
                # _dmc_prior / src/layers/inference.py build_index_dec).
                out["keep1"] = jnp.clip(
                    folded, self.scale_min, self.scale_max) > self.skip_thres
            return out

        return m.apply({"params": params}, method=run)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _dmc_stage_c(self, params, y_hat_0, means1, y_q_r1, q_dec, qp, ctx,
                     prev_frame):
        """Shared: restore pass 1, dequantize, synthesize frame + feature.
        ``prev_frame`` (the DPB frame) feeds the recon skip when the model
        was trained with recon_residual; unused (and DCE'd) otherwise."""
        m = self.dmc

        def run(mod):
            ch, hh, ww = y_hat_0.shape[-1], y_hat_0.shape[1], y_hat_0.shape[2]
            _, m1 = common.checkerboard_masks_2x(ch, hh, ww, dtype=y_hat_0.dtype)
            y_hat_1 = _restore2(y_q_r1, means1 * m1, m1)
            y_hat = (y_hat_0 + y_hat_1) * q_dec
            q_decoder = jnp.take(mod.q_decoder, qp, axis=0).reshape(1, 1, 1, -1)
            q_recon = jnp.take(mod.q_recon, qp, axis=0).reshape(1, 1, 1, -1)
            feature = mod.decoder(y_hat, ctx, q_decoder)
            x_hat = mod.recon_generation_net(
                feature, q_recon,
                prev=prev_frame if mod.cfg.recon_residual else None)
            if mod.cfg.packed_io:
                # DPB keeps the packed frame (the next P-frame's adaptor
                # consumes it directly); the API returns the raw frame
                return {"x_hat": pixel_shuffle(x_hat, mod.cfg.patch_size),
                        "frame_dpb": x_hat, "feature": feature}
            return {"x_hat": x_hat, "frame_dpb": x_hat, "feature": feature}

        return m.apply({"params": params}, method=run)

    def _apply_skip(self, y_q: np.ndarray, keep) -> np.ndarray:
        """Zero skipped symbols so encoder- and decoder-side reconstructions
        agree bit-for-bit (the reference drops them from the stream,
        src/layers/inference.py:75-84)."""
        if keep is None:
            return y_q
        return y_q * np.asarray(keep).astype(y_q.dtype)

    def dmc_compress(self, x, qp: int, dpb, after_i: bool,
                     mask=None) -> Dict:
        """x: (1, H, W, 3) -> {'bit_stream', 'x_hat', 'dpb', 'mask_out'}."""
        t0 = time.perf_counter()
        if mask is None:
            mask = jnp.zeros(x.shape[:3] + (1,), x.dtype)
        qp_j = jnp.int32(qp)
        skip = self.skip_thres > 0

        fe = self._dmc_fe(self.params_p, qp_j, dpb, after_i)
        mask_out = mask
        if self.dmc.cfg.mask_source == "propagated" and not after_i:
            # Same jitted program the decoder runs (_dmc_predict_mask), so
            # both sides' mask chains are identical XLA executions.
            mask_out = self._dmc_predict_mask(self.params_p, mask,
                                              fe["ctx"], fe["ctx_t"])
        ana = self._dmc_analysis(self.params_p, x, mask_out, qp_j,
                                 fe["ctx"], fe["ctx_t"])
        z_int8 = np.asarray(ana["z_int8"])
        z_hat = jnp.asarray(z_int8.astype(np.float32))

        a = self._dmc_prior(self.params_p, z_hat, fe["ctx_t"])
        y_q_r0 = self._dmc_quantize_pass(self.params_p, ana["y"],
                                         a["params3"], 0)
        keep0 = np.asarray(a["keep0"]) if skip else None
        y_q_r0_np = self._apply_skip(np.asarray(y_q_r0), keep0)
        if skip:
            y_q_r0 = jnp.asarray(y_q_r0_np)

        b = self._dmc_stage_b(self.params_p, a["params3"], y_q_r0)
        y_q_r1 = self._dmc_quantize_pass(
            self.params_p, ana["y"],
            {"means": b["means1"], "q_dec": b["q_dec"]}, 1)
        keep1 = np.asarray(b["keep1"]) if skip else None
        y_q_r1_np = self._apply_skip(np.asarray(y_q_r1), keep1)
        if skip:
            y_q_r1 = jnp.asarray(y_q_r1_np)
        cres = self._dmc_stage_c(self.params_p, b["y_hat_0"], b["means1"],
                                 y_q_r1, b["q_dec"], qp_j, fe["ctx"],
                                 dpb["frame"])

        packed0 = _pack(y_q_r0_np, np.asarray(a["idx0"]))
        packed1 = _pack(y_q_r1_np, np.asarray(b["idx1"]))
        if skip:
            packed0 = packed0[keep0.reshape(-1)]
            packed1 = packed1[keep1.reshape(-1)]

        self.ec_p.reset()
        zc = self.dmc.cfg.ch_z
        self.ec_p.encode_z(np.transpose(z_int8[0], (2, 0, 1)).reshape(-1),
                           self.z_group_p, qp * zc,
                           z_int8.shape[1] * z_int8.shape[2])
        self.ec_p.encode_y(packed0, self.y_group_p)
        self.ec_p.encode_y(packed1, self.y_group_p)
        self.ec_p.flush()
        stream = self.ec_p.get_encoded_stream()
        self.enc_time = time.perf_counter() - t0
        return {"bit_stream": stream, "x_hat": cres["x_hat"],
                "dpb": {"frame": cres["frame_dpb"], "feature": cres["feature"]},
                "mask_out": mask_out}

    @functools.partial(jax.jit, static_argnums=(0,))
    def _dmc_predict_mask(self, params, prev_mask, ctx, ctx_t):
        """Decoder-side mask propagation (mask_prop): the same jitted
        MaskPredictor the encoder ran, so both sides derive bit-identical
        mask chains (src/refactor/mask_prop_seg_video_model.py:365-368)."""
        m = self.dmc
        # NOTE: calls mask_predictor directly (not DMC.predict_mask): the
        # codec keeps its mask chain in the RAW domain even when packed_dmc
        # runs the conv stages packed — ctx/ctx_t sit at H/8 x W/8 in both
        # domains, and the FCN's bilinear resizes take the raw-res mask.
        return m.apply({"params": params},
                       method=lambda mod: mod.mask_predictor(prev_mask, ctx,
                                                             ctx_t))

    def _decode_y_pass(self, idx, keep) -> jnp.ndarray:
        """Host rANS decode of one checkerboard pass, honoring skip."""
        idx_np = np.asarray(idx)
        if keep is None:
            self.ec_p.decode_y(idx_np.reshape(-1), self.y_group_p)
            vals = self.ec_p.get_decoded_tensor().astype(np.float32)
            return jnp.asarray(vals.reshape(idx_np.shape))
        keep_np = np.asarray(keep).reshape(-1)
        self.ec_p.decode_y(idx_np.reshape(-1)[keep_np], self.y_group_p)
        vals = np.zeros(idx_np.size, np.float32)
        vals[keep_np] = self.ec_p.get_decoded_tensor().astype(np.float32)
        return jnp.asarray(vals.reshape(idx_np.shape))

    def dmc_decompress(self, stream: bytes, height: int, width: int, qp: int,
                       dpb, after_i: bool, mask=None) -> Dict:
        """``mask`` (mask_prop only): the decoder-side mask chain carry — GT
        at the first P-frame, the previous prediction after; returns the
        propagated ``mask_out`` for the next frame."""
        t0 = time.perf_counter()
        c = self.dmc.cfg
        zc = c.ch_z
        z_h, z_w = common.get_downsampled_shape(height, width, 64)
        qp_j = jnp.int32(qp)
        skip = self.skip_thres > 0

        # dispatch the DPB-only conditioning FIRST: the device computes
        # ctx/ctx_t while the host entropy-decodes z (side-stream overlap)
        fe = self._dmc_fe(self.params_p, qp_j, dpb, after_i)

        mask_out = mask
        if (c.mask_source == "propagated" and not after_i
                and mask is not None):
            mask_out = self._dmc_predict_mask(self.params_p, mask,
                                              fe["ctx"], fe["ctx_t"])

        self.ec_p.set_stream(stream)
        self.ec_p.decode_z(zc * z_h * z_w, self.z_group_p, qp * zc, z_h * z_w)
        z_vals = self.ec_p.get_decoded_tensor().reshape(zc, z_h, z_w)
        z_hat = jnp.asarray(z_vals.transpose(1, 2, 0)[None].astype(np.float32))

        a = self._dmc_prior(self.params_p, z_hat, fe["ctx_t"])
        y_q_r0 = self._decode_y_pass(a["idx0"], a.get("keep0") if skip else None)

        b = self._dmc_stage_b(self.params_p, a["params3"], y_q_r0)
        y_q_r1 = self._decode_y_pass(b["idx1"], b.get("keep1") if skip else None)

        cres = self._dmc_stage_c(self.params_p, b["y_hat_0"], b["means1"],
                                 y_q_r1, b["q_dec"], qp_j, fe["ctx"],
                                 dpb["frame"])
        self.dec_time = time.perf_counter() - t0
        return {"x_hat": cres["x_hat"],
                "dpb": {"frame": cres["frame_dpb"], "feature": cres["feature"]},
                "mask_out": mask_out}

    # ================================================================ DMCI =

    @functools.partial(jax.jit, static_argnums=(0,))
    def _dmci_analysis(self, params, x, qp):
        m = self.dmci

        def run(mod):
            y, _ = mod.transform_analysis(x, qp)
            z = mod.hyper_enc(common.pad_for_y(y))
            z_int8 = jnp.clip(jnp.round(z), -128, 127).astype(jnp.int8)
            return {"y": y, "z_int8": z_int8}

        return m.apply({"params": params}, method=run)

    @functools.partial(jax.jit, static_argnums=(0, 3, 4))
    def _dmci_stage0(self, params, z_hat, y_h: int, y_w: int):
        """Shared: z -> prior params + pass-0 scale indexes."""
        m = self.dmci

        def run(mod):
            params_all = mod.prior_params(z_hat, (1, y_h, y_w, mod.cfg.N))
            _, _, scales, _ = common.separate_prior_image(params_all)
            ch, hh, ww = scales.shape[-1], scales.shape[1], scales.shape[2]
            masks = common.checkerboard_masks_4x(ch, hh, ww, dtype=scales.dtype)
            idx = self._build_idx(_fold4(scales * masks[0]))
            return {"params_all": params_all, "idx": idx}

        return m.apply({"params": params}, method=run)

    @functools.partial(jax.jit, static_argnums=(0, 5))
    def _dmci_quantize_pass(self, params, y, params_all, means_i,
                            pass_idx: int):
        """Encoder-only: quantize pass residuals to folded int symbols.
        For pass 0 means come from params_all, later passes pass means_i."""
        m = self.dmci

        def run(mod):
            q_enc, _, _, means0 = common.separate_prior_image(params_all)
            means = means0 if pass_idx == 0 else means_i
            ch, hh, ww = y.shape[-1], y.shape[1], y.shape[2]
            masks = common.checkerboard_masks_4x(ch, hh, ww, dtype=y.dtype)
            mk = masks[pass_idx]
            y_s = y * q_enc
            y_res = (y_s - means * mk) * mk
            y_q = jnp.clip(jnp.round(y_res), SYM_MIN, SYM_MAX) * mk
            return _fold4(y_q)

        return m.apply({"params": params}, method=run)

    @functools.partial(jax.jit, static_argnums=(0, 5))
    def _dmci_restore_pass(self, params, params_all, y_hat_so_far, y_q_r,
                           pass_idx: int):
        """Shared: restore pass ``pass_idx``; emit the next pass's means +
        scale indexes (or the final dequantized y_hat)."""
        m = self.dmci

        def run(mod):
            _, q_dec, scales0, means0 = common.separate_prior_image(params_all)
            reduced = mod.y_spatial_prior_reduction(params_all)
            ch, hh, ww = means0.shape[-1], means0.shape[1], means0.shape[2]
            masks = common.checkerboard_masks_4x(ch, hh, ww, dtype=means0.dtype)
            adaptors = (mod.y_spatial_prior_adaptor_1,
                        mod.y_spatial_prior_adaptor_2,
                        mod.y_spatial_prior_adaptor_3)

            if pass_idx == 0:
                means_i = means0
            else:
                cat = (y_hat_so_far, reduced)
                _, means_i = jnp.split(
                    mod.y_spatial_prior(adaptors[pass_idx - 1](cat)), 2,
                    axis=-1)
            mk = masks[pass_idx]
            y_hat_i = _restore4(y_q_r, means_i * mk, mk)
            new_so_far = (y_hat_i if pass_idx == 0
                          else y_hat_so_far + y_hat_i)

            if pass_idx < 3:
                cat = (new_so_far, reduced)
                s_next, means_next = jnp.split(
                    mod.y_spatial_prior(adaptors[pass_idx](cat)), 2, axis=-1)
                idx = self._build_idx(_fold4(s_next * masks[pass_idx + 1]))
                return {"y_hat_so_far": new_so_far, "idx": idx,
                        "means_next": means_next}
            return {"y_hat_so_far": new_so_far * q_dec, "idx": None,
                    "means_next": None}

        return m.apply({"params": params}, method=run)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _dmci_reconstruct(self, params, y_hat, qp):
        m = self.dmci

        def run(mod):
            q_dec = jnp.take(mod.q_scale_dec, qp, axis=0).reshape(1, 1, 1, -1)
            return jnp.clip(mod.dec(y_hat, q_dec), 0.0, 1.0)

        return m.apply({"params": params}, method=run)

    def dmci_compress(self, x, qp: int) -> Dict:
        t0 = time.perf_counter()
        qp_j = jnp.int32(qp)
        ana = self._dmci_analysis(self.params_i, x, qp_j)
        z_int8 = np.asarray(ana["z_int8"])
        z_hat = jnp.asarray(z_int8.astype(np.float32))
        y = ana["y"]
        y_h, y_w = y.shape[1], y.shape[2]

        s0 = self._dmci_stage0(self.params_i, z_hat, y_h, y_w)
        params_all = s0["params_all"]
        idx = s0["idx"]

        packed_list = []
        y_hat_so_far = jnp.zeros_like(y)
        means_i = None
        for p in range(4):
            y_q_r = self._dmci_quantize_pass(self.params_i, y, params_all,
                                             means_i, p)
            packed_list.append(_pack(np.asarray(y_q_r), np.asarray(idx)))
            res = self._dmci_restore_pass(self.params_i, params_all,
                                          y_hat_so_far, y_q_r, p)
            y_hat_so_far = res["y_hat_so_far"]
            idx = res["idx"]
            means_i = res["means_next"]

        x_hat = self._dmci_reconstruct(self.params_i, y_hat_so_far, qp_j)

        self.ec_i.reset()
        zc = self.dmci.cfg.z_channel
        self.ec_i.encode_z(np.transpose(z_int8[0], (2, 0, 1)).reshape(-1),
                           self.z_group_i, qp * zc,
                           z_int8.shape[1] * z_int8.shape[2])
        for packed in packed_list:
            self.ec_i.encode_y(packed, self.y_group_i)
        self.ec_i.flush()
        self.enc_time = time.perf_counter() - t0
        return {"bit_stream": self.ec_i.get_encoded_stream(), "x_hat": x_hat,
                "dpb": {"frame": x_hat, "feature": None}}

    def dmci_decompress(self, stream: bytes, height: int, width: int,
                        qp: int) -> Dict:
        t0 = time.perf_counter()
        c = self.dmci.cfg
        zc = c.z_channel
        z_h, z_w = common.get_downsampled_shape(height, width, 64)
        y_h, y_w = common.get_downsampled_shape(height, width, 16)
        self.ec_i.set_stream(stream)
        self.ec_i.decode_z(zc * z_h * z_w, self.z_group_i, qp * zc, z_h * z_w)
        z_vals = self.ec_i.get_decoded_tensor().reshape(zc, z_h, z_w)
        z_hat = jnp.asarray(z_vals.transpose(1, 2, 0)[None].astype(np.float32))

        s0 = self._dmci_stage0(self.params_i, z_hat, y_h, y_w)
        params_all = s0["params_all"]
        idx = s0["idx"]
        y_hat_so_far = jnp.zeros((1, y_h, y_w, c.N), jnp.float32)
        for p in range(4):
            self.ec_i.decode_y(np.asarray(idx).reshape(-1), self.y_group_i)
            y_q_r = jnp.asarray(self.ec_i.get_decoded_tensor()
                                .astype(np.float32).reshape(idx.shape))
            res = self._dmci_restore_pass(self.params_i, params_all,
                                          y_hat_so_far, y_q_r, p)
            y_hat_so_far = res["y_hat_so_far"]
            idx = res["idx"]
        x_hat = self._dmci_reconstruct(self.params_i, y_hat_so_far,
                                       jnp.int32(qp))
        self.dec_time = time.perf_counter() - t0
        return {"x_hat": x_hat, "dpb": {"frame": x_hat, "feature": None}}
