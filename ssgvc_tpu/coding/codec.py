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
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..models import common
from ..models.dmc import DMC
from ..models.dmci import DMCI
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
    """Trained DMCI + DMC params + rANS tables + jitted per-stage programs."""

    def __init__(self, dmci: DMCI, dmci_params, dmc: DMC, dmc_params,
                 scale_levels: int = 128, ec_part: int = 0):
        self.dmci = dmci
        self.dmc = dmc
        self.params_i = dmci_params
        self.params_p = dmc_params
        self.scale_levels = scale_levels
        self.ec_part = int(ec_part)

        # quantized CDF tables — the reference's update() (SURVEY §2.4)
        self.ec_i = EntropyCoder()
        self.ec_p = EntropyCoder()
        y_tables = cdf_mod.build_y_cdf_tables(levels=scale_levels)
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

    # ================================================================= DMC =

    @functools.partial(jax.jit, static_argnums=(0, 6))
    def _dmc_analysis(self, params, x, mask, qp, dpb, after_i: bool):
        """Encoder-only transform: source frame -> (y, z_int8, mask_out)."""
        m = self.dmc
        c = m.cfg

        def run(mod):
            q_encoder = jnp.take(mod.q_encoder, qp, axis=0).reshape(1, 1, 1, -1)
            q_feature = jnp.take(mod.q_feature, qp, axis=0).reshape(1, 1, 1, -1)
            feature = mod.apply_feature_adaptor(dpb, after_i)
            ctx, ctx_t = mod.feature_extractor(feature, q_feature)
            y = mod.encoder(x, ctx, q_encoder)

            current_mask = mask
            if c.mask_source == "propagated" and not after_i:
                current_mask = mod.mask_predictor(mask, ctx, ctx_t)
            if c.mask_mode == "sft_latent":
                q_sft = jnp.take(mod.q_sft, qp, axis=0).reshape(1, 1, 1, -1)
                gamma, beta = mod.mask_sft(current_mask, q_sft)
                y = y * (1.0 + gamma) + beta

            z = mod.hyper_encoder(mod._hyper_input(y, current_mask))
            z_int8 = jnp.clip(jnp.round(z), -128, 127).astype(jnp.int8)
            return {"y": y, "z_int8": z_int8, "mask_out": current_mask}

        return m.apply({"params": params}, method=run)

    @functools.partial(jax.jit, static_argnums=(0, 5))
    def _dmc_stage_a(self, params, z_hat, qp, dpb, after_i: bool):
        """Shared: z -> prior params, ctx, pass-0 scale indexes."""
        m = self.dmc

        def run(mod):
            q_feature = jnp.take(mod.q_feature, qp, axis=0).reshape(1, 1, 1, -1)
            feature = mod.apply_feature_adaptor(dpb, after_i)
            x1, ctx_t = mod.feature_extractor.part1(feature, q_feature)
            params3 = mod.res_prior_param_decoder(z_hat, ctx_t)
            _, scales0, _ = jnp.split(params3, 3, axis=-1)
            ch, hh, ww = scales0.shape[-1], scales0.shape[1], scales0.shape[2]
            m0, _ = common.checkerboard_masks_2x(ch, hh, ww, dtype=scales0.dtype)
            idx0 = cdf_mod.build_indexes_decoder(_fold2(scales0 * m0),
                                                 levels=self.scale_levels)
            ctx = mod.feature_extractor.part2(x1)
            return {"params3": params3, "ctx": ctx, "idx0": idx0}

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
            cat_params = jnp.concatenate([y_hat_0, params3], axis=-1)
            scales1, means1 = jnp.split(mod.y_spatial_prior(cat_params), 2,
                                        axis=-1)
            idx1 = cdf_mod.build_indexes_decoder(_fold2(scales1 * m1),
                                                 levels=self.scale_levels)
            return {"y_hat_0": y_hat_0, "means1": means1, "idx1": idx1,
                    "q_dec": jnp.maximum(q_dec, 0.5)}

        return m.apply({"params": params}, method=run)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _dmc_stage_c(self, params, y_hat_0, means1, y_q_r1, q_dec, qp, ctx):
        """Shared: restore pass 1, dequantize, synthesize frame + feature."""
        m = self.dmc

        def run(mod):
            ch, hh, ww = y_hat_0.shape[-1], y_hat_0.shape[1], y_hat_0.shape[2]
            _, m1 = common.checkerboard_masks_2x(ch, hh, ww, dtype=y_hat_0.dtype)
            y_hat_1 = _restore2(y_q_r1, means1 * m1, m1)
            y_hat = (y_hat_0 + y_hat_1) * q_dec
            q_decoder = jnp.take(mod.q_decoder, qp, axis=0).reshape(1, 1, 1, -1)
            q_recon = jnp.take(mod.q_recon, qp, axis=0).reshape(1, 1, 1, -1)
            feature = mod.decoder(y_hat, ctx, q_decoder)
            x_hat = mod.recon_generation_net(feature, q_recon)
            return {"x_hat": x_hat, "feature": feature}

        return m.apply({"params": params}, method=run)

    def dmc_compress(self, x, qp: int, dpb, after_i: bool,
                     mask=None) -> Dict:
        """x: (1, H, W, 3) -> {'bit_stream', 'x_hat', 'dpb', 'mask_out'}."""
        t0 = time.perf_counter()
        if mask is None:
            mask = jnp.zeros(x.shape[:3] + (1,), x.dtype)
        qp_j = jnp.int32(qp)

        ana = self._dmc_analysis(self.params_p, x, mask, qp_j, dpb, after_i)
        z_int8 = np.asarray(ana["z_int8"])
        z_hat = jnp.asarray(z_int8.astype(np.float32))

        a = self._dmc_stage_a(self.params_p, z_hat, qp_j, dpb, after_i)
        y_q_r0 = self._dmc_quantize_pass(self.params_p, ana["y"],
                                         a["params3"], 0)
        b = self._dmc_stage_b(self.params_p, a["params3"], y_q_r0)
        y_q_r1 = self._dmc_quantize_pass(
            self.params_p, ana["y"],
            {"means": b["means1"], "q_dec": b["q_dec"]}, 1)
        cres = self._dmc_stage_c(self.params_p, b["y_hat_0"], b["means1"],
                                 y_q_r1, b["q_dec"], qp_j, a["ctx"])

        packed0 = _pack(np.asarray(y_q_r0), np.asarray(a["idx0"]))
        packed1 = _pack(np.asarray(y_q_r1), np.asarray(b["idx1"]))

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
                "dpb": {"frame": cres["x_hat"], "feature": cres["feature"]},
                "mask_out": ana["mask_out"]}

    def dmc_decompress(self, stream: bytes, height: int, width: int, qp: int,
                       dpb, after_i: bool) -> Dict:
        t0 = time.perf_counter()
        c = self.dmc.cfg
        zc = c.ch_z
        z_h, z_w = common.get_downsampled_shape(height, width, 64)
        qp_j = jnp.int32(qp)
        self.ec_p.set_stream(stream)
        self.ec_p.decode_z(zc * z_h * z_w, self.z_group_p, qp * zc, z_h * z_w)
        z_vals = self.ec_p.get_decoded_tensor().reshape(zc, z_h, z_w)
        z_hat = jnp.asarray(z_vals.transpose(1, 2, 0)[None].astype(np.float32))

        a = self._dmc_stage_a(self.params_p, z_hat, qp_j, dpb, after_i)
        self.ec_p.decode_y(np.asarray(a["idx0"]).reshape(-1), self.y_group_p)
        y_q_r0 = jnp.asarray(self.ec_p.get_decoded_tensor()
                             .astype(np.float32).reshape(a["idx0"].shape))

        b = self._dmc_stage_b(self.params_p, a["params3"], y_q_r0)
        self.ec_p.decode_y(np.asarray(b["idx1"]).reshape(-1), self.y_group_p)
        y_q_r1 = jnp.asarray(self.ec_p.get_decoded_tensor()
                             .astype(np.float32).reshape(b["idx1"].shape))

        cres = self._dmc_stage_c(self.params_p, b["y_hat_0"], b["means1"],
                                 y_q_r1, b["q_dec"], qp_j, a["ctx"])
        self.dec_time = time.perf_counter() - t0
        return {"x_hat": cres["x_hat"],
                "dpb": {"frame": cres["x_hat"], "feature": cres["feature"]}}

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
            idx = cdf_mod.build_indexes_decoder(_fold4(scales * masks[0]),
                                                levels=self.scale_levels)
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
                cat = jnp.concatenate([y_hat_so_far, reduced], axis=-1)
                _, means_i = jnp.split(
                    mod.y_spatial_prior(adaptors[pass_idx - 1](cat)), 2,
                    axis=-1)
            mk = masks[pass_idx]
            y_hat_i = _restore4(y_q_r, means_i * mk, mk)
            new_so_far = (y_hat_i if pass_idx == 0
                          else y_hat_so_far + y_hat_i)

            if pass_idx < 3:
                cat = jnp.concatenate([new_so_far, reduced], axis=-1)
                s_next, means_next = jnp.split(
                    mod.y_spatial_prior(adaptors[pass_idx](cat)), 2, axis=-1)
                idx = cdf_mod.build_indexes_decoder(
                    _fold4(s_next * masks[pass_idx + 1]),
                    levels=self.scale_levels)
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
