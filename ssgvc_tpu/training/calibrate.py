"""Init-time quantizer-gain calibration for from-scratch training.

The reference never trains from scratch: it finetunes pretrained DCVC-RT
weights whose per-QP gain tables already place the analysis latents at a
healthy scale relative to the rounding step (src/models/video_model.py:
201-202 inits the tables to ones and immediately overwrites them from a
checkpoint). A fresh flax init instead produces encoder outputs with
std ~0.05-0.1, so ``round(y * gain)`` is all-zero at every QP, the
synthesis transform learns to ignore the latent, and training collapses to
an input-independent mean image. Observed on the rd-tiny profile: the
P-model sat at 14 dB with PSNR flat across QP (latent std 0.07) while the
I-model — which escaped the collapse — reached 27 dB with latent std 5.

Calibration measures latent std on ONE real batch at init and rescales:

  - DMC:  ``q_encoder`` by a scalar (the gain multiplies the feature right
    before the encoder's final linear conv, so a scalar on the table scales
    y exactly), and ``z_gain`` per channel. ``q_decoder`` stays at its QP
    ramp by default so the synthesis trunk sees the latent at full scale —
    see ``calibrate_dmc`` for the measured rationale.
  - DMCI: ``z_gain`` per channel only. Its y-gain sits deep inside
    nonlinear blocks (IntraEncoder applies it before 6 DepthConvBlocks) so
    a table rescale is not a clean y rescale — and the intra model
    demonstrably escapes the collapse on its own.

All rescales preserve the geometric QP ramp (models/common.py
qp_gain_ramp_init), i.e. the variable-rate ladder ordering.
"""

from typing import Any, Dict

import jax
import jax.numpy as jnp

TARGET_Y_STD = 3.0
TARGET_Z_STD = 2.0


def _fetch(inter: Dict, name: str):
    node = inter
    for part in name.split("/"):
        node = node[part]
    return node["__call__"][0]


def _channel_scale(arr, target: float, lo: float = 0.25,
                   hi: float = 50.0) -> jnp.ndarray:
    """Per-channel target/RMS, clipped; dead channels keep 1.0. RMS about
    zero (not std) so channels whose init output is mostly a bias offset
    are not amplified into huge constant latents."""
    rms = jnp.sqrt(jnp.mean(jnp.square(arr.astype(jnp.float32)),
                            axis=tuple(range(arr.ndim - 1))))
    c = jnp.clip(target / jnp.maximum(rms, 1e-6), lo, hi)
    return jnp.where(rms > 1e-6, c, 1.0)


def _scalar_scale(arr, target: float, lo: float = 0.25,
                  hi: float = 1000.0) -> float:
    std = float(jnp.std(arr.astype(jnp.float32)))
    if std <= 1e-6:
        return 1.0
    return float(jnp.clip(target / std, lo, hi))


def calibrate_dmc(dmc, params, x, dpb, mask, qp: int = 32,
                  target_y: float = TARGET_Y_STD,
                  target_z: float = TARGET_Z_STD,
                  decoder_inverse: bool = False) -> Dict[str, Any]:
    """Return params with q_encoder/q_decoder/z_gain rescaled so that at the
    mid-QP row std(y) ~= target_y and std(z) ~= target_z on this batch.

    decoder_inverse=True additionally divides q_decoder by the same factor,
    keeping the synthesis trunk's input at its (tiny) pre-calibration scale.
    Measured on the rd-tiny liveness probe, that starves the decoder — after
    1.5k steps the recon was still input-independent (40 dB between recons
    of different clips) even though y itself was quantization-alive. The
    default leaves q_decoder at its QP ramp, so the trunk sees the latent at
    the same healthy scale the (demonstrably trainable) DMCI synthesis gets.
    """
    kwargs = dict(after_i=True, mask=mask, train=False,
                  capture_intermediates=True, mutable=["intermediates"])
    _, inter = dmc.apply({"params": params}, x, jnp.int32(qp), dpb, **kwargs)
    cy = _scalar_scale(_fetch(inter["intermediates"], "encoder"), target_y)
    p = dict(params)
    p["q_encoder"] = params["q_encoder"] * cy
    if decoder_inverse:
        p["q_decoder"] = params["q_decoder"] / cy
    # second pass with the calibrated y: the hyper analysis is nonlinear, so
    # z must be measured at the scale it will actually see
    _, inter = dmc.apply({"params": p}, x, jnp.int32(qp), dpb, **kwargs)
    cz = _channel_scale(_fetch(inter["intermediates"], "hyper_encoder"),
                        target_z)
    p["z_gain"] = params["z_gain"] * cz
    return p


def calibrate_dmci(dmci, params, x, qp: int = 32,
                   target_z: float = TARGET_Z_STD) -> Dict[str, Any]:
    """Return params with z_gain rescaled per channel (y path untouched —
    see module docstring)."""
    _, inter = dmci.apply({"params": params}, x, jnp.int32(qp), train=False,
                          capture_intermediates=True,
                          mutable=["intermediates"])
    inter = inter["intermediates"]
    cz = _channel_scale(_fetch(inter, "hyper_enc_2"), target_z)
    p = dict(params)
    p["z_gain"] = params["z_gain"] * cz
    return p
