"""Init-time gain calibration (training/calibrate.py).

The reference never trains from scratch (it finetunes pretrained DCVC-RT
weights, src/models/video_model.py:201-202), so calibration is rebuild-only
machinery: it must (a) place fresh-init latents at a healthy scale relative
to the rounding step, and (b) be an exact no-op for imported/restored
checkpoints (z_gain == ones ⇒ identity).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # model compiles dominate

import jax
import jax.numpy as jnp

from ssgvc_tpu.config import DMCConfig, DMCIConfig, TrainConfig
from ssgvc_tpu.models.dmc import DMC
from ssgvc_tpu.models.dmci import DMCI
from ssgvc_tpu.training.calibrate import (
    TARGET_Y_STD, TARGET_Z_STD, calibrate_dmc, calibrate_dmci)

TINY = dict(ch_d=16, ch_y=8, ch_z=8, ch_recon=16)


def _dmc_setup(variant="performance", hw=64, seed=0):
    rng = np.random.default_rng(seed)
    model = DMC(DMCConfig.variant(variant, **TINY))
    x = jnp.asarray(rng.uniform(0, 1, (2, hw, hw, 3)), jnp.float32)
    mask = jnp.asarray((rng.uniform(0, 1, (2, hw, hw, 1)) > 0.7), jnp.float32)
    dpb = {"frame": jnp.asarray(rng.uniform(0, 1, (2, hw, hw, 3)), jnp.float32),
           "feature": jnp.zeros((2, hw // 8, hw // 8, TINY["ch_d"]),
                                jnp.float32)}
    k = jax.random.PRNGKey(seed)
    params = model.init({"params": k, "noise": k}, x, jnp.int32(0), dpb,
                        after_i=jnp.bool_(True), mask=mask,
                        train=False)["params"]
    return model, params, x, dpb, mask


def _latent_stats(model, params, x, dpb, mask, qp=32):
    _, inter = model.apply(
        {"params": params}, x, jnp.int32(qp), dpb, after_i=True, mask=mask,
        train=False, capture_intermediates=True, mutable=["intermediates"])
    inter = inter["intermediates"]
    # the per-QP gain is applied INSIDE the encoder (before its final linear
    # conv), so the captured encoder output is y exactly as quantization
    # sees it; z_gain is applied outside hyper_encoder (hyper_z)
    y = np.asarray(inter["encoder"]["__call__"][0], np.float32)
    z_raw = np.asarray(inter["hyper_encoder"]["__call__"][0], np.float32)
    z = z_raw * np.asarray(params["z_gain"], np.float32)
    return y, z


def test_calibrate_dmc_places_latents_at_target():
    model, params, x, dpb, mask = _dmc_setup()
    y0, z0 = _latent_stats(model, params, x, dpb, mask)
    # precondition: fresh init is quantization-starved (most of the latent
    # rounds to zero — the collapse observed at rd-tiny scale was ~100%)
    assert float(np.mean(np.round(y0) != 0)) < 0.4

    cal = calibrate_dmc(model, params, x, dpb, mask)
    y1, z1 = _latent_stats(model, cal, x, dpb, mask)
    assert 0.3 * TARGET_Y_STD < float(y1.std()) < 3.0 * TARGET_Y_STD
    z_rms = np.sqrt(np.mean(z1 ** 2, axis=(0, 1, 2)))
    assert 0.25 * TARGET_Z_STD < float(np.median(z_rms)) < 4.0 * TARGET_Z_STD
    # quantization actually resolves the latents now
    assert float(np.mean(np.round(y1) != 0)) > 0.3
    assert float(np.mean(np.round(z1) != 0)) > 0.3
    # q_decoder keeps its QP ramp (decoder_inverse=False default): the
    # synthesis trunk must see the calibrated latent at full scale
    np.testing.assert_array_equal(np.asarray(cal["q_decoder"]),
                                  np.asarray(params["q_decoder"]))
    # the opt-in inverse mode is scale-neutral for the synthesis input
    inv = calibrate_dmc(model, params, x, dpb, mask, decoder_inverse=True)
    np.testing.assert_allclose(
        np.asarray(inv["q_encoder"]) * np.asarray(inv["q_decoder"]),
        np.asarray(params["q_encoder"]) * np.asarray(params["q_decoder"]),
        rtol=1e-5)


def test_torch_import_fills_z_gain_identity():
    """A torch checkpoint legitimately lacks the rebuild-only z_gain; import
    must keep the template's ones (== reference semantics) instead of
    raising, and must still raise on genuinely missing reference params."""
    from ssgvc_tpu.utils.torch_import import align_params, flatten

    model, params, *_ = _dmc_setup()
    np.testing.assert_array_equal(np.asarray(params["z_gain"]), 1.0)
    flat = {k: np.asarray(v) for k, v in flatten(params).items()
            if k[-1] != "z_gain"}
    aligned = align_params(flat, params)
    np.testing.assert_array_equal(
        np.asarray(flatten(aligned)[("z_gain",)]), 1.0)
    # a reference param going missing still raises
    flat.pop(next(k for k in flat if k[0] == "q_encoder"))
    with pytest.raises(KeyError):
        align_params(flat, params)


def test_calibrate_dmci_z_only():
    rng = np.random.default_rng(1)
    model = DMCI(DMCIConfig.tiny())
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), jnp.float32)
    k = jax.random.PRNGKey(1)
    params = model.init({"params": k, "noise": k}, x, jnp.int32(0),
                        train=False)["params"]
    cal = calibrate_dmci(model, params, x)
    # only z_gain changed
    changed = [n for n in params
               if not jax.tree_util.tree_all(jax.tree_util.tree_map(
                   lambda a, b: bool(np.array_equal(a, b)),
                   params[n], cal[n]))]
    assert changed == ["z_gain"]
    _, inter = model.apply({"params": cal}, x, jnp.int32(32), train=False,
                           capture_intermediates=True,
                           mutable=["intermediates"])
    z = np.asarray(inter["intermediates"]["hyper_enc_2"]["__call__"][0],
                   np.float32) * np.asarray(cal["z_gain"], np.float32)
    z_rms = np.sqrt(np.mean(z ** 2, axis=(0, 1, 2)))
    assert 0.25 * TARGET_Z_STD < float(np.median(z_rms)) < 4.0 * TARGET_Z_STD


def test_trainer_skips_calibration_on_zeros_batch():
    """dryrun_multichip feeds an all-zeros example batch; calibration must
    not divide by its zero std (Trainer gates on std(frames) > 1e-4)."""
    from ssgvc_tpu.training.trainer import Trainer
    cfg = TrainConfig(accumulation_steps=1)
    cfg.precision = "fp32"
    tr = Trainer(cfg, total_iters=10,
                 dmc_cfg=DMCConfig.variant("performance", **TINY),
                 dmci_cfg=DMCIConfig.tiny())
    batch = {"frames": jnp.zeros((2, 2, 64, 64, 3), jnp.float32),
             "masks": jnp.zeros((2, 2, 64, 64, 1), jnp.float32)}
    state = tr.init_state(jax.random.PRNGKey(0), batch)
    np.testing.assert_array_equal(np.asarray(state.params_p["z_gain"]), 1.0)
    np.testing.assert_array_equal(np.asarray(state.params_i["z_gain"]), 1.0)
