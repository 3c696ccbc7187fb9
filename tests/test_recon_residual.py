"""recon_residual: the from-scratch training aid (DMCConfig.recon_residual).

A fresh DMC with the flag on must reconstruct the previous decoded frame
EXACTLY at init (zero-init decoder tail + recon head, identity DCB chains),
putting from-scratch training at the copy-prev PSNR bound from step 0.
The flag must not change the parameter tree (same names/shapes), so
checkpoints move freely between the two modes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssgvc_tpu.config import DMCConfig


def _init(cfg, seed=0, hw=64):
    from ssgvc_tpu.models.dmc import DMC
    model = DMC(cfg)
    rng = jax.random.PRNGKey(seed)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, hw, hw, 3))
    dpb = {"frame": jax.random.uniform(jax.random.PRNGKey(2), (1, hw, hw, 3)),
           "feature": jnp.zeros((1, hw // 8, hw // 8, cfg.ch_d))}
    params = model.init({"params": rng, "noise": rng}, x, jnp.int32(32), dpb,
                        after_i=True, train=False)["params"]
    return model, params, x, dpb


@pytest.mark.parametrize("variant", ["plain", "performance"])
def test_fresh_init_reconstructs_prev_frame(variant):
    cfg = DMCConfig.variant(variant, ch_d=16, ch_y=8, ch_z=8, ch_recon=16,
                            recon_residual=True)
    model, params, x, dpb = _init(cfg)
    out = model.apply({"params": params}, x, jnp.int32(32), dpb,
                      after_i=True, train=False)
    np.testing.assert_allclose(np.asarray(out["dpb"]["frame"]),
                               np.asarray(dpb["frame"]), atol=1e-5)
    # and the decoder feature equals the adapted DPB feature path (finite)
    assert np.isfinite(np.asarray(out["dpb"]["feature"])).all()
    assert float(out["bpp"][0]) > 0.0  # rate is still estimated/coded


def test_param_tree_identical_with_and_without_flag():
    base = DMCConfig.variant("plain", ch_d=16, ch_y=8, ch_z=8, ch_recon=16)
    skip = DMCConfig.variant("plain", ch_d=16, ch_y=8, ch_z=8, ch_recon=16,
                             recon_residual=True)
    _, p_base, _, _ = _init(base)
    _, p_skip, _, _ = _init(skip)
    shapes = lambda p: jax.tree.map(lambda a: a.shape, p)
    assert shapes(p_base) == shapes(p_skip)


def test_gradients_reach_encoder_through_rate_term():
    cfg = DMCConfig.variant("plain", ch_d=16, ch_y=8, ch_z=8, ch_recon=16,
                            recon_residual=True)
    model, params, x, dpb = _init(cfg)

    def loss(p):
        out = model.apply({"params": p}, x, jnp.int32(32), dpb,
                          after_i=True, train=True,
                          rngs={"noise": jax.random.PRNGKey(3)})
        mse = jnp.mean((out["dpb"]["frame"] - x) ** 2)
        return jnp.mean(out["bpp"]) + 256.0 * mse

    grads = jax.grad(loss)(params)
    # encoder gets gradient via the rate term even while the head is zero
    enc_norm = jax.tree_util.tree_reduce(
        lambda a, g: a + float(jnp.sum(jnp.abs(g))), grads["encoder"], 0.0)
    assert enc_norm > 0.0
    # and the zero-init head itself gets distortion gradient (ReZero ramp-up)
    head_norm = float(jnp.sum(jnp.abs(
        grads["recon_generation_net"]["head"]["kernel"])))
    assert head_norm > 0.0


def test_coded_path_roundtrip_with_recon_residual():
    from ssgvc_tpu.coding.codec import VideoCodec
    from ssgvc_tpu.config import DMCIConfig
    from ssgvc_tpu.models.dmci import DMCI

    cfg = DMCConfig.variant("plain", ch_d=16, ch_y=8, ch_z=8, ch_recon=16,
                            recon_residual=True)
    model, params, x, dpb = _init(cfg)
    dmci = DMCI(DMCIConfig.tiny())
    rng = jax.random.PRNGKey(9)
    params_i = dmci.init({"params": rng, "noise": rng}, x, jnp.int32(32),
                         train=False)["params"]
    codec = VideoCodec(dmci, params_i, model, params)
    enc = codec.dmc_compress(x, 32, dpb, after_i=True)
    dec = codec.dmc_decompress(enc["bit_stream"], x.shape[1], x.shape[2], 32,
                               dpb, after_i=True)
    np.testing.assert_array_equal(np.asarray(enc["x_hat"]),
                                  np.asarray(dec["x_hat"]))
    # at init the coded recon is ALSO the previous frame (skip + zero head)
    np.testing.assert_allclose(np.asarray(dec["x_hat"]),
                               np.asarray(dpb["frame"]), atol=1e-4)
