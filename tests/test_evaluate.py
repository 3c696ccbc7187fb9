"""Evaluation path + streaming inference API on tiny models (CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssgvc_tpu.config import DMCConfig, DMCIConfig
from ssgvc_tpu.models.dmc import DMC
from ssgvc_tpu.models.dmci import DMCI
from ssgvc_tpu.models.inference_api import StreamingDMC
from ssgvc_tpu.training.evaluate import evaluate_gop_estimated, rd_sweep

TINY = dict(ch_d=16, ch_y=8, ch_z=8, ch_recon=16)


@pytest.fixture(scope="module")
def models():
    dmci = DMCI(DMCIConfig.tiny())
    dmc = DMC(DMCConfig.variant("performance", **TINY))
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    mask = jnp.zeros((1, 64, 64, 1), jnp.float32)
    dpb = {"frame": x, "feature": jnp.zeros((1, 8, 8, TINY["ch_d"]),
                                            jnp.float32)}
    pi = dmci.init({"params": rng}, x, jnp.int32(0), train=False)["params"]
    pp = dmc.init({"params": rng}, x, jnp.int32(0), dpb,
                  after_i=jnp.bool_(True), mask=mask, train=False)["params"]
    return dmci, pi, dmc, pp


def test_evaluate_gop_estimated(models):
    dmci, pi, dmc, pp = models
    rng = np.random.default_rng(0)
    frames = rng.uniform(0, 1, (3, 64, 64, 3)).astype(np.float32)
    masks = (rng.uniform(0, 1, (3, 64, 64, 1)) > 0.7).astype(np.float32)
    results = evaluate_gop_estimated(dmci, pi, dmc, pp, frames, masks, qp=20,
                                     index_map=[0, 1, 0, 2, 0, 2, 0, 2],
                                     qp_shift=[0, 8, 4])
    assert [r["frame_type"] for r in results] == ["I", "P", "P"]
    for r in results:
        assert np.isfinite(r["bpp"]) and r["bpp"] > 0
        assert 0 < r["psnr"] <= 99.9
        assert 0 < r["roi_psnr"] <= 99.9


def test_rd_sweep_shape(models):
    dmci, pi, dmc, pp = models
    rng = np.random.default_rng(1)
    frames = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    masks = np.zeros((2, 64, 64, 1), np.float32)

    def eval_qp(qp):
        return evaluate_gop_estimated(dmci, pi, dmc, pp, frames, masks, qp,
                                      [0, 1, 0, 2, 0, 2, 0, 2], [0, 8, 4])

    curve = rd_sweep(eval_qp, qps=[8, 48])
    assert len(curve["bpp"]) == 2 and len(curve["psnr"]) == 2


def test_streaming_packed_dpb_matches_dict_forward(models):
    _, _, dmc, pp = models
    stream = StreamingDMC(dmc, pp)
    rng = np.random.default_rng(2)
    prev = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    frame = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    mask = jnp.zeros((1, 64, 64, 1), jnp.float32)

    packed = stream.init_dpb(prev)
    np.testing.assert_allclose(np.asarray(stream.unpack_frame(packed)),
                               np.asarray(prev), atol=1e-6)

    new_packed, bpp = stream.step(frame, mask, jnp.int32(30), packed,
                                  after_i=True)
    # reference result through the plain dict API
    dpb = {"frame": prev, "feature": jnp.zeros((1, 8, 8, TINY["ch_d"]),
                                               jnp.float32)}
    out = dmc.apply({"params": pp}, frame, jnp.int32(30), dpb, after_i=True,
                    mask=mask, train=False)
    np.testing.assert_allclose(np.asarray(stream.unpack_frame(new_packed)),
                               np.asarray(out["dpb"]["frame"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(bpp), np.asarray(out["bpp"]),
                               rtol=1e-5, atol=1e-5)


def test_bd_rate_and_bd_psnr_analytic():
    """Pure-curve Bjontegaard metrics: a test curve identical to the anchor
    scores 0; one shifted +1 dB at every rate scores exactly +1 dB BD-PSNR
    and a negative BD-rate (rate saved at equal quality)."""
    from ssgvc_tpu.training.evaluate import bd_psnr, bd_rate

    rate = [0.05, 0.1, 0.2, 0.4, 0.8]
    psnr = [30.0, 32.0, 34.0, 36.0, 38.0]

    assert abs(bd_rate(rate, psnr, rate, psnr)) < 1e-9
    assert abs(bd_psnr(rate, psnr, rate, psnr)) < 1e-9

    better = [p + 1.0 for p in psnr]
    assert abs(bd_psnr(rate, psnr, rate, better) - 1.0) < 1e-6
    assert bd_rate(rate, psnr, rate, better) < -10.0
    # symmetric direction
    assert abs(bd_psnr(rate, better, rate, psnr) + 1.0) < 1e-6


def test_bd_metrics_nan_when_no_overlap():
    from ssgvc_tpu.training.evaluate import bd_psnr, bd_rate

    assert np.isnan(bd_rate([0.1, 0.2], [30, 31], [0.3, 0.4], [40, 41]))
    assert np.isnan(bd_psnr([0.1, 0.2], [30, 31], [0.5, 0.9], [40, 41]))


def test_liveness_gate_fires_on_collapsed_model():
    """A DMC whose q_encoder is zeroed emits all-zero quantized latents and
    an input-independent recon — liveness_collapsed must return True; a
    recon_residual model at init (recon == prev frame, which differs per
    clip) must pass the gate."""
    from ssgvc_tpu.training.evaluate import latent_liveness, liveness_collapsed

    rng = np.random.default_rng(5)
    clips = []
    for s in range(2):
        r = np.random.default_rng(40 + s)
        base = r.uniform(0.2, 0.8, (16, 16, 3)).astype(np.float32)
        frames = np.stack([np.clip(
            base + r.normal(0, 0.02, (16, 16, 3)), 0, 1).astype(np.float32)
            for _ in range(2)])
        frames = np.stack([np.kron(f, np.ones((4, 4, 1))).astype(np.float32)
                           for f in frames])  # 64px, smooth
        masks = np.zeros(frames.shape[:3] + (1,), np.float32)
        clips.append((frames, masks))

    cfg = DMCConfig.variant("plain", ch_d=16, ch_y=8, ch_z=8, ch_recon=16,
                            recon_residual=True)
    model = DMC(cfg)
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(clips[0][0][1])[None]
    dpb = {"frame": jnp.asarray(clips[0][0][0])[None],
           "feature": jnp.zeros((1, 8, 8, 16))}
    params = model.init({"params": key, "noise": key}, x, jnp.int32(32),
                        dpb, after_i=True, train=False)["params"]

    # healthy: recon == prev frame -> cross-clip recons differ
    rep = latent_liveness(model, params, clips[0], clips[1])
    assert not liveness_collapsed(rep)

    # collapsed: kill the analysis transform -> alive_y == 0 everywhere
    dead = dict(params)
    dead["q_encoder"] = params["q_encoder"] * 0.0
    rep_dead = latent_liveness(model, dead, clips[0], clips[1])
    assert max(r["alive_y"] for r in rep_dead.values()) == 0.0
    assert liveness_collapsed(rep_dead)


def test_batched_eval_matches_per_clip(models):
    """evaluate_rd_batched must reproduce the per-clip eval path exactly
    (same model applies, same host metric math) — it only batches the
    device calls (rd_tpu marathon eval was 24 tunnel round-trips per
    (clip, QP); batched is one per QP)."""
    from ssgvc_tpu.training.evaluate import (evaluate_rd_batched,
                                             make_batched_gop_eval)
    dmci, pi, dmc, pp = models
    rng = np.random.default_rng(5)
    clips = []
    for i in range(2):
        frames = rng.uniform(0, 1, (3, 64, 64, 3)).astype(np.float32)
        masks = (rng.uniform(0, 1, (3, 64, 64, 1)) > 0.7).astype(np.float32)
        clips.append((frames, masks))
    index_map, qp_shift = [0, 1, 0, 2, 0, 2, 0, 2], [0, 8, 4]

    def eval_qp(qp):
        out = []
        for frames, masks in clips:
            out.extend(evaluate_gop_estimated(
                dmci, pi, dmc, pp, frames, masks, qp, index_map, qp_shift))
        return out

    ref_curve = rd_sweep(eval_qp, qps=[8, 48])

    run = make_batched_gop_eval(dmci, dmc, index_map, qp_shift, seq_len=3)
    fast = evaluate_rd_batched(run, pi, pp, clips, qps=[8, 48])
    full = evaluate_rd_batched(run, pi, pp, clips, qps=[8, 48],
                               compute_msssim=True)
    # batched and per-clip traces fuse differently in XLA: tolerance is
    # float-noise-sized, not semantic. bpp noise grew from ~4e-6 to ~4e-4
    # when the bit-estimate symbol clamp widened from +-6 to +-127 (r05): a
    # schedule-dependent rounding flip on one tail symbol now contributes
    # its true (large) bit cost instead of a clamped one.
    for key, atol in (("bpp", 2e-3), ("psnr", 1e-2), ("roi_psnr", 1e-2)):
        np.testing.assert_allclose(fast[key], ref_curve[key], atol=atol,
                                   err_msg=key)
        np.testing.assert_allclose(full[key], ref_curve[key], atol=atol,
                                   err_msg=key)
    assert fast["msssim"] == [None, None]  # 64px < 88px floor anyway


def test_evaluate_gop_mask_prop_chain_carry():
    """mask_prop GOP eval must feed the model the mask CHAIN (GT only at the
    first P-frame), matching the codec's decoder-side propagation — not the
    per-frame GT (which leaks segmentation the decoder wouldn't have)."""
    rng = jax.random.PRNGKey(4)
    dmci = DMCI(DMCIConfig.tiny())
    dmc = DMC(DMCConfig.variant("mask_prop", **TINY))
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    m0 = jnp.zeros((1, 64, 64, 1), jnp.float32)
    dpb0 = {"frame": x0, "feature": jnp.zeros((1, 8, 8, TINY["ch_d"]),
                                              jnp.float32)}
    pi = dmci.init({"params": rng}, x0, jnp.int32(0), train=False)["params"]
    pp = dmc.init({"params": rng}, x0, jnp.int32(0), dpb0,
                  after_i=jnp.bool_(True), mask=m0, train=False)["params"]

    nrng = np.random.default_rng(9)
    frames = nrng.uniform(0, 1, (4, 64, 64, 3)).astype(np.float32)
    masks = (nrng.uniform(0, 1, (4, 64, 64, 1)) > 0.6).astype(np.float32)

    res = evaluate_gop_estimated(dmci, pi, dmc, pp, frames, masks, qp=30,
                                 index_map=[0], qp_shift=[0])

    # manual chain-carry oracle
    out = dmci.apply({"params": pi}, jnp.asarray(frames[0])[None],
                     jnp.int32(30), train=False)
    dpb = {"frame": out["dpb"]["frame"],
           "feature": jnp.zeros((1, 8, 8, TINY["ch_d"]), jnp.float32)}
    carry = None
    for t in range(1, 4):
        m = jnp.asarray(masks[t])[None] if carry is None else carry
        o = dmc.apply({"params": pp}, jnp.asarray(frames[t])[None],
                      jnp.int32(30), dpb, after_i=(t == 1), mask=m,
                      train=False)
        carry = m if t == 1 else o["mask_pred"]
        np.testing.assert_allclose(float(o["bpp"][0]), res[t]["bpp"],
                                   rtol=1e-6)
        dpb = o["dpb"]
