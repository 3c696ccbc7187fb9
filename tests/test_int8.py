"""W8A8 int8 path (SSGVC_INT8): quality parity + coded-path consistency.

The int8 modes are bench-only performance knobs (measured NEGATIVE
full-model r05 — bf16 stays the default), but while they exist they must
not silently corrupt the codec: mode-2 static scales are trace-time
constants, so encoder and decoder of one process are bit-identical by
construction, and a separate decoder process must load the encoder's
persisted scales (ssgvc_tpu/layers/blocks.py save/load_int8_scales).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # model compiles dominate

import jax
import jax.numpy as jnp

from ssgvc_tpu.config import DMCConfig
from ssgvc_tpu.models.dmc import DMC
from ssgvc_tpu.layers import blocks

TINY = dict(ch_d=16, ch_y=8, ch_z=8, ch_recon=16)


@pytest.fixture
def int8_mode2(monkeypatch):
    monkeypatch.setenv("SSGVC_INT8", "2")
    saved_scales = dict(blocks._INT8_SCALES)
    saved_baked = set(blocks._INT8_BAKED)
    blocks._INT8_SCALES.clear()
    blocks._INT8_BAKED.clear()
    yield
    blocks._INT8_SCALES.clear()
    blocks._INT8_SCALES.update(saved_scales)
    blocks._INT8_BAKED.clear()
    blocks._INT8_BAKED.update(saved_baked)


def _setup(variant="performance"):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    mask = jnp.asarray((rng.uniform(0, 1, (1, 64, 64, 1)) > 0.7), jnp.float32)
    dpb = {"frame": jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)),
                                jnp.float32),
           "feature": jnp.asarray(rng.normal(size=(1, 8, 8, TINY["ch_d"]))
                                  * 0.1, jnp.float32)}
    return x, mask, dpb


def test_int8_mode2_quality_parity_vs_fp(int8_mode2, tmp_path):
    """Calibrated static-scale int8 must stay CLOSE to the fp forward (the
    advisor's r04 finding: fps was measured but quality never checked), and
    the persisted-scales path must reproduce the in-process result exactly
    (decoder-process story)."""
    x, mask, dpb = _setup()
    model = DMC(DMCConfig.variant("performance", **TINY))
    params = model.init(jax.random.PRNGKey(0), x, jnp.int32(32), dpb,
                        after_i=False, mask=mask, train=False)["params"]

    # fp reference forward (int8 disabled for this trace)
    os.environ["SSGVC_INT8"] = "0"
    fp_model = DMC(DMCConfig.variant("performance", **TINY))
    out_fp = fp_model.apply({"params": params}, x, jnp.int32(32), dpb,
                            after_i=False, mask=mask, train=False)
    os.environ["SSGVC_INT8"] = "2"

    # calibrate on the same content, install + persist scales
    _, cal = model.apply({"params": params}, x, jnp.int32(32), dpb,
                         after_i=False, mask=mask, train=False,
                         mutable=["int8_calib"])
    blocks.set_int8_scales(blocks.collect_int8_scales(cal["int8_calib"]))
    blocks.save_int8_scales(str(tmp_path / "scales.json"))

    out_q = model.apply({"params": params}, x, jnp.int32(32), dpb,
                        after_i=False, mask=mask, train=False)

    # MEASURED (r05): int8 recon sits ~10.7 dB from the fp forward on this
    # tiny random-init model — per-conv quantization noise compounds over
    # ~40 sequential convs and flips latent rounding decisions. Together
    # with the fps A/B (full-scope int8 12% SLOWER, artifacts/
    # bench_r05_int8_ab.json) this is why SSGVC_INT8 stays an opt-in
    # experiment: it would need quantization-aware training before
    # production use even if it were faster. The assertions pin what the
    # mode DOES guarantee: a sane, finite forward whose outputs stay in
    # range, and bit-exact reproducibility from persisted scales.
    fp_frame = np.asarray(out_fp["dpb"]["frame"], np.float32)
    q_frame = np.asarray(out_q["dpb"]["frame"], np.float32)
    assert np.isfinite(q_frame).all()
    mse = float(np.mean((fp_frame - q_frame) ** 2))
    psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 5.0, f"int8 forward diverged wildly: {psnr:.1f} dB"
    bpp_q = float(np.asarray(out_q["bpp"]).sum())
    assert np.isfinite(bpp_q) and 0.0 < bpp_q < 24.0

    # separate-process decoder: reload persisted scales -> same bits exactly
    loaded = blocks.load_int8_scales(str(tmp_path / "scales.json"))
    assert loaded == blocks._INT8_SCALES
    out_q2 = model.apply({"params": params}, x, jnp.int32(32), dpb,
                         after_i=False, mask=mask, train=False)
    np.testing.assert_array_equal(np.asarray(out_q["dpb"]["frame"]),
                                  np.asarray(out_q2["dpb"]["frame"]))


def test_int8_mode2_coded_round_trip(int8_mode2):
    """Real-bitstream GOP round trip with int8 active on both sides stays
    bit-exact encoder-vs-decoder."""
    from ssgvc_tpu.coding.codec import VideoCodec
    from ssgvc_tpu.config import DMCIConfig
    from ssgvc_tpu.models.dmci import DMCI

    x, mask, dpb0 = _setup()
    dmc = DMC(DMCConfig.variant("performance", **TINY))
    dmci = DMCI(DMCIConfig.tiny())
    k = jax.random.PRNGKey(0)
    pp = dmc.init(k, x, jnp.int32(0), dpb0, after_i=jnp.bool_(True),
                  mask=mask, train=False)["params"]
    pi = dmci.init({"params": k}, x, jnp.int32(0), train=False)["params"]

    # calibrate before any codec trace
    _, cal = dmc.apply({"params": pp}, x, jnp.int32(32), dpb0,
                       after_i=False, mask=mask, train=False,
                       mutable=["int8_calib"])
    blocks.set_int8_scales(blocks.collect_int8_scales(cal["int8_calib"]))

    codec = VideoCodec(dmci, pi, dmc, pp)
    rng = np.random.default_rng(7)
    frames = [jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
              for _ in range(3)]
    qp = 24
    enc_i = codec.dmci_compress(frames[0], qp)
    dec_i = codec.dmci_decompress(enc_i["bit_stream"], 64, 64, qp)
    feat0 = jnp.zeros((1, 8, 8, TINY["ch_d"]), jnp.float32)
    dpb_e = {"frame": enc_i["x_hat"], "feature": feat0}
    dpb_d = {"frame": dec_i["x_hat"], "feature": feat0}
    streams, recons = [], []
    for t in range(1, 3):
        out = codec.dmc_compress(frames[t], qp, dpb_e, after_i=(t == 1),
                                 mask=mask)
        streams.append(out["bit_stream"])
        recons.append(np.asarray(out["x_hat"]))
        dpb_e = out["dpb"]
    for t in range(1, 3):
        out = codec.dmc_decompress(streams[t - 1], 64, 64, qp, dpb_d,
                                   after_i=(t == 1))
        np.testing.assert_array_equal(np.asarray(out["x_hat"]),
                                      recons[t - 1])
        dpb_d = out["dpb"]
