"""Real coded path: bit-exact encoder/decoder round trips + container."""

import io

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-model compiles dominate

import jax
import jax.numpy as jnp

from ssgvc_tpu.config import DMCConfig, DMCIConfig
from ssgvc_tpu.models.dmc import DMC
from ssgvc_tpu.models.dmci import DMCI
from ssgvc_tpu.coding.bitstream import (
    BitstreamReader,
    BitstreamWriter,
    SPSHelper,
    read_uint_adaptive,
    write_uint_adaptive,
)
from ssgvc_tpu.coding.codec import VideoCodec

TINY = dict(ch_d=16, ch_y=8, ch_z=8, ch_recon=16)


@pytest.fixture(scope="module")
def codec():
    dmci = DMCI(DMCIConfig.tiny())
    dmc = DMC(DMCConfig.variant("performance", **TINY))
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    mask = jnp.zeros((1, 64, 64, 1), jnp.float32)
    dpb = {"frame": x, "feature": jnp.zeros((1, 8, 8, TINY["ch_d"]), jnp.float32)}
    pi = dmci.init({"params": rng}, x, jnp.int32(0), train=False)["params"]
    pp = dmc.init({"params": rng}, x, jnp.int32(0), dpb,
                  after_i=jnp.bool_(True), mask=mask, train=False)["params"]
    return VideoCodec(dmci, pi, dmc, pp)


def test_adaptive_uint_round_trip():
    buf = io.BytesIO()
    values = [0, 1, 253, 254, 255, 65535, 65536, 10**9]
    for v in values:
        write_uint_adaptive(buf, v)
    buf.seek(0)
    assert [read_uint_adaptive(buf) for _ in values] == values


def test_sps_helper_id_reuse():
    h = SPSHelper()
    id1, new1 = h.get_sps_id(1080, 1920)
    id2, new2 = h.get_sps_id(1080, 1920)
    id3, new3 = h.get_sps_id(720, 1280)
    assert new1 and not new2 and new3
    assert id1 == id2 != id3


def test_container_round_trip():
    buf = io.BytesIO()
    w = BitstreamWriter(buf)
    w.write_frame(True, 64, 64, 21, b"ipayload")
    w.write_frame(False, 64, 64, 29, b"ppayload1")
    w.write_frame(False, 64, 64, 25, b"ppayload2")
    buf.seek(0)
    r = BitstreamReader(buf)
    f1 = r.read_frame()
    assert f1["type"] == "i" and f1["qp"] == 21 and f1["payload"] == b"ipayload"
    assert f1["sps"].height == 64
    f2 = r.read_frame()
    assert f2["type"] == "p" and f2["payload"] == b"ppayload1"
    f3 = r.read_frame()
    assert f3["qp"] == 25
    assert r.read_frame() is None


def test_dmci_round_trip(codec):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    enc = codec.dmci_compress(x, qp=30)
    assert len(enc["bit_stream"]) > 0
    dec = codec.dmci_decompress(enc["bit_stream"], 64, 64, qp=30)
    np.testing.assert_array_equal(np.asarray(enc["x_hat"]),
                                  np.asarray(dec["x_hat"]))


def test_dmc_round_trip_gop(codec):
    """I + 3 P frames: decoder reproduces the encoder's reconstructions
    bit-exactly across the temporal chain."""
    rng = np.random.default_rng(2)
    frames = [jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
              for _ in range(4)]
    mask = jnp.asarray((rng.uniform(0, 1, (1, 64, 64, 1)) > 0.6)
                       .astype(np.float32))
    qp = 20

    enc_i = codec.dmci_compress(frames[0], qp)
    dec_i = codec.dmci_decompress(enc_i["bit_stream"], 64, 64, qp)
    feat0 = jnp.zeros((1, 8, 8, TINY["ch_d"]), jnp.float32)
    dpb_e = {"frame": enc_i["x_hat"], "feature": feat0}
    dpb_d = {"frame": dec_i["x_hat"], "feature": feat0}

    streams = []
    recons_enc = []
    for t in range(1, 4):
        out = codec.dmc_compress(frames[t], qp, dpb_e, after_i=(t == 1),
                                 mask=mask)
        streams.append(out["bit_stream"])
        recons_enc.append(np.asarray(out["x_hat"]))
        dpb_e = out["dpb"]

    for t in range(1, 4):
        out = codec.dmc_decompress(streams[t - 1], 64, 64, qp, dpb_d,
                                   after_i=(t == 1))
        np.testing.assert_array_equal(np.asarray(out["x_hat"]),
                                      recons_enc[t - 1])
        dpb_d = out["dpb"]


def test_packed_dmc_round_trip(codec):
    """packed_dmc=True runs the P-loop in the pixel-unshuffled domain with
    the SAME params (the bench fast path); the raw API is unchanged and the
    GOP stays bit-exact encoder-vs-decoder, including across the raw-I ->
    packed-P DPB handoff."""
    packed = VideoCodec(codec.dmci, codec.params_i, codec.dmc,
                        codec.params_p, packed_dmc=True)
    assert packed.dmc.cfg.packed_io
    rng = np.random.default_rng(7)
    frames = [jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
              for _ in range(3)]
    mask = jnp.asarray((rng.uniform(0, 1, (1, 64, 64, 1)) > 0.6)
                       .astype(np.float32))
    qp = 24

    enc_i = packed.dmci_compress(frames[0], qp)
    dec_i = packed.dmci_decompress(enc_i["bit_stream"], 64, 64, qp)
    feat0 = jnp.zeros((1, 8, 8, TINY["ch_d"]), jnp.float32)
    dpb_e = {"frame": enc_i["x_hat"], "feature": feat0}
    dpb_d = {"frame": dec_i["x_hat"], "feature": feat0}

    streams, recons = [], []
    for t in range(1, 3):
        out = packed.dmc_compress(frames[t], qp, dpb_e, after_i=(t == 1),
                                  mask=mask)
        assert out["x_hat"].shape == (1, 64, 64, 3)   # raw API out
        assert out["dpb"]["frame"].shape[-1] == 192   # packed DPB carry
        streams.append(out["bit_stream"])
        recons.append(np.asarray(out["x_hat"]))
        dpb_e = out["dpb"]
    for t in range(1, 3):
        out = packed.dmc_decompress(streams[t - 1], 64, 64, qp, dpb_d,
                                    after_i=(t == 1))
        np.testing.assert_array_equal(np.asarray(out["x_hat"]),
                                      recons[t - 1])
        dpb_d = out["dpb"]


def test_dmc_bitrate_sane(codec):
    """Stream size responds to qp and content (not constant/degenerate)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    dpb = {"frame": x, "feature": jnp.zeros((1, 8, 8, TINY["ch_d"]),
                                            jnp.float32)}
    out = codec.dmc_compress(x, 32, dpb, after_i=True)
    n_pixels = 64 * 64
    bpp = len(out["bit_stream"]) * 8 / n_pixels
    assert 0.001 < bpp < 24.0


def test_coding_session_file_round_trip(codec, tmp_path):
    """Whole sequence -> container file -> decode; bit-exact recons."""
    from ssgvc_tpu.coding.session import CodingSession

    rng = np.random.default_rng(7)
    frames = rng.uniform(0, 1, (5, 64, 64, 3)).astype(np.float32)
    masks = (rng.uniform(0, 1, (5, 64, 64, 1)) > 0.6).astype(np.float32)
    session = CodingSession(codec, gop_size=4)

    path = tmp_path / "seq.bin"
    with open(path, "wb") as f:
        stats = session.encode_sequence(f, frames, qp=25, masks=masks)
    assert stats["frame_types"] == ["I", "P", "P", "P", "I"]
    assert all(b > 0 for b in stats["frame_bits"])

    with open(path, "rb") as f:
        decoded = session.decode_sequence(f)
    assert len(decoded) == 5
    for rec, enc_rec in zip(decoded, stats["recons"]):
        np.testing.assert_array_equal(rec, enc_rec)


def test_two_coder_codec_round_trip():
    """ec_part=1 (two-stream split) stays bit-exact."""
    dmci = DMCI(DMCIConfig.tiny())
    dmc = DMC(DMCConfig.variant("performance", **TINY))
    rng = jax.random.PRNGKey(1)
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    mask0 = jnp.zeros((1, 64, 64, 1), jnp.float32)
    dpb0 = {"frame": x0, "feature": jnp.zeros((1, 8, 8, TINY["ch_d"]),
                                              jnp.float32)}
    pi = dmci.init({"params": rng}, x0, jnp.int32(0), train=False)["params"]
    pp = dmc.init({"params": rng}, x0, jnp.int32(0), dpb0,
                  after_i=jnp.bool_(True), mask=mask0, train=False)["params"]
    codec2 = VideoCodec(dmci, pi, dmc, pp, ec_part=1)

    rngn = np.random.default_rng(9)
    x = jnp.asarray(rngn.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    dpb = {"frame": x, "feature": jnp.zeros((1, 8, 8, TINY["ch_d"]),
                                            jnp.float32)}
    out = codec2.dmc_compress(x, 24, dpb, after_i=True)
    dec = codec2.dmc_decompress(out["bit_stream"], 64, 64, 24, dpb,
                                after_i=True)
    np.testing.assert_array_equal(np.asarray(out["x_hat"]),
                                  np.asarray(dec["x_hat"]))


def test_skip_threshold_round_trip():
    """skip_thres > 0: positions with decoder-derived scale <= thres are not
    coded (src/layers/inference.py:75-84); round trip stays bit-exact and
    the stream shrinks on sparse latents."""
    dmci = DMCI(DMCIConfig.tiny())
    dmc = DMC(DMCConfig.variant("performance", **TINY))
    rng = jax.random.PRNGKey(2)
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    mask0 = jnp.zeros((1, 64, 64, 1), jnp.float32)
    dpb0 = {"frame": x0, "feature": jnp.zeros((1, 8, 8, TINY["ch_d"]),
                                              jnp.float32)}
    pi = dmci.init({"params": rng}, x0, jnp.int32(0), train=False)["params"]
    pp = dmc.init({"params": rng}, x0, jnp.int32(0), dpb0,
                  after_i=jnp.bool_(True), mask=mask0, train=False)["params"]

    rngn = np.random.default_rng(11)
    x = jnp.asarray(rngn.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    dpb = {"frame": x, "feature": jnp.zeros((1, 8, 8, TINY["ch_d"]),
                                            jnp.float32)}

    plain = VideoCodec(dmci, pi, dmc, pp)
    skip = VideoCodec(dmci, pi, dmc, pp, skip_thres=0.5)

    out_plain = plain.dmc_compress(x, 40, dpb, after_i=True)
    out_skip = skip.dmc_compress(x, 40, dpb, after_i=True)
    dec_skip = skip.dmc_decompress(out_skip["bit_stream"], 64, 64, 40, dpb,
                                   after_i=True)
    np.testing.assert_array_equal(np.asarray(out_skip["x_hat"]),
                                  np.asarray(dec_skip["x_hat"]))
    assert len(out_skip["bit_stream"]) < len(out_plain["bit_stream"])


def test_mask_prop_decode_side_mask_chain():
    """mask_prop: the decoder propagates the mask itself and the chain
    bit-matches the encoder side across a GOP
    (src/refactor/mask_prop_seg_video_model.py:365-368)."""
    from ssgvc_tpu.coding.session import CodingSession

    dmci = DMCI(DMCIConfig.tiny())
    dmc = DMC(DMCConfig.variant("mask_prop", **TINY))
    rng = jax.random.PRNGKey(3)
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    mask0 = jnp.zeros((1, 64, 64, 1), jnp.float32)
    dpb0 = {"frame": x0, "feature": jnp.zeros((1, 8, 8, TINY["ch_d"]),
                                              jnp.float32)}
    pi = dmci.init({"params": rng}, x0, jnp.int32(0), train=False)["params"]
    pp = dmc.init({"params": rng}, x0, jnp.int32(0), dpb0,
                  after_i=jnp.bool_(True), mask=mask0, train=False)["params"]
    codec_mp = VideoCodec(dmci, pi, dmc, pp)
    session = CodingSession(codec_mp, gop_size=4)

    rngn = np.random.default_rng(13)
    frames = rngn.uniform(0, 1, (4, 64, 64, 3)).astype(np.float32)
    masks = (rngn.uniform(0, 1, (4, 64, 64, 1)) > 0.6).astype(np.float32)

    import io as _io
    buf = _io.BytesIO()
    stats = session.encode_sequence(buf, frames, qp=30, masks=masks)
    assert len(stats["masks"]) == 3  # one per P-frame

    buf.seek(0)
    decoded, mask_chain = session.decode_sequence(buf, masks=masks,
                                                  return_masks=True)
    assert len(mask_chain) == 3
    for rec, enc_rec in zip(decoded, stats["recons"]):
        np.testing.assert_array_equal(rec, enc_rec)
    for dm, em in zip(mask_chain, stats["masks"]):
        np.testing.assert_array_equal(dm, em)


def test_mask_prop_packed_round_trip():
    """mask_prop + packed_dmc: the P-loop conv stages run pixel-unshuffled
    while the decoder-side mask chain stays raw-domain; the GOP round trip
    is bit-exact encoder-vs-decoder and the chains match (the r04 bench
    fast path previously excluded this variant)."""
    dmci = DMCI(DMCIConfig.tiny())
    dmc = DMC(DMCConfig.variant("mask_prop", **TINY))
    rng = jax.random.PRNGKey(3)
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    mask0 = jnp.zeros((1, 64, 64, 1), jnp.float32)
    dpb0 = {"frame": x0, "feature": jnp.zeros((1, 8, 8, TINY["ch_d"]),
                                              jnp.float32)}
    pi = dmci.init({"params": rng}, x0, jnp.int32(0), train=False)["params"]
    pp = dmc.init({"params": rng}, x0, jnp.int32(0), dpb0,
                  after_i=jnp.bool_(True), mask=mask0, train=False)["params"]
    packed = VideoCodec(dmci, pi, dmc, pp, packed_dmc=True)
    assert packed.dmc.cfg.packed_io

    rngn = np.random.default_rng(11)
    frames = [jnp.asarray(rngn.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
              for _ in range(3)]
    gt_mask = jnp.asarray((rngn.uniform(0, 1, (1, 64, 64, 1)) > 0.6)
                          .astype(np.float32))
    qp = 24

    enc_i = packed.dmci_compress(frames[0], qp)
    dec_i = packed.dmci_decompress(enc_i["bit_stream"], 64, 64, qp)
    feat0 = jnp.zeros((1, 8, 8, TINY["ch_d"]), jnp.float32)
    dpb_e = {"frame": enc_i["x_hat"], "feature": feat0}
    dpb_d = {"frame": dec_i["x_hat"], "feature": feat0}

    streams, recons, enc_masks = [], [], []
    m_e = gt_mask
    for t in range(1, 3):
        out = packed.dmc_compress(frames[t], qp, dpb_e, after_i=(t == 1),
                                  mask=m_e)
        assert out["dpb"]["frame"].shape[-1] == 192   # packed DPB carry
        streams.append(out["bit_stream"])
        recons.append(np.asarray(out["x_hat"]))
        enc_masks.append(np.asarray(out["mask_out"]))
        dpb_e, m_e = out["dpb"], out["mask_out"]

    m_d = gt_mask
    for t in range(1, 3):
        out = packed.dmc_decompress(streams[t - 1], 64, 64, qp, dpb_d,
                                    after_i=(t == 1), mask=m_d)
        np.testing.assert_array_equal(np.asarray(out["x_hat"]),
                                      recons[t - 1])
        np.testing.assert_array_equal(np.asarray(out["mask_out"]),
                                      enc_masks[t - 1])
        dpb_d, m_d = out["dpb"], out["mask_out"]


@pytest.mark.parametrize("profile", ["gaussian", "laplace"])
def test_coder_profile_round_trip(profile):
    """Refactor GaussianEncoder profiles: 256-level 0.11/0.01-64 tables,
    Gaussian or Laplace (src/refactor/entropy_models.py:220-243); round trip
    stays bit-exact with either distribution."""
    dmci = DMCI(DMCIConfig.tiny())
    dmc = DMC(DMCConfig.variant("performance", **TINY))
    rng = jax.random.PRNGKey(5)
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    mask0 = jnp.zeros((1, 64, 64, 1), jnp.float32)
    dpb0 = {"frame": x0, "feature": jnp.zeros((1, 8, 8, TINY["ch_d"]),
                                              jnp.float32)}
    pi = dmci.init({"params": rng}, x0, jnp.int32(0), train=False)["params"]
    pp = dmc.init({"params": rng}, x0, jnp.int32(0), dpb0,
                  after_i=jnp.bool_(True), mask=mask0, train=False)["params"]
    c = VideoCodec(dmci, pi, dmc, pp, coder_profile=profile)
    assert c.scale_levels == 256 and c.scale_max == 64.0

    rngn = np.random.default_rng(17)
    x = jnp.asarray(rngn.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    dpb = {"frame": x, "feature": jnp.zeros((1, 8, 8, TINY["ch_d"]),
                                            jnp.float32)}
    out = c.dmc_compress(x, 40, dpb, after_i=True)
    dec = c.dmc_decompress(out["bit_stream"], 64, 64, 40, dpb, after_i=True)
    np.testing.assert_array_equal(np.asarray(out["x_hat"]),
                                  np.asarray(dec["x_hat"]))

    i_out = c.dmci_compress(x, 2)
    i_dec = c.dmci_decompress(i_out["bit_stream"], 64, 64, 2)
    np.testing.assert_array_equal(np.asarray(i_out["x_hat"]),
                                  np.asarray(i_dec["x_hat"]))
