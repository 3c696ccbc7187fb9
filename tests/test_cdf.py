"""Fast-tier coverage for the quantized-CDF table builders (coding/cdf.py).

The slow codec round-trip tests exercise these end-to-end through full model
compiles; these tests pin the table semantics directly so a cdf.py regression
is caught by the <2-min tier (round-2 verdict: the fast tier alone could not
catch a codec regression).

Reference semantics: src/models/entropy_models.py:152-283 (z support scan,
Gaussian y tables), src/refactor/entropy_models.py:220-243 (256-level
Gaussian/Laplace profiles), src/layers/inference.py:65-84 (index builders).
"""

import numpy as np
import pytest

from ssgvc_tpu.coding.cdf import (
    REFRACTOR_PROFILES,
    build_indexes_decoder,
    build_indexes_encoder,
    build_y_cdf_tables,
    build_z_cdf_tables,
    scale_index_params,
)
from ssgvc_tpu.coding.rans import EntropyCoder


def _assert_rows_valid(tables, precision=16):
    cdfs, lengths, offsets = tables
    total = 1 << precision
    for r in range(cdfs.shape[0]):
        n = int(lengths[r])
        row = cdfs[r, :n]
        assert row[0] == 0 and row[-1] == total, (r, row[0], row[-1])
        assert (np.diff(row) > 0).all(), f"row {r} has zero-freq bins"
        assert (cdfs[r, n:] == 0).all()


def test_y_tables_valid_gaussian():
    t = build_y_cdf_tables()  # RT profile: (0.11, 16, 128)
    assert t.cdfs.shape[0] == 128
    _assert_rows_valid(t)
    # offsets mirror the symmetric support: offset = -(pmf_len - 1) / 2,
    # pmf_len = lengths - 2 (escape tail + cdf start)
    supports = t.lengths - 2
    np.testing.assert_array_equal(t.offsets, -(supports - 1) // 2)
    # larger scales need wider support
    assert t.lengths[0] <= t.lengths[-1]
    assert t.lengths[0] == 5 + 2  # scale 0.11: center=2 -> support 5


@pytest.mark.parametrize("profile", sorted(REFRACTOR_PROFILES))
def test_y_tables_valid_refactor_profiles(profile):
    kw = REFRACTOR_PROFILES[profile]
    t = build_y_cdf_tables(distribution=profile, scan_range=50, **kw)
    assert t.cdfs.shape[0] == kw["levels"]
    _assert_rows_valid(t)


def test_y_tables_coder_round_trip():
    """Tables + index builders + the C coder agree: scales outside the table
    clamp to the edge rows and symbols still round trip (via the pmf support
    or the escape path)."""
    t = build_y_cdf_tables()
    ec = EntropyCoder()
    g = ec.add_cdf(t.cdfs, t.lengths, t.offsets)

    rng = np.random.default_rng(7)
    n = 4000
    scales = np.exp(rng.uniform(np.log(0.05), np.log(24.0), n)).astype(
        np.float32)  # deliberately exceeds [0.11, 16] on both ends
    symbols = np.round(rng.normal(0.0, scales)).astype(np.int32)
    symbols = np.clip(symbols, -64, 64)

    packed = np.asarray(build_indexes_encoder(symbols, scales))
    idx_dec = np.asarray(build_indexes_decoder(scales)).astype(np.int32)
    assert packed.dtype == np.int16
    np.testing.assert_array_equal(packed & 0xFF, idx_dec & 0xFF)
    assert idx_dec.min() >= 0 and idx_dec.max() <= 127

    ec.reset()
    ec.encode_y(packed.astype(np.int16), g)
    ec.flush()
    ec.set_stream(ec.get_encoded_stream())
    ec.decode_y(idx_dec, g)
    np.testing.assert_array_equal(ec.get_decoded_tensor(), symbols)


def test_scale_index_params_edges():
    log_min, recip = scale_index_params()
    idx = np.asarray(build_indexes_decoder(np.array([1e-4, 0.11, 16.0, 99.0],
                                                    np.float32)))
    assert idx[0] == 0 and idx[1] == 0
    assert idx[2] == 127 and idx[3] == 127


def test_z_tables_round_trip():
    """Factorized-prior tables from a freshly initialized BitEstimator:
    row layout qp*C + c, offsets give the support minimum, and the coder
    round-trips z symbols using start_offset = qp * C."""
    import jax

    from ssgvc_tpu.models.entropy import BitEstimator

    qp_num, ch = 2, 3
    be = BitEstimator(qp_num, ch)
    params = be.init(jax.random.PRNGKey(0),
                     np.zeros((qp_num, 1, 4, ch), np.float32),
                     np.arange(qp_num, dtype=np.int32))["params"]
    t = build_z_cdf_tables(params, qp_num, ch)
    assert t.cdfs.shape[0] == qp_num * ch
    _assert_rows_valid(t)
    assert (t.offsets <= 0).all() and (t.offsets >= -16).all()

    ec = EntropyCoder()
    g = ec.add_cdf(t.cdfs, t.lengths, t.offsets)
    rng = np.random.default_rng(3)
    per_ch = 32
    z = np.clip(np.round(rng.normal(0, 1.2, ch * per_ch)), -8, 8).astype(
        np.int8)
    for qp in range(qp_num):
        ec.reset()
        ec.encode_z(z, g, start_offset=qp * ch, per_channel_size=per_ch)
        ec.flush()
        ec.set_stream(ec.get_encoded_stream())
        ec.decode_z(len(z), g, start_offset=qp * ch, per_channel_size=per_ch)
        np.testing.assert_array_equal(ec.get_decoded_tensor(),
                                      z.astype(np.int32))


def test_estimator_vs_coder_bits_gap():
    """The differentiable rate estimate (gaussian_bits on +-127-clipped
    symbols — models/dmc.py bit path) must track the REAL rANS stream size
    within a few percent across the whole rate range, including high-rate
    rows (the r04 curves showed 15-19% undercount at QP56 from the old +-6
    symbol clamp). Synthetic oracle: symbols drawn from the same rounded
    Gaussians the tables model, so table quantization + escapes + stream
    overhead are the only gap sources."""
    import math

    from ssgvc_tpu.models.entropy import gaussian_bits

    # the codec's actual table geometry (coding/codec.py default profile):
    # pmf support covers 3.9 sigma of the largest table scale
    t = build_y_cdf_tables(scan_range=min(64, int(math.ceil(3.9 * 16.0))))
    ec = EntropyCoder()
    g = ec.add_cdf(t.cdfs, t.lengths, t.offsets)
    rng = np.random.default_rng(11)
    n = 20000

    # measured r05 decomposition: in-table rows code within +0.2% of the
    # estimate; sigma>scale_max clamps to the top row and costs +1.8% up to
    # 1.5x scale_max (the old +-6 symbol clamp, not the coder, caused the
    # r04 15-19% undercount: it alone hides 4-9% at sigma 4-8)
    for lo, hi, tol_pct in [(0.11, 2.0, 2.0),    # low-rate rows
                            (2.0, 16.0, 2.0),    # high-rate rows (in-table)
                            (0.11, 16.0, 2.0),   # full mixed range
                            (16.0, 24.0, 4.0)]:  # out-of-table scales
        scales = np.exp(rng.uniform(np.log(lo), np.log(hi), n)).astype(
            np.float32)
        symbols = np.round(rng.normal(0.0, scales)).astype(np.int32)
        symbols = np.clip(symbols, -127, 127)

        est_bits = float(np.sum(np.asarray(gaussian_bits(
            symbols.astype(np.float32), scales))))

        packed = np.asarray(build_indexes_encoder(symbols, scales))
        ec.reset()
        ec.encode_y(packed.astype(np.int16), g)
        ec.flush()
        real_bits = len(ec.get_encoded_stream()) * 8

        gap_pct = 100.0 * (real_bits - est_bits) / est_bits
        assert abs(gap_pct) < tol_pct, (
            f"sigma in [{lo}, {hi}]: est {est_bits:.0f} vs real "
            f"{real_bits} bits ({gap_pct:+.1f}%)")
