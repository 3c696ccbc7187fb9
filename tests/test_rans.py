"""Native rANS coder: CDF quantization, round-trips, escapes, stream split."""

import numpy as np
import pytest

from ssgvc_tpu.coding.rans import (
    EntropyCoder,
    RansDecoder,
    RansEncoder,
    pmf_to_quantized_cdf,
)


def gaussian_pmf(sigma, support):
    from scipy.stats import norm  # noqa — fallback below if unavailable
    raise RuntimeError


def make_gaussian_cdf_rows(sigmas, half=8, precision=16):
    """Zero-mean Gaussian CDF rows like the reference's GaussianEncoder.update
    (src/models/entropy_models.py:248-283)."""
    import math

    rows, lengths, offsets = [], [], []
    max_len = 2 * half + 1 + 2
    for s in sigmas:
        xs = np.arange(-half, half + 1, dtype=np.float64)
        upper = 0.5 * (1 + np.vectorize(math.erf)((xs + 0.5) / (s * math.sqrt(2))))
        lower = 0.5 * (1 + np.vectorize(math.erf)((xs - 0.5) / (s * math.sqrt(2))))
        pmf = (upper - lower).astype(np.float32)
        tail = 2 * lower[0]
        full = np.concatenate([pmf, [tail]]).astype(np.float32)
        cdf = pmf_to_quantized_cdf(full, precision)
        row = np.zeros(max_len, np.int32)
        row[: len(cdf)] = cdf
        rows.append(row)
        lengths.append(len(cdf))          # entries = pmf_len + 2
        offsets.append(-half)
    return (np.stack(rows), np.asarray(lengths, np.int32),
            np.asarray(offsets, np.int32))


def test_pmf_to_quantized_cdf():
    pmf = np.array([0.1, 0.4, 0.0, 0.5], np.float32)
    cdf = pmf_to_quantized_cdf(pmf, 16)
    assert cdf[0] == 0 and cdf[-1] == 1 << 16
    freqs = np.diff(cdf)
    assert (freqs > 0).all()  # zero bin was fixed
    assert freqs[1] > freqs[0] > freqs[2] or freqs[2] > 0


def test_round_trip_simple():
    cdfs, lengths, offsets = make_gaussian_cdf_rows([0.5, 1.0, 4.0])
    enc, dec = RansEncoder(), RansDecoder()
    g = enc.add_cdf(cdfs, lengths, offsets)
    dec.add_cdf(cdfs, lengths, offsets)

    rng = np.random.default_rng(0)
    n = 5000
    indexes = rng.integers(0, 3, n).astype(np.int32)
    symbols = np.clip(np.round(rng.normal(0, 2, n)), -8, 8).astype(np.int16)

    enc.encode_with_indexes(symbols, indexes, g)
    enc.flush()
    stream = enc.get_encoded_stream()
    assert 0 < len(stream) < n * 2  # actually compresses

    dec.set_stream(stream)
    dec.decode_batch(indexes, g)
    out = dec.get_decoded()
    np.testing.assert_array_equal(out, symbols.astype(np.int32))


def test_round_trip_escape_values():
    """Out-of-range symbols go through the bypass escape path."""
    cdfs, lengths, offsets = make_gaussian_cdf_rows([1.0], half=4)
    enc, dec = RansEncoder(), RansDecoder()
    g = enc.add_cdf(cdfs, lengths, offsets)
    dec.add_cdf(cdfs, lengths, offsets)

    symbols = np.array([-100, -5, -4, 0, 4, 5, 77, 1000], np.int16)
    indexes = np.zeros(len(symbols), np.int32)
    enc.encode_with_indexes(symbols, indexes, g)
    enc.flush()
    dec.set_stream(enc.get_encoded_stream())
    dec.decode_batch(indexes, g)
    np.testing.assert_array_equal(dec.get_decoded(), symbols.astype(np.int32))


def test_fused_encode_y_packed():
    cdfs, lengths, offsets = make_gaussian_cdf_rows([0.5, 1.0, 2.0, 4.0])
    ec = EntropyCoder()
    g = ec.add_cdf(cdfs, lengths, offsets)

    rng = np.random.default_rng(1)
    n = 1000
    idx = rng.integers(0, 4, n).astype(np.int16)
    sym = np.clip(np.round(rng.normal(0, 1.5, n)), -8, 8).astype(np.int16)
    packed = ((sym.astype(np.int16) << 8) + idx).astype(np.int16)

    ec.reset()
    ec.encode_y(packed, g)
    ec.flush()
    ec.set_stream(ec.get_encoded_stream())
    ec.decode_y(idx.astype(np.int32), g)
    np.testing.assert_array_equal(ec.get_decoded_tensor(), sym.astype(np.int32))


def test_encode_z_per_channel_offsets():
    """z path: row = start_offset + i // per_channel_size (per-QP tables)."""
    n_rows = 6
    cdfs, lengths, offsets = make_gaussian_cdf_rows(
        [0.4 + 0.3 * i for i in range(n_rows)], half=6)
    ec = EntropyCoder()
    g = ec.add_cdf(cdfs, lengths, offsets)

    rng = np.random.default_rng(2)
    per_ch = 16
    z = np.clip(np.round(rng.normal(0, 1, 3 * per_ch)), -6, 6).astype(np.int8)
    ec.reset()
    ec.encode_z(z, g, start_offset=2, per_channel_size=per_ch)
    ec.flush()
    ec.set_stream(ec.get_encoded_stream())
    ec.decode_z(len(z), g, start_offset=2, per_channel_size=per_ch)
    np.testing.assert_array_equal(ec.get_decoded_tensor(), z.astype(np.int32))


def test_two_stream_split():
    cdfs, lengths, offsets = make_gaussian_cdf_rows([1.0, 2.0])
    ec = EntropyCoder()
    g = ec.add_cdf(cdfs, lengths, offsets)
    ec.set_use_two_entropy_coders(True)

    rng = np.random.default_rng(3)
    n = 999  # odd on purpose
    indexes = rng.integers(0, 2, n).astype(np.int32)
    symbols = np.clip(np.round(rng.normal(0, 2, n)), -8, 8).astype(np.int16)
    ec.reset()
    ec.encode_with_indexes(symbols, indexes, g)
    ec.flush()
    ec.set_stream(ec.get_encoded_stream())
    ec.decode_y(indexes, g)
    np.testing.assert_array_equal(ec.get_decoded_tensor(),
                                  symbols.astype(np.int32))


def test_compression_ratio_tracks_entropy():
    """Low-sigma symbols should compress much better than high-sigma."""
    cdfs, lengths, offsets = make_gaussian_cdf_rows([0.2, 8.0])
    rng = np.random.default_rng(4)
    n = 20000

    def coded_size(sigma_idx, sigma):
        enc = RansEncoder()
        g = enc.add_cdf(cdfs, lengths, offsets)
        syms = np.clip(np.round(rng.normal(0, sigma, n)), -8, 8).astype(np.int16)
        enc.encode_with_indexes(syms, np.full(n, sigma_idx, np.int32), g)
        enc.flush()
        return len(enc.get_encoded_stream())

    small = coded_size(0, 0.2)
    big = coded_size(1, 6.0)
    assert small < big / 3
