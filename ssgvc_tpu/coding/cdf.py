"""Quantized-CDF table construction for the real rANS coder.

The ``update()`` step of the reference entropy models rebuilt functionally:

  * ``build_z_cdf_tables`` — evaluates the trained per-QP factorized CDF
    (BitEstimator) on an integer grid, finds per-(qp, channel) support
    [-minima, maxima], and quantizes pmf+tail into rANS tables
    (src/models/entropy_models.py:152-205).
  * ``build_y_cdf_tables`` — zero-mean Gaussian tables over the log-spaced
    scale table (src/models/entropy_models.py:248-283).
  * index builders matching src/layers/inference.py:65-84 (log-scale index,
    fused (symbol<<8)|index packing).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from ..models.entropy import BitEstimator
from .rans import pmf_to_quantized_cdf


class CdfTables(NamedTuple):
    cdfs: np.ndarray      # (rows, max_len + 2) int32
    lengths: np.ndarray   # (rows,) int32  — used entries per row
    offsets: np.ndarray   # (rows,) int32


def _quantize_rows(pmf: np.ndarray, tail: np.ndarray, lengths: np.ndarray,
                   offsets: np.ndarray, precision: int = 16) -> CdfTables:
    rows = pmf.shape[0]
    max_len = int(lengths.max())
    out = np.zeros((rows, max_len + 2), np.int32)
    cdf_lengths = np.zeros(rows, np.int32)
    for r in range(rows):
        n = int(lengths[r])
        full = np.concatenate([pmf[r, :n], [max(tail[r], 0.0)]]).astype(np.float32)
        cdf = pmf_to_quantized_cdf(full, precision)
        out[r, : len(cdf)] = cdf
        cdf_lengths[r] = len(cdf)  # = n + 2
    return CdfTables(out, cdf_lengths, offsets.astype(np.int32))


def build_z_cdf_tables(bit_estimator_params, qp_num: int, channel: int,
                       scan_range: int = 16, precision: int = 16) -> CdfTables:
    """Per-(qp, channel) factorized-prior tables; rows ordered qp*C + c so the
    coder's ``start_offset = qp * C`` convention holds
    (src/models/entropy_models.py:207-219).

    ``scan_range`` widened 8 -> 16 (r05): the support search below still
    SHRINKS each row to where the trained CDF's mass lives, but a trained
    high-QP z row whose mass extends past +-8 previously got truncated and
    its symbols escape-coded (one contributor to the r04 high-QP
    estimated-vs-real bpp gap)."""
    be = BitEstimator(qp_num, channel)
    index = jnp.arange(qp_num, dtype=jnp.int32)

    def cdf_at(x_grid: np.ndarray) -> np.ndarray:
        # x_grid: (L,) -> evaluate per (qp, c): feed (Q, 1, L, C)
        x = jnp.asarray(x_grid, jnp.float32)[None, None, :, None]
        x = jnp.broadcast_to(x, (qp_num, 1, len(x_grid), channel))
        out = be.apply({"params": bit_estimator_params}, x, index,
                       method=be.get_cdf)
        return np.asarray(out)[:, 0]  # (Q, L, C)

    ints = np.arange(-scan_range, scan_range + 1)
    cdf_lo = cdf_at(ints - 0.5)   # (Q, L, C)
    cdf_hi = cdf_at(ints + 0.5)

    # support per (q, c): minima = smallest i in [2, scan] with cdf(-i)<1e-4,
    # maxima = smallest i with cdf(+i)>0.9999; default scan_range
    # (mirrors the reference's downward where-scan, entropy_models.py:160-172)
    cdf_points = cdf_at(ints.astype(np.float64))  # (Q, L, C) at integers
    center = scan_range
    minima = np.full((qp_num, channel), scan_range, np.int32)
    maxima = np.full((qp_num, channel), scan_range, np.int32)
    for i in range(scan_range, 1, -1):
        minima = np.where(cdf_points[:, center - i, :] < 1e-4, i, minima)
        maxima = np.where(cdf_points[:, center + i, :] > 0.9999, i, maxima)

    pmf_all = np.clip(cdf_hi - cdf_lo, 0.0, 1.0)  # (Q, L, C)

    rows = qp_num * channel
    lengths = np.zeros(rows, np.int32)
    offsets = np.zeros(rows, np.int32)
    max_len = int((minima + maxima + 1).max())
    pmf = np.zeros((rows, max_len), np.float64)
    tail = np.zeros(rows, np.float64)
    for q in range(qp_num):
        for c in range(channel):
            lo, hi = int(minima[q, c]), int(maxima[q, c])
            n = lo + hi + 1
            r = q * channel + c
            seg = pmf_all[q, center - lo: center + hi + 1, c]
            pmf[r, :n] = seg
            lengths[r] = n
            offsets[r] = -lo
            tail[r] = max(0.0, 1.0 - seg.sum())
    return _quantize_rows(pmf, tail, lengths, offsets, precision)


#: The refactor GaussianEncoder's fixed per-distribution scale-table params
#: (src/refactor/entropy_models.py:220-243): 256 log-spaced levels up to 64,
#: Laplace reaching down to 0.01. The RT-style coder uses (0.11, 16, 128).
REFRACTOR_PROFILES = {
    "gaussian": dict(scale_min=0.11, scale_max=64.0, levels=256),
    "laplace": dict(scale_min=0.01, scale_max=64.0, levels=256),
}


def build_y_cdf_tables(scale_min: float = 0.11, scale_max: float = 16.0,
                       levels: int = 128, scan_range: int = 8,
                       precision: int = 16,
                       distribution: str = "gaussian") -> CdfTables:
    """Zero-mean Gaussian/Laplace tables over the log-spaced scale table
    (src/models/entropy_models.py:248-283; distribution choice + wide table
    from the refactor GaussianEncoder, src/refactor/entropy_models.py:220-243
    — its scan range is 50 to cover scale_max=64)."""
    scales = np.exp(np.linspace(math.log(scale_min), math.log(scale_max),
                                levels))

    if distribution == "laplace":
        def ncdf(x, s):
            x = np.asarray(x, np.float64)
            e = 0.5 * np.exp(-np.abs(x) / s)  # branch-free: no exp overflow
            return np.where(x < 0, e, 1.0 - e)
    elif distribution == "gaussian":
        def ncdf(x, s):
            return 0.5 * (1 + np.vectorize(math.erf)(x / (s * math.sqrt(2.0))))
    else:
        raise ValueError(f"unknown distribution {distribution!r}")

    # pmf_center = smallest i in [2, scan] with cdf(i) > 0.9999 else scan
    centers = np.full(levels, scan_range, np.int32)
    for i in range(scan_range, 1, -1):
        centers = np.where(ncdf(float(i), scales) > 0.9999, i, centers)

    lengths = 2 * centers + 1
    max_len = int(lengths.max())
    pmf = np.zeros((levels, max_len), np.float64)
    tail = np.zeros(levels, np.float64)
    offsets = -centers.astype(np.int32)
    for r in range(levels):
        c = int(centers[r])
        xs = np.arange(-c, c + 1, dtype=np.float64)
        upper = ncdf(xs + 0.5, scales[r])
        lower = ncdf(xs - 0.5, scales[r])
        pmf[r, : 2 * c + 1] = upper - lower
        tail[r] = 2 * lower[0]
    return _quantize_rows(pmf, tail, lengths, offsets, precision)


# ------------------------- index builders (device/jnp) -----------------------

def scale_index_params(scale_min: float = 0.11, scale_max: float = 16.0,
                       levels: int = 128) -> Tuple[float, float]:
    log_min = math.log(scale_min)
    log_step = (math.log(scale_max) - log_min) / (levels - 1)
    return log_min, 1.0 / log_step


def build_indexes_decoder(scales: jnp.ndarray, scale_min: float = 0.11,
                          scale_max: float = 16.0, levels: int = 128):
    """(src/layers/inference.py:65-72): clamp, log-scale -> int index."""
    log_min, recip = scale_index_params(scale_min, scale_max, levels)
    s = jnp.clip(scales, scale_min, scale_max)
    return ((jnp.log(s) - log_min) * recip).astype(jnp.int32)


def build_indexes_encoder(symbols: jnp.ndarray, scales: jnp.ndarray,
                          scale_min: float = 0.11, scale_max: float = 16.0,
                          levels: int = 128):
    """(src/layers/inference.py:75-84): fused (symbol<<8) + index int16."""
    idx = build_indexes_decoder(scales, scale_min, scale_max, levels)
    sym = jnp.clip(jnp.round(symbols), -127, 127).astype(jnp.int32)
    return ((sym << 8) + idx).astype(jnp.int16)
