"""Differentiable entropy estimators (training/estimation path).

TPU rebuild of the reference's learned priors:
  * ``BitEstimator`` — per-QP factorized CDF over the hyper latent z
    (4 stacked Bitparm layers, params shaped (QP, C); reference
    src/models/entropy_models.py:84-224). QP selection is a gather, so one
    jitted graph serves all 64+extra QPs.
  * ``gaussian_bits`` — zero-mean Gaussian bits for y, erf-based and
    numerically hardened exactly like the refactor path
    (src/refactor/common_model.py:37-68).
  * ``gaussian_bits_cdf`` — the original models-side variant
    (src/models/common_model.py:36-47) kept for the 'old' DMC parity.

Entropy math always runs in fp32 even when the conv stacks are bf16.
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp
from flax import linen as nn

_LOG2_RECIP = 1.0 / math.log(2.0)
_ROOT2_RECIP = 1.0 / math.sqrt(2.0)


def probs_to_bits(probs: jnp.ndarray) -> jnp.ndarray:
    """-log2(p + 1e-5), clamped at 0 (src/models/common_model.py:30-34)."""
    bits = -jnp.log(probs + 1e-5) * _LOG2_RECIP
    return jnp.maximum(bits, 0.0)


def gaussian_bits(y: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """Hardened erf-based zero-mean Gaussian bit estimate (refactor variant)."""
    y = jnp.nan_to_num(y.astype(jnp.float32), nan=0.0, posinf=1e4, neginf=-1e4)
    sigma = jnp.nan_to_num(sigma.astype(jnp.float32), nan=1e-5, posinf=1e10,
                           neginf=1e-5)
    sigma = jnp.clip(sigma, 1e-5, 1e10)
    inv_sigma = 1.0 / sigma
    z_hi = jnp.clip((y + 0.5) * inv_sigma, -12.0, 12.0)
    z_lo = jnp.clip((y - 0.5) * inv_sigma, -12.0, 12.0)
    probs = 0.5 * (jax.lax.erf(z_hi * _ROOT2_RECIP) - jax.lax.erf(z_lo * _ROOT2_RECIP))
    probs = jnp.nan_to_num(probs, nan=0.0, posinf=0.0, neginf=0.0)
    probs = jnp.maximum(probs, 1e-9)
    return -jnp.log2(probs)


def gaussian_bits_cdf(y: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """Original models-side variant: Normal CDF diff then probs_to_bits."""
    y = y.astype(jnp.float32)
    sigma = jnp.clip(sigma.astype(jnp.float32), 1e-5, 1e10)

    def cdf(v):
        return 0.5 * (1.0 + jax.lax.erf(v / (sigma * math.sqrt(2.0))))

    probs = cdf(y + 0.5) - cdf(y - 0.5)
    return probs_to_bits(probs)


class Bitparm(nn.Module):
    """One factorized-CDF layer: x*softplus(h)+b (+ tanh(x)*tanh(a) unless final).

    Parameters are per-QP: shape (qp_num, channel); ``index`` selects the row.
    """

    qp_num: int
    channel: int
    final: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, index: jnp.ndarray) -> jnp.ndarray:
        init = nn.initializers.normal(stddev=0.01)
        h = self.param("h", init, (self.qp_num, self.channel))
        b = self.param("b", init, (self.qp_num, self.channel))
        # gather per-QP rows; index may be scalar or (B,)
        h_sel = jnp.take(h, index, axis=0).astype(jnp.float32)
        b_sel = jnp.take(b, index, axis=0).astype(jnp.float32)
        # broadcast (..., C) over NHWC activations
        shape = (-1, 1, 1, self.channel) if h_sel.ndim == 2 else (1, 1, 1, self.channel)
        h_sel = h_sel.reshape(shape)
        b_sel = b_sel.reshape(shape)
        x = x * jax.nn.softplus(h_sel) + b_sel
        if self.final:
            return x
        a = self.param("a", init, (self.qp_num, self.channel))
        a_sel = jnp.take(a, index, axis=0).astype(jnp.float32).reshape(shape)
        return x + jnp.tanh(x) * jnp.tanh(a_sel)


class BitEstimator(nn.Module):
    """Per-QP factorized CDF for z: sigmoid of 4 stacked Bitparm layers."""

    qp_num: int
    channel: int

    def setup(self):
        self.f1 = Bitparm(self.qp_num, self.channel)
        self.f2 = Bitparm(self.qp_num, self.channel)
        self.f3 = Bitparm(self.qp_num, self.channel)
        self.f4 = Bitparm(self.qp_num, self.channel, final=True)

    def get_logits_cdf(self, x: jnp.ndarray, index: jnp.ndarray) -> jnp.ndarray:
        x = self.f1(x, index)
        x = self.f2(x, index)
        x = self.f3(x, index)
        return self.f4(x, index)

    def get_cdf(self, x: jnp.ndarray, index: jnp.ndarray) -> jnp.ndarray:
        return jax.nn.sigmoid(self.get_logits_cdf(x, index))

    def __call__(self, x: jnp.ndarray, index: jnp.ndarray) -> jnp.ndarray:
        return self.get_cdf(x, index)

    def bits(self, z: jnp.ndarray, index: jnp.ndarray) -> jnp.ndarray:
        """bits(z) = -log2(CDF(z+.5) - CDF(z-.5)) via probs_to_bits."""
        z = z.astype(jnp.float32)
        probs = self.get_cdf(z + 0.5, index) - self.get_cdf(z - 0.5, index)
        return probs_to_bits(probs)


def make_scale_table(scale_min: float = 0.11, scale_max: float = 16.0,
                     levels: int = 128) -> jnp.ndarray:
    """Log-spaced Gaussian scale table (src/models/entropy_models.py:244-246)."""
    return jnp.exp(jnp.linspace(math.log(scale_min), math.log(scale_max), levels))


def build_scale_indexes(scales: jnp.ndarray, scale_min: float = 0.11,
                        scale_max: float = 16.0, levels: int = 128) -> jnp.ndarray:
    """Map scales to log-scale table indexes (src/layers/inference.py:65-84)."""
    log_min = math.log(scale_min)
    log_step = (math.log(scale_max) - log_min) / (levels - 1)
    scales = jnp.clip(scales, scale_min, scale_max)
    idx = (jnp.log(scales) - log_min) / log_step
    return idx.astype(jnp.int32)
