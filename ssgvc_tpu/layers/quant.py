"""Quantizers: straight-through rounding and additive-noise proxy.

TPU-native replacement for the reference's AdaptiveQuant
(src/layers/inference.py:8-27): ``ste`` mode rounds with a straight-through
gradient, ``noise`` mode adds U(-0.5, 0.5) during training. At eval both hard
round. Noise comes from an explicit JAX PRNG key instead of global RNG state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ste_round(x: jnp.ndarray) -> jnp.ndarray:
    """round(x) in the forward pass, identity gradient in the backward pass."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def noise_quant(x: jnp.ndarray, rng: jax.Array | None, train: bool) -> jnp.ndarray:
    """Additive uniform noise U(-0.5, 0.5) during training, hard round at eval."""
    if train:
        if rng is None:
            raise ValueError("noise_quant requires an rng key when train=True")
        noise = jax.random.uniform(rng, x.shape, x.dtype, minval=-0.5, maxval=0.5)
        return x + noise
    return jnp.round(x)
