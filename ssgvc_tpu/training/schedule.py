"""LR schedule: linear warmup + cosine decay to min_lr.

Matches the reference's manual per-step schedule
(trainer_seg_video_model.py:1317-1323; duplicate at
src/training/training_utils.py:52-60).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def warmup_cosine(base_lr: float, min_lr: float, warmup_iters: int,
                  total_iters: int):
    """Returns an optax-style schedule fn step -> lr."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * step / jnp.maximum(warmup_iters, 1)
        decay_ratio = (step - warmup_iters) / max(1, total_iters - warmup_iters)
        decay_ratio = jnp.clip(decay_ratio, 0.0, 1.0)
        coeff = 0.5 * (1.0 + jnp.cos(math.pi * decay_ratio))
        cos = min_lr + coeff * (base_lr - min_lr)
        if warmup_iters > 0:
            return jnp.where(step < warmup_iters, warm, cos)
        return cos

    return schedule
