"""Reusable optimizer construction (the src/training/ library equivalents).

Rebuild of src/training/optimizers.py:9-58 (create_optimizers main/aux split)
and training_utils.py helpers, optax-style. The full backbone/probe/aux
3-way split used by the video trainer lives in trainer.py; this module is the
generic 2-way (main / bit-estimator-aux) split plus single-group helpers for
custom training loops.
"""

from __future__ import annotations

from typing import Callable, Optional

import optax

from .schedule import warmup_cosine


def make_optimizer(name: str, lr, weight_decay: float = 0.01):
    """'adamw' | 'adam' | 'lion' with torch-compatible semantics."""
    name = name.lower()
    if name == "adamw":
        return optax.adamw(lr, weight_decay=weight_decay)
    if name == "adam":
        # torch Adam applies weight decay as L2-in-gradient
        return optax.chain(optax.add_decayed_weights(weight_decay),
                           optax.adam(lr))
    if name == "lion":
        return optax.lion(lr, weight_decay=weight_decay)
    raise ValueError(f"unknown optimizer {name!r}")


def aux_label(path) -> str:
    """'aux' for bit-estimator params, 'main' otherwise
    (src/training/optimizers.py:19-31)."""
    return ("aux" if "bit_estimator" in "/".join(map(str, path)) else "main")


def create_optimizers(optimizer_type: str = "adamw", base_lr: float = 1e-4,
                      min_lr: float = 1e-5, aux_lr: float = 5e-4,
                      weight_decay: float = 0.01, warmup_iters: int = 0,
                      total_iters: int = 10000, grad_clip: float = 5.0,
                      label_fn: Optional[Callable] = None):
    """Main/aux optax transform with warmup-cosine on main and fixed aux lr,
    global-norm clipping in front."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    sched = warmup_cosine(base_lr, min_lr, warmup_iters, total_iters)
    label = label_fn or aux_label

    def labels(params):
        flat = flatten_dict(params)
        return unflatten_dict({k: label(k) for k in flat})

    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.multi_transform(
            {"main": make_optimizer(optimizer_type, sched, weight_decay),
             "aux": make_optimizer(optimizer_type, aux_lr, weight_decay)},
            labels))
