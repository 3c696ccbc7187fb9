"""Rate-distortion losses, GOP weights, ALM constrained-optimization terms.

Mirrors trainer_seg_video_model.py:883-934 (lambda schedule, ROI-weighted RD
loss) and :655-693 (ALM machinery). Verified semantics note: torch>=2.7
``F.mse_loss(..., weight=w, reduction='mean')`` computes sum(w*se)/sum(w)
(checked empirically against torch 2.13), which is what ``weighted_mse``
implements.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax.numpy as jnp


def compute_lambda(qp, lambda_min: float, lambda_max: float, q_levels: int = 64):
    """Log-interpolated qp -> lambda (trainer_seg_video_model.py:888-891)."""
    qp = jnp.asarray(qp, jnp.float32)
    return jnp.exp(math.log(lambda_min) +
                   qp / (q_levels - 1) * (math.log(lambda_max) - math.log(lambda_min)))


def weighted_mse(pred: jnp.ndarray, target: jnp.ndarray,
                 weight: jnp.ndarray) -> jnp.ndarray:
    """sum(w * (pred-target)^2) / sum(w) — torch weighted-mean semantics."""
    se = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    w = jnp.broadcast_to(weight.astype(jnp.float32), se.shape)
    return jnp.sum(w * se) / jnp.maximum(jnp.sum(w), 1e-12)


class RDLoss(NamedTuple):
    loss: jnp.ndarray
    bpp: jnp.ndarray
    bpp_y: jnp.ndarray
    bpp_z: jnp.ndarray
    mse: jnp.ndarray       # the (possibly ROI-weighted) distortion in the loss
    prev_obj: jnp.ndarray  # unweighted MSE, for logging


def rate_distortion_loss(results: dict, target: jnp.ndarray, qp,
                         w_t, lambda_min: float, lambda_max: float,
                         q_levels: int = 64,
                         mask: Optional[jnp.ndarray] = None,
                         roi_weight: float = 100.0,
                         lambda_normalize: bool = False) -> RDLoss:
    """loss = bpp_y + bpp_z + w_t * lambda(qp) * wMSE(1 + roi_weight*m)
    (trainer_seg_video_model.py:904-934). mask is (B, H, W, 1) binary.

    ``lambda_normalize`` divides the whole loss by lambda(qp):
    mathematically the same per-QP optimum (positive rescaling), but the
    per-sample gradient magnitude no longer spans the 768x lambda range, so
    mixed-QP batches train all rate points instead of effectively only the
    highest-lambda samples. A from-scratch recipe knob — the reference
    finetunes pretrained weights at small lr and never needs it."""
    bpp = jnp.mean(results["bpp"])
    bpp_y = jnp.mean(results["bpp_y"])
    bpp_z = jnp.mean(results["bpp_z"])
    pred = results["dpb"]["frame"]

    plain_mse = jnp.mean((pred.astype(jnp.float32) -
                          target.astype(jnp.float32)) ** 2)
    if mask is None:
        mse = plain_mse
    else:
        m = (mask > 0).astype(jnp.float32)
        w = 1.0 + roi_weight * m
        wmse = weighted_mse(pred, target, w)
        # no masked pixels -> plain MSE, like the reference's m.sum()==0 branch
        mse = jnp.where(jnp.sum(m) > 0, wmse, plain_mse)

    lam = compute_lambda(qp, lambda_min, lambda_max, q_levels)
    loss = bpp_y + bpp_z + w_t * lam * mse
    if lambda_normalize:
        loss = loss / lam
    return RDLoss(loss, bpp, bpp_y, bpp_z, mse, plain_mse)


def roi_mse(pred: jnp.ndarray, target: jnp.ndarray,
            mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Mean MSE over the ROI only (weight=mask semantics,
    trainer_seg_video_model.py:655-660)."""
    se = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    if mask is None:
        return jnp.mean(se)
    m = jnp.broadcast_to((mask > 0).astype(jnp.float32), se.shape)
    masked = jnp.sum(m * se) / jnp.maximum(jnp.sum(m), 1e-12)
    return jnp.where(jnp.sum(m) > 0, masked, jnp.mean(se))


def mse_from_psnr_db(psnr_db, max_val: float = 1.0):
    return (max_val ** 2) / (10.0 ** (jnp.asarray(psnr_db, jnp.float32) / 10.0))


def psnr_from_mse(mse, max_val: float = 1.0):
    return 10.0 * jnp.log10(max_val ** 2 / (jnp.asarray(mse, jnp.float32) + 1e-12))


def alm_deadzone_penalty(g: jnp.ndarray, rho: float, eps: float = 0.0005):
    """Dead-zone quadratic penalty 0.5*rho*relu(g+eps)^2 for the inequality
    g <= 0 (trainer_seg_video_model.py:672-683)."""
    gp = jnp.maximum(jnp.mean(g) + eps, 0.0)
    return 0.5 * rho * gp ** 2


def alm_ineq_term(g: jnp.ndarray, mu: jnp.ndarray, rho: float):
    """Classic AL term (max(0, mu + rho*g)^2 - mu^2) / (2 rho)
    (trainer_seg_video_model.py:663-671)."""
    t = jnp.maximum(mu + rho * jnp.mean(g), 0.0)
    return (t ** 2 - mu ** 2) / (2.0 * rho)


def alm_dual_update(mu: jnp.ndarray, h_accum: jnp.ndarray, h_count: jnp.ndarray,
                    rho: float, mu_max: float = 1e3):
    """mu <- clip([mu + rho*mean(h)]_+, 0, mu_max) and reset accumulators
    (trainer_seg_video_model.py:685-693; mu_max from config.lagr_lambda_max,
    :519)."""
    g_bar = h_accum / jnp.maximum(h_count, 1.0)
    new_mu = jnp.clip(mu + rho * g_bar, 0.0, mu_max)
    keep = h_count > 0
    return (jnp.where(keep, new_mu, mu),
            jnp.where(keep, 0.0, h_accum),
            jnp.where(keep, 0.0, h_count))


def init_psnrm_schedule(path: Optional[str], default_db: float = 35.0):
    """Per-QP PSNRm targets (dB) from a CSV with qp,psnrm_db rows; gaps are
    linearly interpolated (trainer_seg_video_model.py:603-649)."""
    import csv as _csv
    import os

    targets = [float(default_db)] * 64
    if not path or not os.path.exists(path):
        return jnp.asarray(targets, jnp.float32)
    pairs = []
    with open(path) as f:
        for row in _csv.DictReader(f):
            qp = row.get("qp") or row.get("QP") or row.get("q") or row.get("index")
            ps = (row.get("psnrm_db") or row.get("psnr_db") or row.get("PSNRm")
                  or row.get("psnr"))
            if qp is None or ps is None:
                continue
            qp, ps = int(qp), float(ps)
            if 0 <= qp <= 63:
                pairs.append((qp, ps))
    if not pairs:
        return jnp.asarray(targets, jnp.float32)
    pairs.sort()
    xs = [q for q, _ in pairs]
    ys = [p for _, p in pairs]
    import numpy as np
    targets = np.interp(np.arange(64), xs, ys)
    return jnp.asarray(targets, jnp.float32)
