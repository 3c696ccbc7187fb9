"""Evaluation: RD sweeps (estimated + real bitstreams), BD-rate, ROI PSNR.

Replaces the reference's missing report tooling (report_graphs.ipynb is
referenced by its README but absent) and the DCVC-style eval loop:

  * ``evaluate_rd_point`` — roll a GOP at one QP, returning bpp (estimated
    or real coded), PSNR, ROI-PSNR (mask region), MS-SSIM.
  * ``rd_sweep`` — sweep QPs to an RD curve.
  * ``bd_rate`` — Bjøntegaard-delta rate between two RD curves (the metric
    behind the reference's "+1-1.5 dB ROI PSNR at similar BPP" claim).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax.numpy as jnp
import numpy as np

from ..utils.metrics import calc_msssim_rgb, calc_psnr
from ..utils.transforms import ycbcr2rgb_np


def _roi_psnr(ref: np.ndarray, rec: np.ndarray, mask: np.ndarray) -> float:
    m = mask > 0
    if not m.any():
        return calc_psnr(ref, rec)
    m3 = np.broadcast_to(m, ref.shape)
    mse = float(np.mean((ref[m3].astype(np.float64)
                         - rec[m3].astype(np.float64)) ** 2))
    if mse == 0:
        return 99.9
    return float(min(99.9, 10 * np.log10(1.0 / mse)))


def evaluate_gop_estimated(dmci, params_i, dmc, params_p, frames, masks,
                           qp: int, index_map: Sequence[int],
                           qp_shift: Sequence[int]) -> List[Dict]:
    """GOP rollout on the estimated-bpp path (no real coding).

    frames: (T, H, W, 3) numpy YCbCr; masks: (T, H, W, 1).
    Returns per-frame dicts {frame_type, bpp, psnr, roi_psnr, msssim}.
    """
    results = []
    x0 = jnp.asarray(frames[0])[None]
    out = dmci.apply({"params": params_i}, x0, jnp.int32(qp), train=False)
    rec = np.asarray(out["dpb"]["frame"][0])
    results.append(_frame_metrics("I", float(out["bpp"][0]), frames[0], rec,
                                  masks[0]))
    dpb = {"frame": out["dpb"]["frame"],
           "feature": jnp.zeros((1, frames.shape[1] // 8,
                                 frames.shape[2] // 8, dmc.cfg.ch_d),
                                jnp.float32)}
    propagated = dmc.cfg.mask_source == "propagated"
    mask_carry = None
    for t in range(1, frames.shape[0]):
        fa_idx = index_map[t % len(index_map)]
        curr_qp = qp + qp_shift[fa_idx]
        x = jnp.asarray(frames[t])[None]
        # mask_prop semantics: the model's ``mask`` input is the chain CARRY
        # (previous frame's mask) — GT only at the first P-frame; afterwards
        # the decoder-side prediction propagates. Passing the current GT
        # here (the old behavior) silently leaked per-frame segmentation to
        # the eval. Metrics below always score against the GT mask.
        if propagated and mask_carry is not None:
            m = mask_carry
        else:
            m = jnp.asarray(masks[t])[None]
        out = dmc.apply({"params": params_p}, x, jnp.int32(curr_qp), dpb,
                        after_i=(t == 1), mask=m, train=False)
        if propagated:
            mask_carry = (m if t == 1 else out["mask_pred"])
        rec = np.asarray(out["dpb"]["frame"][0])
        results.append(_frame_metrics("P", float(out["bpp"][0]), frames[t],
                                      rec, masks[t]))
        dpb = out["dpb"]
    return results


def make_batched_gop_eval(dmci, dmc, index_map: Sequence[int],
                          qp_shift: Sequence[int], seq_len: int):
    """Build ONE jitted device call that evaluates a whole BATCH of GOPs at
    one QP. :func:`evaluate_gop_estimated` dispatches un-jitted per-frame
    ``apply`` calls — over the tunneled TPU that is 24 host round-trips per
    (clip, QP) and dominated the rd_tpu marathon's wall clock (an eval cost
    ~250-700 s vs ~3 s per 1000 train steps). Batching the clips and
    unrolling the (static) GOP inside one jit brings an eval to one round
    trip per QP.

    Returns ``run(params_i, params_p, frames, masks, qp) -> (recons, bpps)``
    with frames (B,T,H,W,3), masks (B,T,H,W,1), recons (B,T,H,W,3),
    bpps (B,T). Metrics stay on host (identical math to the per-clip path).
    """
    import jax

    index_map = list(index_map)
    qp_shift = list(qp_shift)

    @jax.jit
    def run(params_i, params_p, frames, masks, qp):
        out = dmci.apply({"params": params_i}, frames[:, 0], qp, train=False)
        recons = [out["dpb"]["frame"]]
        bpps = [out["bpp"]]
        ps = dmc.cfg.patch_size
        dpb = {"frame": out["dpb"]["frame"],
               "feature": jnp.zeros(
                   (frames.shape[0], frames.shape[2] // ps,
                    frames.shape[3] // ps, dmc.cfg.ch_d), jnp.float32)}
        propagated = dmc.cfg.mask_source == "propagated"
        mask_carry = None
        for t in range(1, seq_len):
            curr_qp = qp + qp_shift[index_map[t % len(index_map)]]
            # mask_prop: GT mask only at the first P-frame, the decoder-side
            # prediction carries the chain after (same fix as
            # evaluate_gop_estimated — GT per frame would leak segmentation)
            m = (mask_carry if propagated and mask_carry is not None
                 else masks[:, t])
            o = dmc.apply({"params": params_p}, frames[:, t], curr_qp, dpb,
                          after_i=(t == 1), mask=m, train=False)
            if propagated:
                mask_carry = (m if t == 1 else o["mask_pred"])
            recons.append(o["dpb"]["frame"])
            bpps.append(o["bpp"])
            dpb = o["dpb"]
        return jnp.stack(recons, 1), jnp.stack(bpps, 1)

    return run


def evaluate_rd_batched(run_fn, params_i, params_p, clips,
                        qps: Sequence[int],
                        compute_msssim: bool = False) -> Dict:
    """RD curve over ``qps`` from a :func:`make_batched_gop_eval` callable.

    ``clips``: list of (frames (T,H,W,3), masks (T,H,W,1)) numpy pairs (equal
    shapes). Aggregation matches :func:`rd_sweep` over the P-frames of every
    clip; MS-SSIM (host scipy at ~0.5 s/frame on the 1-core host) is opt-in
    so keep-best scoring evals (PSNR+ROI only, rd_keep_best.score_of) skip
    it and only the final artifact curve pays for it.
    """
    frames = np.stack([np.asarray(c[0], np.float32) for c in clips])
    masks = np.stack([np.asarray(c[1], np.float32) for c in clips])
    fr_j = jnp.asarray(frames)
    ms_j = jnp.asarray(masks)
    curve = {"qp": [], "bpp": [], "psnr": [], "roi_psnr": [], "msssim": []}
    for qp in qps:
        recons, bpps = run_fn(params_i, params_p, fr_j, ms_j, jnp.int32(qp))
        recons = np.asarray(recons, np.float32)
        bpps = np.asarray(bpps, np.float64)
        rows = []
        for b in range(frames.shape[0]):
            for t in range(1, frames.shape[1]):
                rows.append(_frame_metrics(
                    "P", float(bpps[b, t]), frames[b, t], recons[b, t],
                    masks[b, t]) if compute_msssim else
                    _frame_metrics_fast(float(bpps[b, t]), frames[b, t],
                                        recons[b, t], masks[b, t]))
        curve["qp"].append(int(qp))
        curve["bpp"].append(float(np.mean([r["bpp"] for r in rows])))
        curve["psnr"].append(float(np.mean([r["psnr"] for r in rows])))
        curve["roi_psnr"].append(
            float(np.mean([r["roi_psnr"] for r in rows])))
        ms = [r["msssim"] for r in rows if r.get("msssim") is not None]
        curve["msssim"].append(float(np.mean(ms)) if ms else None)
    return curve


def _frame_metrics_fast(bpp: float, ref_ycbcr, rec_ycbcr, mask) -> Dict:
    """PSNR/ROI-PSNR only — the subset rd_keep_best.score_of consumes."""
    ref_rgb = ycbcr2rgb_np(np.asarray(ref_ycbcr))
    rec_rgb = ycbcr2rgb_np(np.asarray(rec_ycbcr))
    return {"bpp": float(bpp),
            "psnr": calc_psnr(ref_rgb, rec_rgb),
            "roi_psnr": _roi_psnr(ref_rgb, rec_rgb, np.asarray(mask)),
            "msssim": None}


def latent_liveness(dmc, params_p, clip_a, clip_b,
                    qps: Sequence[int] = (8, 32, 56)) -> Dict:
    """Collapse tripwire (docs/FROM_SCRATCH_TRAINING.md): per QP, the
    fraction of quantized latent positions != 0 (``alive_y``/``alive_z``)
    and the PSNR between recons of two DIFFERENT clips
    (``recon_cross_clip_psnr`` — HIGH means the decoder emits a
    near-constant image, i.e. the from-scratch collapse).

    clip_a/clip_b: (frames, masks) with frames (T,H,W,3) numpy YCbCr;
    frame 1 is coded conditioned on frame 0 as the DPB reference.
    """
    def run(frames, masks, qp):
        ps = dmc.cfg.patch_size
        x = jnp.asarray(frames[1])[None]
        m = jnp.asarray(masks[1])[None]
        dpb = {"frame": jnp.asarray(frames[0])[None],
               "feature": jnp.zeros(
                   (1, frames.shape[1] // ps, frames.shape[2] // ps,
                    dmc.cfg.ch_d), jnp.float32)}
        out, inter = dmc.apply(
            {"params": params_p}, x, jnp.int32(qp), dpb, after_i=True,
            mask=m, train=False, capture_intermediates=True,
            mutable=["intermediates"])
        inter = inter["intermediates"]
        y = np.asarray(inter["encoder"]["__call__"][0], np.float32)
        z = (np.asarray(inter["hyper_encoder"]["__call__"][0], np.float32)
             * np.asarray(params_p["z_gain"], np.float32))
        return (np.asarray(out["dpb"]["frame"][0]),
                float(np.mean(np.round(y) != 0)),
                float(np.mean(np.round(z) != 0)))

    report = {}
    for qp in qps:
        ra, alive_y, alive_z = run(*clip_a, qp)
        rb, _, _ = run(*clip_b, qp)
        mse = float(np.mean((ra.astype(np.float64)
                             - rb.astype(np.float64)) ** 2))
        report[str(qp)] = {
            "alive_y": alive_y, "alive_z": alive_z,
            "recon_cross_clip_psnr": float(min(
                99.9, 10 * np.log10(1.0 / max(mse, 1e-10)))),
        }
    return report


def liveness_collapsed(report: Dict, cross_clip_db: float = 25.0) -> bool:
    """Go/no-go verdict over a :func:`latent_liveness` report: True when the
    decoder is input-independent (recons of DIFFERENT clips more similar
    than ``cross_clip_db`` at every QP) or the quantized latent is all-zero
    at every QP. Long-run harnesses abort a cycle on True instead of
    burning the full budget (round-3 verdict item #2)."""
    cross = [r["recon_cross_clip_psnr"] for r in report.values()]
    alive = [r["alive_y"] for r in report.values()]
    return min(cross) > cross_clip_db or max(alive) == 0.0


def evaluate_gop_coded(codec, frames, masks, qp: int,
                       index_map: Sequence[int],
                       qp_shift: Sequence[int]) -> List[Dict]:
    """GOP rollout through the REAL rANS bitstream path (coding/codec.py).
    bpp comes from actual stream bytes; decoder output is verified bit-exact
    against the encoder-side reconstruction."""
    h, w = frames.shape[1:3]
    pixel_num = h * w
    results = []

    enc = codec.dmci_compress(jnp.asarray(frames[0])[None], qp)
    dec = codec.dmci_decompress(enc["bit_stream"], h, w, qp)
    np.testing.assert_array_equal(np.asarray(enc["x_hat"]),
                                  np.asarray(dec["x_hat"]))
    rec = np.asarray(dec["x_hat"][0])
    results.append(_frame_metrics(
        "I", len(enc["bit_stream"]) * 8 / pixel_num, frames[0], rec, masks[0],
        enc_time=codec.enc_time, dec_time=codec.dec_time))

    feat0 = jnp.zeros((1, h // 8, w // 8, codec.dmc.cfg.ch_d), jnp.float32)
    dpb_e = {"frame": enc["x_hat"], "feature": feat0}
    dpb_d = {"frame": dec["x_hat"], "feature": feat0}
    # mask_prop: both sides carry the propagated mask chain (GT only at the
    # first P-frame), mirroring the codec tests and the estimated-path eval
    propagated = codec.dmc.cfg.mask_source == "propagated"
    m_e = m_d = None
    for t in range(1, frames.shape[0]):
        fa_idx = index_map[t % len(index_map)]
        curr_qp = qp + qp_shift[fa_idx]
        x = jnp.asarray(frames[t])[None]
        m = jnp.asarray(masks[t])[None]
        out = codec.dmc_compress(x, curr_qp, dpb_e, after_i=(t == 1),
                                 mask=(m_e if propagated and m_e is not None
                                       else m))
        dec = codec.dmc_decompress(out["bit_stream"], h, w, curr_qp, dpb_d,
                                   after_i=(t == 1),
                                   mask=(m_d if propagated and m_d is not None
                                         else m) if propagated else None)
        if propagated:
            m_e = out["mask_out"]
            m_d = dec.get("mask_out", m_e)
        rec = np.asarray(dec["x_hat"][0])
        results.append(_frame_metrics(
            "P", len(out["bit_stream"]) * 8 / pixel_num, frames[t], rec,
            masks[t], enc_time=codec.enc_time, dec_time=codec.dec_time))
        dpb_e, dpb_d = out["dpb"], dec["dpb"]
    return results


def _frame_metrics(frame_type: str, bpp: float, ref_ycbcr, rec_ycbcr, mask,
                   enc_time: float = 0.0, dec_time: float = 0.0) -> Dict:
    ref_rgb = ycbcr2rgb_np(np.asarray(ref_ycbcr))
    rec_rgb = ycbcr2rgb_np(np.asarray(rec_ycbcr))
    return {
        "frame_type": frame_type,
        "bpp": float(bpp),
        "psnr": calc_psnr(ref_rgb, rec_rgb),
        "roi_psnr": _roi_psnr(ref_rgb, rec_rgb, np.asarray(mask)),
        # calc_msssim falls back to 4-level HM weights below 176px and
        # rejects (<88px) like the reference asserts; emit None rather than a
        # fake number when it genuinely can't be computed.
        "msssim": calc_msssim_rgb(ref_rgb, rec_rgb)
        if min(ref_rgb.shape[:2]) >= 88 else None,
        "enc_time": enc_time,
        "dec_time": dec_time,
    }


def rd_sweep(eval_fn, qps: Sequence[int]) -> Dict[str, List[float]]:
    """eval_fn(qp) -> per-frame results; aggregates to an RD curve."""
    curve = {"qp": [], "bpp": [], "psnr": [], "roi_psnr": [], "msssim": []}
    for qp in qps:
        results = eval_fn(qp)
        p_frames = [r for r in results if r["frame_type"] == "P"] or results
        curve["qp"].append(qp)
        curve["bpp"].append(float(np.mean([r["bpp"] for r in p_frames])))
        curve["psnr"].append(float(np.mean([r["psnr"] for r in p_frames])))
        curve["roi_psnr"].append(
            float(np.mean([r["roi_psnr"] for r in p_frames])))
        ms = [r["msssim"] for r in p_frames if r["msssim"] is not None]
        curve["msssim"].append(float(np.mean(ms)) if ms else None)
    return curve


def bd_rate(rate_anchor, psnr_anchor, rate_test, psnr_test) -> float:
    """Bjøntegaard delta rate (%) between two RD curves (piecewise-cubic in
    log-rate / PSNR, integrated over the overlapping PSNR range)."""
    lr_a = np.log(np.asarray(rate_anchor, np.float64))
    lr_t = np.log(np.asarray(rate_test, np.float64))
    p_a = np.asarray(psnr_anchor, np.float64)
    p_t = np.asarray(psnr_test, np.float64)

    order_a = np.argsort(p_a)
    order_t = np.argsort(p_t)
    p_a, lr_a = p_a[order_a], lr_a[order_a]
    p_t, lr_t = p_t[order_t], lr_t[order_t]

    lo = max(p_a.min(), p_t.min())
    hi = min(p_a.max(), p_t.max())
    if hi <= lo:
        return float("nan")

    fit_a = np.polyfit(p_a, lr_a, min(3, len(p_a) - 1))
    fit_t = np.polyfit(p_t, lr_t, min(3, len(p_t) - 1))
    int_a = np.polyint(fit_a)
    int_t = np.polyint(fit_t)
    avg_a = (np.polyval(int_a, hi) - np.polyval(int_a, lo)) / (hi - lo)
    avg_t = (np.polyval(int_t, hi) - np.polyval(int_t, lo)) / (hi - lo)
    return float((np.exp(avg_t - avg_a) - 1) * 100.0)


def bd_psnr(rate_anchor, psnr_anchor, rate_test, psnr_test) -> float:
    """Bjøntegaard delta PSNR (dB): mean quality gain of the test curve over
    the anchor AT MATCHED RATE, integrated over the overlapping log-rate
    range. This is the metric of the reference's headline claim — "+1-1.5 dB
    ROI PSNR over baseline at similar BPP" (reference README.md:7)."""
    lr_a = np.log(np.asarray(rate_anchor, np.float64))
    lr_t = np.log(np.asarray(rate_test, np.float64))
    p_a = np.asarray(psnr_anchor, np.float64)
    p_t = np.asarray(psnr_test, np.float64)

    order_a = np.argsort(lr_a)
    order_t = np.argsort(lr_t)
    lr_a, p_a = lr_a[order_a], p_a[order_a]
    lr_t, p_t = lr_t[order_t], p_t[order_t]

    lo = max(lr_a.min(), lr_t.min())
    hi = min(lr_a.max(), lr_t.max())
    if hi <= lo:
        return float("nan")

    fit_a = np.polyfit(lr_a, p_a, min(3, len(lr_a) - 1))
    fit_t = np.polyfit(lr_t, p_t, min(3, len(lr_t) - 1))
    int_a = np.polyint(fit_a)
    int_t = np.polyint(fit_t)
    avg_a = (np.polyval(int_a, hi) - np.polyval(int_a, lo)) / (hi - lo)
    avg_t = (np.polyval(int_t, hi) - np.polyval(int_t, lo)) / (hi - lo)
    return float(avg_t - avg_a)
