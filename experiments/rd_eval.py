#!/usr/bin/env python
"""Standalone RD evaluation from rd_full checkpoints.

rd_full.py saves artifacts/rd_ckpt_{performance,plain} (params_p + params_i).
This script rebuilds the models and sweeps RD curves at one or more eval
resolutions — training used 64px crops, so curves at 64px measure the
trained operating point while 192px (MS-SSIM-capable) probes generalization.

    python experiments/rd_eval.py [--profile tiny] [--crops 64,192]

Writes artifacts/rd_eval.json.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

import rd_full
from rd_full import EVAL_QPS, MID_DMC, MID_DMCI, TINY_DMC, TINY_DMCI


def _trivial_bounds(clips):
    """Zero-rate reference points on the SAME eval clips (context for the
    RD tables; docs/FROM_SCRATCH_TRAINING.md): copy-previous-frame PSNR over
    the P positions, and the per-clip-mean (DC) PSNR. A codec P-frame is
    only interesting above copy-prev; rate only trades visibly once the
    model clears these."""
    def psnr(mse):
        return float(10.0 * np.log10(1.0 / max(mse, 1e-12)))

    copy_mse, dc_mse = [], []
    for frames, _ in clips:
        f = np.asarray(frames, np.float32)
        copy_mse.extend(((f[1:] - f[:-1]) ** 2).reshape(len(f) - 1, -1)
                        .mean(axis=1).tolist())
        dc = f.mean(axis=(0, 1, 2), keepdims=True)
        dc_mse.append(float(((f - dc) ** 2).mean()))
    return {"copy_prev_psnr_db": round(psnr(float(np.mean(copy_mse))), 2),
            "dc_psnr_db": round(psnr(float(np.mean(dc_mse))), 2)}


def main():
    argv = sys.argv[1:]
    profile = (argv[argv.index("--profile") + 1]
               if "--profile" in argv else "tiny")
    tiny = profile == "tiny"
    crops = ([int(c) for c in argv[argv.index("--crops") + 1].split(",")]
             if "--crops" in argv else [64, 192])
    # full-range sweep: the trained model is variable-rate over qp 0..63
    # (lambda spans 50 -> 38400, a 768x distortion-weight range); the
    # training EVAL_QPS subset [8..56] covers only ~130x of it
    qps = ([int(q) for q in argv[argv.index("--qps") + 1].split(",")]
           if "--qps" in argv else EVAL_QPS)
    # --ckpt-extra "-roisub" evaluates a namespaced checkpoint family (the
    # r05 marathon trains all four variants under -roisub). MUST be set
    # before the recon-skip autodetection below — it probes ckpt_path(),
    # which bakes the namespace into the tag.
    if "--ckpt-extra" in argv:
        rd_full.CKPT_EXTRA = argv[argv.index("--ckpt-extra") + 1]
    # shares rd_full's dims + checkpoint-path tag (tiny/mid/half); default
    # to the recon-skip recipe when its checkpoints exist (the round-4
    # marathon), falling back to the plain tag (round-3 runs)
    rd_full.set_profile(profile)
    dmc_kw, dmci_kw = rd_full.MID_DMC, rd_full.MID_DMCI
    rd_full.RECON_SKIP = True
    any_skip = any(os.path.isdir(rd_full.ckpt_path(v))
                   for v in ("performance", "plain"))
    recon_skip = ("--recon-skip" in argv
                  or ("--no-recon-skip" not in argv and any_skip))
    rd_full.RECON_SKIP = recon_skip

    from ssgvc_tpu.config import DMCConfig, DMCIConfig, TrainConfig
    from ssgvc_tpu.data.dataset import SyntheticClipDataset
    from ssgvc_tpu.training.evaluate import (
        bd_psnr,
        bd_rate,
        evaluate_gop_estimated,
        rd_sweep,
    )
    from ssgvc_tpu.training.trainer import Trainer
    from ssgvc_tpu.utils.checkpoint import restore_checkpoint

    # --roi-subset switches the eval distribution to class-filter masks to
    # match the -roisub checkpoints; --variants widens the sweep beyond
    # performance,plain
    roi_subset = "--roi-subset" in argv
    variants = (argv[argv.index("--variants") + 1].split(",")
                if "--variants" in argv else ["performance", "plain"])

    results = {"profile": profile, "crops": {},
               "ckpt_extra": rd_full.CKPT_EXTRA, "roi_subset": roi_subset}
    cfg = TrainConfig()
    for crop in crops:
        # default matches the training distribution of every current
        # checkpoint (rd_full/rd_continue train on texture="smooth")
        eval_ds = SyntheticClipDataset(num_clips=8, seq_len=4,
                                       crop_size=crop, seed=777,
                                       texture="noise" if "--noise" in argv
                                       else "smooth",
                                       roi_subset=roi_subset)
        clips = [eval_ds.__getitem__(i, rng=np.random.default_rng(900 + i))
                 for i in range(6)]
        per_variant = {"trivial_bounds": _trivial_bounds(clips)}
        for variant in variants:
            path = rd_full.ckpt_path(variant)
            if not os.path.isdir(path):
                print(f"[skip] no checkpoint at {path}")
                continue
            ck = restore_checkpoint(path)
            tr = Trainer(TrainConfig(dmc_variant=variant), total_iters=10,
                         dmc_cfg=DMCConfig.variant(
                             variant, recon_residual=recon_skip, **dmc_kw),
                         dmci_cfg=DMCIConfig(**dmci_kw))
            index_map = list(cfg.compression.index_map)
            qp_shift = list(tr.dmc_cfg.qp_shift)

            def eval_qp(qp, _tr=tr, _ck=ck):
                out = []
                for frames, masks in clips:
                    out.extend(evaluate_gop_estimated(
                        _tr.dmci, _ck["params_i"], _tr.dmc, _ck["params_p"],
                        frames, masks, qp, index_map, qp_shift))
                return out

            curve = rd_sweep(eval_qp, qps=qps)

            # collapse tripwire (docs/FROM_SCRATCH_TRAINING.md)
            from ssgvc_tpu.training.evaluate import latent_liveness
            curve["liveness"] = latent_liveness(
                tr.dmc, ck["params_p"], clips[0], clips[1])

            # estimate-vs-real bpp gap per QP (VERDICT r2: track the gap so
            # shrinkage with training is demonstrable, not asserted). Only at
            # the smallest crop — the codec jits per resolution and the gap
            # is resolution-independent to first order.
            if crop == min(crops) and "--no-coded" not in argv:
                from ssgvc_tpu.coding.codec import VideoCodec
                from ssgvc_tpu.training.evaluate import evaluate_gop_coded
                codec = VideoCodec(tr.dmci, ck["params_i"], tr.dmc,
                                   ck["params_p"])
                gaps = {}
                for qi, qp in enumerate(qps):
                    frames, masks = clips[0]
                    coded = evaluate_gop_coded(codec, frames, masks, qp=qp,
                                               index_map=index_map,
                                               qp_shift=qp_shift)
                    real = float(np.mean([r["bpp"] for r in coded
                                          if r["frame_type"] == "P"]))
                    # est must be the SAME clip the coded path ran on —
                    # curve["bpp"] averages all 6 clips, and per-clip rate
                    # variance (clip 0 runs ~50% above the mean on these
                    # eval seeds) once masqueraded as a 56-106% coder gap
                    est_clip = evaluate_gop_estimated(
                        tr.dmci, ck["params_i"], tr.dmc, ck["params_p"],
                        frames, masks, qp, index_map, qp_shift)
                    est = float(np.mean([r["bpp"] for r in est_clip
                                         if r["frame_type"] == "P"]))
                    gaps[qp] = {"estimated": est, "real": real,
                                "gap_pct": round(100.0 * (real - est)
                                                 / max(est, 1e-9), 1)}
                curve["est_vs_real_bpp"] = gaps
                print(f"[{crop}px {variant}] est-vs-real gap%: "
                      f"{[gaps[q]['gap_pct'] for q in qps]}")

            per_variant[variant] = curve
            print(f"[{crop}px {variant}] bpp="
                  f"{[round(b, 4) for b in curve['bpp']]}")
            print(f"[{crop}px {variant}] psnr="
                  f"{[round(p, 2) for p in curve['psnr']]}")
            print(f"[{crop}px {variant}] roi="
                  f"{[round(p, 2) for p in curve['roi_psnr']]}", flush=True)
        if {"performance", "plain"} <= set(per_variant):
            perf, plain = per_variant["performance"], per_variant["plain"]
            per_variant["bd_rate_roi_psnr_pct"] = bd_rate(
                plain["bpp"], plain["roi_psnr"], perf["bpp"], perf["roi_psnr"])
            per_variant["bd_rate_psnr_pct"] = bd_rate(
                plain["bpp"], plain["psnr"], perf["bpp"], perf["psnr"])
            # the reference's headline metric: ROI dB gained at matched rate
            per_variant["bd_psnr_roi_db"] = bd_psnr(
                plain["bpp"], plain["roi_psnr"], perf["bpp"], perf["roi_psnr"])
            print(f"[{crop}px] BD-rate ROI {per_variant['bd_rate_roi_psnr_pct']:+.1f}%"
                  f"  global {per_variant['bd_rate_psnr_pct']:+.1f}%"
                  f"  ROI BD-PSNR {per_variant['bd_psnr_roi_db']:+.2f} dB")
        results["crops"][str(crop)] = per_variant

    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/rd_eval.json", "w") as f:
        json.dump(results, f, indent=2)
    print("wrote artifacts/rd_eval.json")


if __name__ == "__main__":
    main()
