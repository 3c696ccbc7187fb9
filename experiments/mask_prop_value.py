#!/usr/bin/env python
"""Quantify mask_prop's trade: ROI quality lost from predicted masks vs the
mask-transmission bits a transmit-masks design would pay.

The reference's mask_prop exists so P-frames need NO per-frame segmentation
at the encoder and no mask side-channel
(src/refactor/mask_prop_seg_video_model.py:365-368) — but it never
quantifies the trade. This script does, on the roi_subset eval distribution
(where the mask carries pixel-uninferable class-subset information):

  * ``fast``      — GT mask every P-frame (the transmit/segment-always
                    anchor, same FiLM conditioning site as mask_prop)
  * ``mask_prop`` — GT mask only at the first P-frame, decoder-side
                    propagation after (evaluate_gop_estimated carries the
                    chain)
  * mask side-channel cost — zlib bits of the packed binary GT mask per
    P-frame (the bound a transmit-masks design pays; PNG-style predictive
    packing would land between this and raw)

    python experiments/mask_prop_value.py [--qps 8,20,32,44,56]

Writes artifacts/mask_prop_value.json.
"""

import json
import os
import sys
import zlib

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import rd_full


def mask_side_channel_bpp(masks: np.ndarray) -> float:
    """zlib bits-per-source-pixel of the packed binary masks (T,H,W,1)."""
    bits = 0
    for t in range(masks.shape[0]):
        bits += len(zlib.compress(
            np.packbits(masks[t].astype(np.uint8)).tobytes(), 9)) * 8
    return bits / (masks.shape[0] * masks.shape[1] * masks.shape[2])


def main():
    argv = sys.argv[1:]
    qps = ([int(q) for q in argv[argv.index("--qps") + 1].split(",")]
           if "--qps" in argv else [8, 20, 32, 44, 56])
    profile = (argv[argv.index("--profile") + 1]
               if "--profile" in argv else "mid")
    crop = int(argv[argv.index("--crop") + 1]) if "--crop" in argv else 192

    rd_full.set_profile(profile)
    rd_full.RECON_SKIP = True
    rd_full.CKPT_EXTRA = (argv[argv.index("--ckpt-extra") + 1]
                          if "--ckpt-extra" in argv else "-roisub")

    from ssgvc_tpu.config import DMCConfig, DMCIConfig, TrainConfig
    from ssgvc_tpu.data.dataset import SyntheticClipDataset
    from ssgvc_tpu.training.evaluate import evaluate_gop_estimated, rd_sweep
    from ssgvc_tpu.training.trainer import Trainer
    from ssgvc_tpu.utils.checkpoint import restore_checkpoint

    # same pinned roisub eval distribution as rd_tpu (seed 777 + 900+i)
    eval_ds = SyntheticClipDataset(num_clips=8, seq_len=4, crop_size=crop,
                                   seed=777, texture="smooth",
                                   roi_subset=True)
    clips = [eval_ds.__getitem__(i, rng=np.random.default_rng(900 + i))
             for i in range(6)]

    cfg = TrainConfig()
    index_map = list(cfg.compression.index_map)
    results = {"profile": profile, "crop": crop, "qps": qps,
               "mask_side_channel_bpp_zlib": float(np.mean(
                   [mask_side_channel_bpp(np.asarray(m)) for _, m in clips])),
               "variants": {}}

    for variant in ("fast", "mask_prop"):
        path = rd_full.ckpt_path(variant)
        if not os.path.isdir(path):
            print(f"[skip] no checkpoint at {path}")
            continue
        ck = restore_checkpoint(path)
        tr = Trainer(TrainConfig(dmc_variant=variant), total_iters=10,
                     dmc_cfg=DMCConfig.variant(
                         variant, recon_residual=True, **rd_full.MID_DMC),
                     dmci_cfg=DMCIConfig(**rd_full.MID_DMCI))
        qp_shift = list(tr.dmc_cfg.qp_shift)

        def eval_qp(qp, _tr=tr, _ck=ck):
            out = []
            for frames, masks in clips:
                out.extend(evaluate_gop_estimated(
                    _tr.dmci, _ck["params_i"], _tr.dmc, _ck["params_p"],
                    frames, masks, qp, index_map, qp_shift))
            return out

        curve = rd_sweep(eval_qp, qps=qps)
        results["variants"][variant] = curve
        print(f"[{variant}] bpp={[round(b, 4) for b in curve['bpp']]}")
        print(f"[{variant}] roi={[round(p, 2) for p in curve['roi_psnr']]}",
              flush=True)

    if {"fast", "mask_prop"} <= set(results["variants"]):
        f, m = results["variants"]["fast"], results["variants"]["mask_prop"]
        results["summary"] = {
            # what predicted masks cost in ROI quality, per QP
            "roi_psnr_delta_fast_minus_maskprop": [
                round(a - b, 3) for a, b in zip(f["roi_psnr"],
                                                m["roi_psnr"])],
            # what a transmit-masks design would add to fast's rate
            "fast_bpp_with_mask_channel": [
                round(b + results["mask_side_channel_bpp_zlib"], 4)
                for b in f["bpp"]],
            "note": ("mask_prop's value = fast's ROI quality minus the "
                     "delta, at a rate that never pays the mask channel "
                     "and an encoder that segments only the first P-frame"),
        }

    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/mask_prop_value.json", "w") as fjs:
        json.dump(results, fjs, indent=2)
    print("wrote artifacts/mask_prop_value.json")


if __name__ == "__main__":
    main()
