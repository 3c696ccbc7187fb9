#!/usr/bin/env python
"""MASK_TRAIN phase for a trained mask_prop checkpoint.

The reference trains mask_prop in a dedicated phase where the loss is the
BCE between MaskPredictor logits and the GT mask and ONLY mask_predictor
params update (trainer_seg_video_model.py MASK_TRAIN; the `loss =+ bce`
typo is implemented here as the intended `loss += bce` — see
training/trainer.py). The RD marathons train with the plain RD loss, which
reaches the predictor only indirectly (through the FiLM conditioning), so
its mask accuracy is untrained. This phase fixes that post hoc:

    python experiments/mask_train_phase.py [steps] [--profile mid]
        [--ckpt-extra -roisub] [--crop 64] [--batch 8] [--lr 1e-3]

Loads rd_full.ckpt_path('mask_prop'), runs BCE-only steps on fresh
roi_subset synthetic clips, reports mask IoU before/after on held-out
clips, and saves the checkpoint back in place (a .premask backup is kept).
"""

import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import rd_full


def mask_iou(model, params_p, clips) -> float:
    """Mean IoU of the predicted next-frame mask vs GT over held-out clips
    (prediction from the PREVIOUS frame's GT mask, the chain's first hop)."""
    ious = []
    for frames, masks in clips:
        dpb = {"frame": jnp.asarray(frames[0])[None],
               "feature": jnp.zeros((1, frames.shape[1] // 8,
                                     frames.shape[2] // 8,
                                     model.cfg.ch_d), jnp.float32)}
        for t in range(1, frames.shape[0]):
            out = model.apply({"params": params_p},
                              jnp.asarray(frames[t])[None], jnp.int32(32),
                              dpb, after_i=False,
                              mask=jnp.asarray(masks[t - 1])[None],
                              train=False)
            pred = np.asarray(out["mask_pred"][0]) > 0.0  # logits
            gt = np.asarray(masks[t]) > 0.5
            inter = np.logical_and(pred, gt).sum()
            union = np.logical_or(pred, gt).sum()
            if union:
                ious.append(inter / union)
            dpb = jax.tree_util.tree_map(lambda x: x, out["dpb"])
    return float(np.mean(ious)) if ious else float("nan")


def main():
    argv = sys.argv[1:]
    steps = int(argv[0]) if argv and not argv[0].startswith("-") else 2000

    def arg(name, default, cast=str):
        return cast(argv[argv.index(name) + 1]) if name in argv else default

    profile = arg("--profile", "mid")
    rd_full.set_profile(profile)
    rd_full.RECON_SKIP = "--no-recon-skip" not in argv
    rd_full.CKPT_EXTRA = arg("--ckpt-extra", "-roisub")
    crop = arg("--crop", 64, int)
    bs = arg("--batch", 8, int)
    lr = arg("--lr", 1e-3, float)
    budget_s = arg("--budget-min", 20.0, float) * 60.0

    from ssgvc_tpu.config import DMCConfig, DMCIConfig, TrainConfig
    from ssgvc_tpu.data.dataset import SyntheticClipDataset
    from ssgvc_tpu.training.trainer import Trainer
    from ssgvc_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    path = rd_full.ckpt_path("mask_prop")
    if not os.path.isdir(path):
        raise SystemExit(f"no mask_prop checkpoint at {path}")
    ck = restore_checkpoint(path)

    cfg = TrainConfig(dmc_variant="mask_prop", mask_train=True,
                      accumulation_steps=1)
    cfg.optimizer.base_lr = lr
    tr = Trainer(cfg, total_iters=steps,
                 dmc_cfg=DMCConfig.variant(
                     "mask_prop", recon_residual=rd_full.RECON_SKIP,
                     **rd_full.MID_DMC),
                 dmci_cfg=DMCIConfig(**rd_full.MID_DMCI))

    eval_ds = SyntheticClipDataset(num_clips=4, seq_len=4, crop_size=crop,
                                   seed=777, texture="smooth",
                                   roi_subset=True)
    eval_clips = [eval_ds.__getitem__(i, rng=np.random.default_rng(900 + i))
                  for i in range(3)]
    iou_before = mask_iou(tr.dmc, ck["params_p"], eval_clips)
    print(f"[mask_train] IoU before: {iou_before:.3f}", flush=True)

    state = tr.init_state(jax.random.PRNGKey(0),
                          params_p=ck["params_p"], params_i=ck["params_i"])
    step_fn = tr.jit_train_step()
    host = np.random.default_rng(7)
    ds = SyntheticClipDataset(num_clips=64, seq_len=4, crop_size=crop,
                              seed=1234, texture="smooth", roi_subset=True)
    t0 = time.perf_counter()
    i = 0
    while i < steps and time.perf_counter() - t0 < budget_s:
        idx = host.integers(0, 64, bs)
        fr, mk = [], []
        for j in idx:
            f, m = ds.__getitem__(int(j), rng=np.random.default_rng(
                int(host.integers(0, 2**31))))
            fr.append(f)
            mk.append(m)
        batch = {"frames": jnp.asarray(np.stack(fr)),
                 "masks": jnp.asarray(np.stack(mk))}
        qp = jnp.int32(int(host.integers(0, 64)))
        state, aux = step_fn(state, batch, qp,
                             jax.random.PRNGKey(int(host.integers(0, 2**31))))
        if i % 100 == 0:
            print(f"[mask_train] step {i}: loss {float(aux['loss']):.4f} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
        i += 1

    iou_after = mask_iou(tr.dmc, state.params_p, eval_clips)
    print(f"[mask_train] IoU after {i} steps: {iou_after:.3f}", flush=True)

    backup = path + ".premask"
    if not os.path.isdir(backup):
        shutil.copytree(path, backup)
    save_checkpoint(path, {"params_p": jax.device_get(state.params_p),
                           "params_i": ck["params_i"]})
    with open("artifacts/mask_train_phase.json", "w") as f:
        json.dump({"steps": i, "iou_before": iou_before,
                   "iou_after": iou_after, "crop": crop,
                   "profile": profile}, f, indent=2)
    print(f"[mask_train] saved to {path} (backup at {backup}); "
          "artifacts/mask_train_phase.json written")


if __name__ == "__main__":
    main()
