#!/usr/bin/env python
"""Continue RD training from saved rd_full checkpoints.

Loads artifacts/rd_ckpt_{variant}, trains each variant for another budget
slice on the SAME smooth-texture data distribution, saves the checkpoints
back, and re-runs the RD sweep + BD/monotonicity summary. Lets long RD
budgets accumulate across sessions instead of restarting from scratch.

    python experiments/rd_continue.py [steps] [--budget-min 120] [--profile tiny]
"""

import json
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import rd_full
from rd_full import (
    EVAL_QPS,
    MID_DMC,
    MID_DMCI,
    TINY_DMC,
    TINY_DMCI,
    liveness_gate,
    sample_qp,
)


def main():
    argv = sys.argv[1:]
    steps = int(argv[0]) if argv and not argv[0].startswith("-") else 30000
    budget_min = (float(argv[argv.index("--budget-min") + 1])
                  if "--budget-min" in argv else 120.0)
    # vary per marathon cycle so continuation cycles see fresh data/QP orders
    cycle_seed = (int(argv[argv.index("--seed") + 1])
                  if "--seed" in argv else 0)
    profile = (argv[argv.index("--profile") + 1]
               if "--profile" in argv else "tiny")
    tiny = profile == "tiny"
    # shares rd_full's dims + checkpoint-path tag (tiny/mid/half)
    rd_full.set_profile(profile)
    dmc_kw, dmci_kw = rd_full.MID_DMC, rd_full.MID_DMCI
    recon_skip = "--recon-skip" in argv
    rd_full.RECON_SKIP = recon_skip

    import time

    from ssgvc_tpu.config import DMCConfig, DMCIConfig, TrainConfig
    from ssgvc_tpu.data.dataset import ClipDataModule, SyntheticClipDataset
    from ssgvc_tpu.training.evaluate import (
        bd_psnr,
        bd_rate,
        evaluate_gop_estimated,
        rd_sweep,
    )
    from ssgvc_tpu.training.trainer import Trainer
    from ssgvc_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    crop, bs = (64, 4) if tiny else (128, 8)
    # --data-seed regenerates the procedural TRAIN clips. The default (3)
    # is the fresh run's set; passing a new seed per cycle gives the model
    # effectively infinite data. Motivation: by marathon cycle 4 train PSNR
    # (23.6) ran ~2 dB above held-out eval (21.4) and further same-data
    # cycles REGRESSED eval (rd_trajectory.json) — classic overfit to the
    # fixed 487-clip set. Eval clips stay pinned (seed=777) either way.
    data_seed = (int(argv[argv.index("--data-seed") + 1])
                 if "--data-seed" in argv else 3)
    train_ds = SyntheticClipDataset(num_clips=512, seq_len=4, crop_size=crop,
                                    seed=data_seed, texture="smooth")
    dm = ClipDataModule(train_ds, batch_size=bs, split=(0.95, 0.05, 0.0),
                        seed=3)
    eval_ds = SyntheticClipDataset(num_clips=8, seq_len=4, crop_size=192,
                                   seed=777, texture="smooth")
    eval_clips = [eval_ds.__getitem__(i, rng=np.random.default_rng(900 + i))
                  for i in range(6)]

    # gate clips at the train crop (go/no-go collapse gate, round-3 verdict
    # item #2 — a warm restart at LR 7e-4 CAN re-collapse a healthy model,
    # so every continuation cycle is gated too, not just the fresh run)
    gate_ds = SyntheticClipDataset(num_clips=4, seq_len=2, crop_size=crop,
                                   seed=555, texture="smooth")
    gate_clips = [gate_ds.__getitem__(i, rng=np.random.default_rng(600 + i))
                  for i in range(2)]

    results = {"continued_steps": steps, "budget_min": budget_min,
               "variants": {}}
    per_variant_s = budget_min * 60.0 / 2

    for variant in ("performance", "plain"):
        path = rd_full.ckpt_path(variant)
        if not os.path.isdir(path):
            print(f"[skip] no checkpoint at {path}")
            continue
        ck = restore_checkpoint(path)
        # keep the pre-cycle params: a diverging warm restart overwrites
        # `path` every <=10 min, so `.prev` is the recovery copy
        prev = path + ".prev"
        if os.path.isdir(prev):
            shutil.rmtree(prev)
        shutil.copytree(path, prev)
        cfg = TrainConfig(dmc_variant=variant, accumulation_steps=1)
        cfg.precision = "fp32"
        # Default 7e-4 = the fresh run's LR (SGDR warm restart). Held-out
        # eval peaked at cycle 3 and regressed under further 7e-4 restarts
        # (rd_trajectory.json), so late cycles pass --base-lr ~2e-4 for an
        # annealed POLISH from the peak pair instead of another restart.
        cfg.optimizer.base_lr = (
            float(argv[argv.index("--base-lr") + 1])
            if "--base-lr" in argv else 7e-4)
        cfg.optimizer.min_lr = 5e-5
        cfg.roi_weight = 100.0
        cfg.lambda_normalize = "--lnorm" in argv
        # SGDR semantics need the cosine to ANNEAL within the cycle: the
        # marathon passes steps=200000 but a 50-min slice on this host runs
        # ~6k steps, so without this cap every cycle trains at ~base_lr
        # throughout and the cycle-end eval lands at a high-LR (noisy)
        # point. --sched-steps sizes the cosine to the realistic step
        # count; past it the schedule clamps at min_lr (warmup_cosine).
        sched_steps = (int(argv[argv.index("--sched-steps") + 1])
                       if "--sched-steps" in argv else 7000)
        trainer = Trainer(cfg, total_iters=min(steps, sched_steps),
                          dmc_cfg=DMCConfig.variant(
                              variant, recon_residual=recon_skip, **dmc_kw),
                          dmci_cfg=DMCIConfig(**dmci_kw))
        it = dm.train_iter()
        first = next(it)
        batch0 = {k: jnp.asarray(v) for k, v in first.items()}
        state = trainer.init_state(jax.random.PRNGKey(1), batch0,
                                   params_i=ck["params_i"],
                                   params_p=ck["params_p"])
        step_fn = trainer.jit_train_step()
        rng = jax.random.PRNGKey(100 + 7919 * cycle_seed)
        host_rng = np.random.default_rng(101 + 7919 * cycle_seed)
        t0 = time.perf_counter()
        last_save = t0
        gate_pending = True
        aborted = False
        for i in range(steps):
            batch = {k: jnp.asarray(v) for k, v in next(it).items()}
            qp = jnp.int32(sample_qp(host_rng))
            rng, sub = jax.random.split(rng)
            state, aux = step_fn(state, batch, qp, sub)
            if i % 250 == 0:
                print(f"[{variant}+] step {i}: loss {float(aux['loss']):.3f} "
                      f"bpp {float(aux['bpp']):.4f} "
                      f"psnr {float(aux['psnr']):.2f} "
                      f"({time.perf_counter() - t0:.0f}s)", flush=True)
            # read through rd_full so harness overrides reach this module
            if gate_pending and i >= rd_full.GATE_STEP:
                gate_pending = False
                ok, _ = liveness_gate(trainer, jax.device_get(state),
                                      gate_clips[0], gate_clips[1],
                                      variant, i)
                if not ok:
                    # restore the pre-cycle copy: the warm restart collapsed
                    # the model, so the cycle's periodic saves are poison
                    shutil.rmtree(path)
                    shutil.copytree(prev, path)
                    print(f"[gate][{variant}+] cycle aborted at step {i}; "
                          f"checkpoint restored from {prev}", flush=True)
                    results["variants"][variant] = {
                        "gate": "aborted_collapse_restored_prev"}
                    os.makedirs("artifacts", exist_ok=True)
                    with open("artifacts/rd_continued.json", "w") as f:
                        json.dump(results, f, indent=2)
                    aborted = True
                    break
            if time.perf_counter() - last_save > 600.0:
                st = jax.device_get(state)
                save_checkpoint(path, {"params_p": st.params_p,
                                       "params_i": st.params_i})
                last_save = time.perf_counter()
            if time.perf_counter() - t0 > per_variant_s:
                print(f"[{variant}+] budget hit at step {i}")
                break
        if aborted:
            continue
        if gate_pending:
            # budget expired before GATE_STEP: gate NOW, never save ungated
            # (a collapsed save would poison .prev on the next cycle)
            ok, _ = liveness_gate(trainer, jax.device_get(state),
                                  gate_clips[0], gate_clips[1], variant, -1)
            if not ok:
                shutil.rmtree(path)
                shutil.copytree(prev, path)
                print(f"[gate][{variant}+] end-of-budget gate failed; "
                      f"checkpoint restored from {prev}", flush=True)
                results["variants"][variant] = {
                    "gate": "aborted_collapse_restored_prev"}
                with open("artifacts/rd_continued.json", "w") as f:
                    json.dump(results, f, indent=2)
                continue
        state = jax.device_get(state)
        save_checkpoint(path, {"params_p": state.params_p,
                               "params_i": state.params_i})

        index_map = list(cfg.compression.index_map)
        qp_shift = list(trainer.dmc_cfg.qp_shift)

        def eval_qp(qp, _tr=trainer, _st=state):
            out = []
            for frames, masks in eval_clips:
                out.extend(evaluate_gop_estimated(
                    _tr.dmci, _st.params_i, _tr.dmc, _st.params_p,
                    frames, masks, qp, index_map, qp_shift))
            return out

        curve = rd_sweep(eval_qp, qps=EVAL_QPS)
        results["variants"][variant] = {"estimated_rd": curve}
        # collapse tripwire: alive latent fractions + cross-clip recon PSNR
        # (high == constant decoder output; docs/FROM_SCRATCH_TRAINING.md)
        from ssgvc_tpu.training.evaluate import latent_liveness
        results["variants"][variant]["liveness"] = latent_liveness(
            trainer.dmc, state.params_p, eval_clips[0], eval_clips[1])
        print(f"[{variant}+] liveness="
              f"{results['variants'][variant]['liveness']}")
        print(f"[{variant}+] bpp={[round(b, 4) for b in curve['bpp']]}")
        print(f"[{variant}+] psnr={[round(p, 2) for p in curve['psnr']]}")
        print(f"[{variant}+] roi={[round(p, 2) for p in curve['roi_psnr']]}",
              flush=True)
        os.makedirs("artifacts", exist_ok=True)
        with open("artifacts/rd_continued.json", "w") as f:
            json.dump(results, f, indent=2)

    ok_variants = {v for v, c in results["variants"].items()
                   if "estimated_rd" in c}
    if {"performance", "plain"} <= ok_variants:
        perf = results["variants"]["performance"]["estimated_rd"]
        plain = results["variants"]["plain"]["estimated_rd"]
        results["bd_rate_roi_psnr_pct"] = bd_rate(
            plain["bpp"], plain["roi_psnr"], perf["bpp"], perf["roi_psnr"])
        results["bd_psnr_roi_db"] = bd_psnr(
            plain["bpp"], plain["roi_psnr"], perf["bpp"], perf["roi_psnr"])
        results["bd_rate_psnr_pct"] = bd_rate(
            plain["bpp"], plain["psnr"], perf["bpp"], perf["psnr"])
        results["bd_psnr_db"] = bd_psnr(
            plain["bpp"], plain["psnr"], perf["bpp"], perf["psnr"])
        for v, c in results["variants"].items():
            bpps = c["estimated_rd"]["bpp"]
            c["bpp_monotone_increasing_in_qp"] = all(
                bpps[i] < bpps[i + 1] for i in range(len(bpps) - 1))
        with open("artifacts/rd_continued.json", "w") as f:
            json.dump(results, f, indent=2)
    print("wrote artifacts/rd_continued.json")


if __name__ == "__main__":
    main()
