#!/usr/bin/env python
"""Full-scale RD experiment: mid-profile codec, long training budget,
QP-monotone RD curves, matched-rate ROI comparison (BD-rate), MS-SSIM at
192 px, and real-bitstream verification.

Addresses the round-1 verdict's "RD evidence is toy-scale": variable-rate
tables get a real training budget, the mask-SFT ('performance') variant is
compared against 'plain' at MATCHED RATE via BD-rate on ROI PSNR (the
reference's headline claim is +1-1.5 dB ROI PSNR at similar BPP,
/root/reference/README.md:7), and coded streams are checked against the
differentiable bpp estimates.

    python experiments/rd_full.py [steps] [--budget-min 90]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from ssgvc_tpu.config import MODEL_PROFILES

EVAL_QPS = [8, 20, 32, 44, 56]
LNORM = False  # --lnorm: lambda-normalized RD loss (see loss.py)
RECON_SKIP = False  # --recon-skip: recon_residual from-scratch training aid
PROFILE = "mid"
MID_DMC = MODEL_PROFILES["rd-mid"]["dmc"]
MID_DMCI = MODEL_PROFILES["rd-mid"]["dmci"]
# CPU-runnable fallback profile (the 1-core host can train this at ~2-4
# steps/s; RD separation and matched-rate ROI comparisons still demonstrate)
TINY_DMC = MODEL_PROFILES["rd-tiny"]["dmc"]
TINY_DMCI = MODEL_PROFILES["rd-tiny"]["dmci"]


CKPT_EXTRA = ""  # extra namespace tag (e.g. "-roisub" for class-filter masks)

#: CLI profile name -> MODEL_PROFILES key for the RD harness size tiers
RD_PROFILES = {"tiny": "rd-tiny", "mid": "rd-mid", "half": "rd-half"}


def set_profile(profile: str) -> None:
    """One place every RD entry point (rd_tpu/rd_eval/rd_continue) resolves
    --profile: sets the model dims AND the checkpoint-path tag together so a
    profile switch can never restore shape-mismatched params."""
    global MID_DMC, MID_DMCI, PROFILE
    if profile not in RD_PROFILES:
        raise SystemExit(f"--profile must be one of {sorted(RD_PROFILES)}, "
                         f"got {profile}")
    p = MODEL_PROFILES[RD_PROFILES[profile]]
    MID_DMC, MID_DMCI = p["dmc"], p["dmci"]
    PROFILE = profile


def ckpt_path(variant: str) -> str:
    """Checkpoint dir encodes profile + recipe so a --profile or --recon-skip
    switch can never restore shape- or semantics-mismatched params
    (round-3 advisor finding)."""
    tag = f"{PROFILE}-skip" if RECON_SKIP else PROFILE
    return f"artifacts/rd_ckpt_{variant}_{tag}{CKPT_EXTRA}"


def sample_qp(host_rng) -> int:
    """55% near the eval QPs (so their table rows get dense updates), 25%
    uniform (so every row trains), 20% at the ladder extremes ([0,8) and
    [56,64)) — mirrors data.device_synth.sample_qp; see its docstring for
    the r04 ladder-compression rationale."""
    u = host_rng.uniform()
    if u < 0.55:
        return int(np.clip(host_rng.choice(EVAL_QPS) + host_rng.integers(-3, 4),
                           0, 63))
    if u < 0.80:
        return int(host_rng.integers(0, 64))
    e = int(host_rng.integers(0, 8))
    return e if host_rng.uniform() < 0.5 else 63 - e


def dmci_ckpt_path() -> str:
    # DMCI has no recon_residual (intra), so only the profile tags it
    # (CKPT_EXTRA applies: roi_subset changes the painted-content
    # distribution the intra model sees only marginally, but namespacing
    # keeps the headline anchor immutable during side experiments)
    return f"artifacts/rd_ckpt_dmci_{PROFILE}{CKPT_EXTRA}"


def pretrain_dmci(steps: int, dm, budget_s: float, seed: int = 17,
                  reuse: bool = False):
    import optax
    from ssgvc_tpu.config import DMCIConfig
    from ssgvc_tpu.models.dmci import DMCI
    from ssgvc_tpu.training.loss import compute_lambda, psnr_from_mse

    model = DMCI(DMCIConfig(**MID_DMCI))
    if reuse and os.path.isdir(dmci_ckpt_path()):
        from ssgvc_tpu.utils.checkpoint import restore_checkpoint
        ck = restore_checkpoint(dmci_ckpt_path())
        print(f"[dmci] reused pretrained params from {dmci_ckpt_path()}")
        return model, ck["params_i"]
    it = dm.train_iter()
    first = next(it)
    x0 = jnp.asarray(first["frames"][:, 0])
    rng = jax.random.PRNGKey(seed)
    params = model.init({"params": rng, "noise": rng}, x0, jnp.int32(0),
                        train=False)["params"]
    from ssgvc_tpu.training.calibrate import calibrate_dmci
    params = calibrate_dmci(model, params, x0)
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adamw(1e-3))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, qp, rng):
        def loss_fn(p):
            out = model.apply({"params": p}, x, qp, train=True,
                              rngs={"noise": rng})
            mse = jnp.mean((out["dpb"]["frame"].astype(jnp.float32) - x) ** 2)
            lam = compute_lambda(qp, 50.0, 38400.0)
            loss = jnp.mean(out["bpp"]) + lam * mse
            if LNORM:
                loss = loss / lam
            return loss, (mse, jnp.mean(out["bpp"]))

        grads, (mse, bpp) = jax.grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, mse, bpp

    host = np.random.default_rng(seed)
    t0 = time.perf_counter()
    for i in range(steps):
        batch = next(it)
        t = int(host.integers(0, batch["frames"].shape[1]))
        x = jnp.asarray(batch["frames"][:, t])
        qp = jnp.int32(sample_qp(host))
        rng, sub = jax.random.split(rng)
        params, opt_state, mse, bpp = step(params, opt_state, x, qp, sub)
        if i % 250 == 0:
            print(f"[dmci] step {i}: psnr {float(psnr_from_mse(mse)):.2f} "
                  f"bpp {float(bpp):.4f} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
        if time.perf_counter() - t0 > budget_s:
            print(f"[dmci] budget hit at step {i}")
            break
    from ssgvc_tpu.utils.checkpoint import save_checkpoint
    os.makedirs("artifacts", exist_ok=True)
    save_checkpoint(dmci_ckpt_path(), {"params_i": jax.device_get(params)})
    print(f"[dmci] saved pretrain checkpoint to {dmci_ckpt_path()}")
    return model, params


GATE_STEP = 1000          # run the collapse gate once, this many steps in
GATE_CROSS_CLIP_DB = 25.0  # recons of different clips more similar than this
#                            at EVERY QP == input-independent decoder


def liveness_gate(trainer, state, clip_a, clip_b, variant, step_no):
    """Go/no-go collapse gate (round-3 verdict item #2): abort a long cycle
    early instead of burning the full budget on a collapsed run. Returns
    (ok, report)."""
    from ssgvc_tpu.training.evaluate import (latent_liveness,
                                             liveness_collapsed)
    report = latent_liveness(trainer.dmc, state.params_p, clip_a, clip_b)
    cross = [r["recon_cross_clip_psnr"] for r in report.values()]
    alive = [r["alive_y"] for r in report.values()]
    collapsed = liveness_collapsed(report, GATE_CROSS_CLIP_DB)
    status = "COLLAPSED" if collapsed else "alive"
    print(f"[gate][{variant}] step {step_no}: {status} "
          f"cross_clip_psnr={[round(c, 1) for c in cross]} "
          f"alive_y={[round(a, 3) for a in alive]}", flush=True)
    return not collapsed, report


def train_variant(variant: str, steps: int, dm, budget_s: float,
                  seed: int = 0, params_i=None, gate_clips=None):
    from ssgvc_tpu.config import DMCConfig, DMCIConfig, TrainConfig
    from ssgvc_tpu.training.trainer import Trainer

    cfg = TrainConfig(dmc_variant=variant, accumulation_steps=1)
    cfg.precision = "fp32"
    cfg.optimizer.base_lr = 7e-4
    cfg.optimizer.min_lr = 5e-5
    cfg.roi_weight = 100.0
    cfg.lambda_normalize = LNORM
    trainer = Trainer(
        cfg, total_iters=steps,
        dmc_cfg=DMCConfig.variant(variant, recon_residual=RECON_SKIP,
                                  **MID_DMC),
        dmci_cfg=DMCIConfig(**MID_DMCI),
    )
    it = dm.train_iter()
    first = next(it)
    batch0 = {k: jnp.asarray(v) for k, v in first.items()}
    params_p = None
    path = ckpt_path(variant)
    if os.path.isdir(path):
        # resume an interrupted run's periodic checkpoint (params only;
        # optimizer state restarts, which the cosine schedule tolerates)
        from ssgvc_tpu.utils.checkpoint import restore_checkpoint
        ck = restore_checkpoint(path)
        params_i, params_p = ck["params_i"], ck["params_p"]
        print(f"[{variant}] resuming params from {path}")
    state = trainer.init_state(jax.random.PRNGKey(seed), batch0,
                               params_i=params_i, params_p=params_p)
    step = trainer.jit_train_step()
    rng = jax.random.PRNGKey(seed + 1)
    host_rng = np.random.default_rng(seed + 2)
    from ssgvc_tpu.utils.checkpoint import save_checkpoint
    t0 = time.perf_counter()
    last_save = t0
    gate_pending = gate_clips is not None and params_p is None
    for i in range(steps):
        batch = {k: jnp.asarray(v) for k, v in next(it).items()}
        qp = jnp.int32(sample_qp(host_rng))
        rng, sub = jax.random.split(rng)
        state, aux = step(state, batch, qp, sub)
        if i % 250 == 0:
            print(f"[{variant}] step {i}: loss {float(aux['loss']):.3f} "
                  f"bpp {float(aux['bpp']):.4f} psnr {float(aux['psnr']):.2f}"
                  f" ({time.perf_counter() - t0:.0f}s)", flush=True)
        if gate_pending and i >= GATE_STEP:
            gate_pending = False
            ok, _ = liveness_gate(trainer, jax.device_get(state),
                                  gate_clips[0], gate_clips[1], variant, i)
            if not ok:
                print(f"[gate][{variant}] aborting cycle at step {i} — "
                      f"collapsed run, checkpoint NOT saved", flush=True)
                return trainer, jax.device_get(state), False
        # periodic checkpoint: an interrupted run loses <=10 min, and
        # rd_continue can always pick up from ckpt_path(variant)
        if time.perf_counter() - last_save > 600.0:
            st = jax.device_get(state)
            save_checkpoint(path,
                            {"params_p": st.params_p, "params_i": st.params_i})
            last_save = time.perf_counter()
        if time.perf_counter() - t0 > budget_s:
            print(f"[{variant}] budget hit at step {i}")
            break
    if gate_pending:
        # budget expired before GATE_STEP: gate before the caller saves
        ok, _ = liveness_gate(trainer, jax.device_get(state),
                              gate_clips[0], gate_clips[1], variant, -1)
        if not ok:
            print(f"[gate][{variant}] end-of-budget gate failed — "
                  f"checkpoint NOT saved", flush=True)
            return trainer, jax.device_get(state), False
    print(f"[{variant}] trained in {time.perf_counter() - t0:.1f}s")
    return trainer, jax.device_get(state), True


def main():
    global MID_DMC, MID_DMCI, LNORM, RECON_SKIP, PROFILE
    argv = sys.argv[1:]
    LNORM = "--lnorm" in argv
    RECON_SKIP = "--recon-skip" in argv
    steps = int(argv[0]) if argv and not argv[0].startswith("-") else 12000
    budget_min = (float(argv[argv.index("--budget-min") + 1])
                  if "--budget-min" in argv else 120.0)
    tiny = "--profile" in argv and argv[argv.index("--profile") + 1] == "tiny"
    if tiny:
        MID_DMC, MID_DMCI = TINY_DMC, TINY_DMCI
        PROFILE = "tiny"
    # budget split: ~20% DMCI, ~40% each DMC variant
    total_s = budget_min * 60.0

    from ssgvc_tpu.data.dataset import ClipDataModule, SyntheticClipDataset
    from ssgvc_tpu.training.evaluate import (
        bd_psnr,
        bd_rate,
        evaluate_gop_coded,
        evaluate_gop_estimated,
        rd_sweep,
    )
    from ssgvc_tpu.coding.codec import VideoCodec

    crop, bs = (64, 4) if tiny else (128, 8)
    train_ds = SyntheticClipDataset(num_clips=512, seq_len=4, crop_size=crop,
                                    seed=3, texture="smooth")
    dm = ClipDataModule(train_ds, batch_size=bs, split=(0.95, 0.05, 0.0),
                        seed=3)
    # eval clips: 192 px so MS-SSIM is computed (>=176 px window rule)
    eval_ds = SyntheticClipDataset(num_clips=8, seq_len=4, crop_size=192,
                                   seed=777, texture="smooth")
    eval_clips = [eval_ds.__getitem__(i, rng=np.random.default_rng(900 + i))
                  for i in range(6)]

    # gate clips at the train crop (cheap: 2 clips x 3 QPs forward passes)
    gate_ds = SyntheticClipDataset(num_clips=4, seq_len=2, crop_size=crop,
                                   seed=555, texture="smooth")
    gate_clips = [gate_ds.__getitem__(i, rng=np.random.default_rng(600 + i))
                  for i in range(2)]

    results = {"steps": steps, "budget_min": budget_min,
               "lambda_normalize": LNORM, "recon_residual": RECON_SKIP,
               "profile": PROFILE,
               "model": {"dmc": MID_DMC, "dmci": MID_DMCI}, "variants": {}}

    def _save_partial():
        os.makedirs("artifacts", exist_ok=True)
        with open("artifacts/rd_full.json", "w") as f:
            json.dump(results, f, indent=2)

    _, params_i = pretrain_dmci(max(1500, steps // 4), dm, total_s * 0.2,
                                reuse="--reuse-dmci" in argv)

    trained = {}
    for variant in ("performance", "plain"):
        trainer, state, ok = train_variant(variant, steps, dm, total_s * 0.4,
                                           params_i=params_i,
                                           gate_clips=gate_clips)
        if not ok:
            results["variants"][variant] = {"gate": "aborted_collapse"}
            _save_partial()
            continue
        index_map = list(trainer.cfg.compression.index_map)
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
        trained[variant] = (trainer, state)
        from ssgvc_tpu.utils.checkpoint import save_checkpoint
        save_checkpoint(ckpt_path(variant),
                        {"params_p": state.params_p,
                         "params_i": state.params_i})
        _save_partial()  # partial artifact survives an interrupted run
        print(f"[{variant}] RD: bpp={[round(b,4) for b in curve['bpp']]}")
        print(f"[{variant}]     psnr={[round(p,2) for p in curve['psnr']]}")
        print(f"[{variant}]     roi_psnr="
              f"{[round(p,2) for p in curve['roi_psnr']]}")
        print(f"[{variant}]     msssim="
              f"{[round(m, 4) if m is not None else None for m in curve['msssim']]}",
              flush=True)

    if len(trained) < 2:
        print("[bd] skipped: a variant was gate-aborted")
        _save_partial()
        return

    # matched-rate comparison: BD-rate of performance vs plain on ROI PSNR
    perf = results["variants"]["performance"]["estimated_rd"]
    plain = results["variants"]["plain"]["estimated_rd"]
    bd_roi = bd_rate(plain["bpp"], plain["roi_psnr"],
                     perf["bpp"], perf["roi_psnr"])
    bd_global = bd_rate(plain["bpp"], plain["psnr"], perf["bpp"], perf["psnr"])
    results["bd_rate_roi_psnr_pct"] = bd_roi
    results["bd_rate_psnr_pct"] = bd_global
    # the reference's headline metric: ROI dB gained at matched rate
    bd_roi_db = bd_psnr(plain["bpp"], plain["roi_psnr"],
                        perf["bpp"], perf["roi_psnr"])
    results["bd_psnr_roi_db"] = bd_roi_db
    print(f"[bd] ROI-PSNR BD-rate (performance vs plain): {bd_roi:+.1f}% "
          f"(negative = rate saved at equal ROI quality)")
    print(f"[bd] global-PSNR BD-rate: {bd_global:+.1f}%")
    print(f"[bd] ROI BD-PSNR (performance vs plain at matched rate): "
          f"{bd_roi_db:+.2f} dB (reference claim: +1-1.5 dB)")

    # QP monotonicity check: lambda(qp) interpolates 50 -> 38400 with QP, so
    # HIGHER qp = heavier distortion weight = HIGHER rate; bpp must rise
    for v, c in results["variants"].items():
        bpps = c["estimated_rd"]["bpp"]
        mono = all(bpps[i] < bpps[i + 1] for i in range(len(bpps) - 1))
        results["variants"][v]["bpp_monotone_increasing_in_qp"] = mono
        print(f"[mono] {v}: bpp monotone (rising) over QP: {mono} {bpps}")

    # real coded path: est vs real bpp at three QPs
    trainer, state = trained["performance"]
    codec = VideoCodec(trainer.dmci, state.params_i, trainer.dmc,
                       state.params_p)
    est_vs_real = {}
    for qi, qp in enumerate((20, 32, 44)):
        frames, masks = eval_clips[0]
        coded = evaluate_gop_coded(
            codec, frames, masks, qp=qp,
            index_map=list(trainer.cfg.compression.index_map),
            qp_shift=list(trainer.dmc_cfg.qp_shift))
        real_bpp = float(np.mean([r["bpp"] for r in coded
                                  if r["frame_type"] == "P"]))
        est_bpp = perf["bpp"][EVAL_QPS.index(qp)] if qp in EVAL_QPS else None
        est_vs_real[qp] = {"real": real_bpp, "estimated": est_bpp}
        print(f"[coded] qp={qp}: real {real_bpp:.4f} bpp"
              + (f" vs est {est_bpp:.4f}" if est_bpp else ""))
    results["estimate_vs_real_bpp"] = est_vs_real

    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/rd_full.json", "w") as f:
        json.dump(results, f, indent=2)
    print("wrote artifacts/rd_full.json")


if __name__ == "__main__":
    main()
