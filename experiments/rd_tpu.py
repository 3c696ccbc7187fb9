#!/usr/bin/env python
"""RD training ON the TPU: on-device data + scanned mega-steps.

Rounds 1-3 ran the RD recipe (experiments/rd_full.py) on the 1-core host CPU
at ~2-4 optimizer steps/s — never enough compute to reach the quality regime
where rate-distortion actually trades (round-3 verdict #1). The tunneled TPU
runs the same step in ~10 ms, but pays a fixed host round-trip per dispatched
call, so the host-side `for step in range(...)` loop would still cap at a few
steps/s. This runner removes the host from the loop entirely:

  * batches are generated ON the chip (data.device_synth.synth_batch — same
    smooth-texture distribution as SyntheticClipDataset, verified by
    tests/test_device_synth.py), so no input transfer ever happens;
  * one jitted mega-step `lax.scan`s K full optimizer steps (fresh batch +
    fresh QP per inner step) and returns only scalar telemetry means — ONE
    tunnel round-trip per K steps.

Recipe parity with rd_full.py (same profiles, LR/schedule, ROI weight,
pretrain->variant order, liveness gate, pinned 192px eval set seed=777,
keep-best scoring from rd_keep_best.score_of). Checkpoints land in
rd_full.ckpt_path(variant) so rd_continue/rd_eval/rd_report all pick them up.

    python experiments/rd_tpu.py --budget-min 70 [--profile tiny] [--k 100]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import rd_full
from rd_full import EVAL_QPS, GATE_STEP, liveness_gate
from rd_keep_best import score_of

from ssgvc_tpu.data.device_synth import sample_qp as sample_qp_dev
from ssgvc_tpu.data.device_synth import synth_batch as _synth_batch

# --roi-subset: class-filter masks (only a subset of painted objects enters
# the mask — ssgvc_tpu/data/device_synth.py::_gen_clip). Module-global so
# every training/eval call site in this file samples one distribution.
ROI_SUBSET = False


def synth_batch(key, **kw):
    return _synth_batch(key, roi_subset=ROI_SUBSET, **kw)


def _tpu_lock():
    """Same exclusive-client discipline as bench.py: two concurrent axon
    clients wedge the tunnel (round-2 postmortem)."""
    import fcntl

    if os.environ.get("SSGVC_TPU_LOCK_HELD"):
        return None
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        # scrubbed-env CPU run: never contacts the relay, no lock needed
        return None
    f = open("/tmp/ssgvc_tpu_client.lock", "w")
    try:
        fcntl.flock(f, fcntl.LOCK_EX | fcntl.LOCK_NB)
    except OSError:
        f.close()
        raise SystemExit("another TPU client holds the lock; refusing")
    return f


def make_dmci_megastep(model, tx, k: int, batch: int, size: int,
                       lnorm: bool):
    """K intra-model optimizer steps per device call (rd_full.pretrain_dmci
    inner step, with the batch generated on device)."""
    import optax
    from ssgvc_tpu.training.loss import compute_lambda

    def one(carry, key):
        params, opt_state = carry
        kd, kq, kn = jax.random.split(key, 3)
        x = synth_batch(kd, batch=batch, size=size, seq_len=1)["frames"][:, 0]
        qp = sample_qp_dev(kq)

        def loss_fn(p):
            out = model.apply({"params": p}, x, qp, train=True,
                              rngs={"noise": kn})
            mse = jnp.mean((out["dpb"]["frame"].astype(jnp.float32) - x) ** 2)
            lam = compute_lambda(qp, 50.0, 38400.0)
            loss = jnp.mean(out["bpp"]) + lam * mse
            if lnorm:
                loss = loss / lam
            return loss, (mse, jnp.mean(out["bpp"]))

        grads, (mse, bpp) = jax.grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), (mse, bpp)

    @jax.jit
    def mega(params, opt_state, key):
        keys = jax.random.split(key, k)
        (params, opt_state), (mses, bpps) = jax.lax.scan(
            one, (params, opt_state), keys)
        return params, opt_state, mses.mean(), bpps.mean()

    return mega


def make_dmc_megastep(trainer, k: int, batch: int, size: int, seq_len: int):
    """K full GOP train steps per device call: fresh on-device clip batch and
    fresh QP per inner step (distribution parity with rd_full.sample_qp)."""

    def one(state, key):
        kd, kq, kt = jax.random.split(key, 3)
        b = synth_batch(kd, batch=batch, size=size, seq_len=seq_len)
        qp = sample_qp_dev(kq)
        state, aux = trainer.train_step(state, b, qp, kt)
        return state, (aux["loss"], aux["bpp"], aux["psnr"])

    @jax.jit
    def mega(state, key):
        keys = jax.random.split(key, k)
        state, (losses, bpps, psnrs) = jax.lax.scan(one, state, keys)
        return state, (losses.mean(), bpps.mean(), psnrs.mean())

    return mega


def pretrain_dmci_tpu(steps: int, k: int, batch: int, size: int,
                      budget_s: float, lnorm: bool, seed: int = 17):
    import optax
    from ssgvc_tpu.config import DMCIConfig
    from ssgvc_tpu.models.dmci import DMCI
    from ssgvc_tpu.training.calibrate import calibrate_dmci
    from ssgvc_tpu.training.loss import psnr_from_mse
    from ssgvc_tpu.utils.checkpoint import save_checkpoint

    model = DMCI(DMCIConfig(**rd_full.MID_DMCI))
    resume_params = None
    if os.path.isdir(rd_full.dmci_ckpt_path()):
        from ssgvc_tpu.utils.checkpoint import restore_checkpoint
        ck = restore_checkpoint(rd_full.dmci_ckpt_path())
        if "--reuse-dmci" in sys.argv:
            print(f"[dmci] reused pretrained params from "
                  f"{rd_full.dmci_ckpt_path()}", flush=True)
            return model, ck["params_i"]
        # resume-and-continue: skip the init lottery, train further from the
        # saved anchor (crop changes are fine — the model is fully conv)
        resume_params = ck["params_i"]
        print(f"[dmci] resuming pretrain from {rd_full.dmci_ckpt_path()}",
              flush=True)
    # cosine-decayed LR: a flat 1e-3 at bs=32 diverged catastrophically at
    # ~9.5k steps (26.6 dB -> 5.8 dB black-output collapse, 2026-08-19 run)
    peak_lr = 1e-3
    if "--dmci-lr" in sys.argv:
        peak_lr = float(sys.argv[sys.argv.index("--dmci-lr") + 1])
    sched = optax.cosine_decay_schedule(peak_lr, max(steps, 1), alpha=0.05)
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adamw(sched))
    mega = make_dmci_megastep(model, tx, k, batch, size, lnorm)

    t0 = time.perf_counter()
    if resume_params is not None:
        rng = jax.random.PRNGKey(seed + 31)
        params = resume_params
        opt_state = tx.init(params)
        i = 0
    else:
        # The intra model has its own init lottery (no copy-prev warm start
        # exists for an I-model): one long-run landed flat at 5.8 dB for 20k
        # steps while the healthy case clears 20 dB within 1k. Probe each
        # init for ~1k steps and re-roll below 12 dB.
        probe = max(k, 1000 // k * k)
        for attempt in range(6):
            rng = jax.random.PRNGKey(seed + 1000 * attempt)
            x0 = synth_batch(rng, batch=batch, size=size,
                             seq_len=1)["frames"][:, 0]
            params = model.init({"params": rng, "noise": rng}, x0,
                                jnp.int32(0), train=False)["params"]
            params = calibrate_dmci(model, params, x0)
            opt_state = tx.init(params)
            i = 0
            mse = None
            while i < probe and time.perf_counter() - t0 < budget_s:
                rng, sub = jax.random.split(rng)
                params, opt_state, mse, bpp = mega(params, opt_state, sub)
                i += k
            p = float(psnr_from_mse(mse)) if mse is not None else 0.0
            if p > 12.0:
                print(f"[dmci] init attempt {attempt}: alive "
                      f"({p:.2f} dB @ step {i})", flush=True)
                break
            print(f"[dmci] init attempt {attempt}: collapsed "
                  f"({p:.2f} dB @ step {i}) — re-rolling", flush=True)
    # keep-best + divergence stop: even a probe-alive run can explode later
    # (26.6 dB -> black output between steps 9k and 10k); the anchor only
    # needs to be good, not last-step
    best_psnr, best_params = -1.0, jax.device_get(params)
    while i < steps and time.perf_counter() - t0 < budget_s:
        rng, sub = jax.random.split(rng)
        params, opt_state, mse, bpp = mega(params, opt_state, sub)
        i += k
        p = float(psnr_from_mse(mse))
        if p > best_psnr:
            best_psnr, best_params = p, jax.device_get(params)
        if i % 1000 < k:
            print(f"[dmci] step {i}: psnr {p:.2f} "
                  f"bpp {float(bpp):.4f} ({time.perf_counter() - t0:.0f}s)",
                  flush=True)
        if p < best_psnr - 6.0:
            print(f"[dmci] DIVERGED at step {i} ({p:.2f} dB, best "
                  f"{best_psnr:.2f}) — keeping best params", flush=True)
            break
    params = best_params
    os.makedirs("artifacts", exist_ok=True)
    save_checkpoint(rd_full.dmci_ckpt_path(), {"params_i": params})
    print(f"[dmci] {i} steps in {time.perf_counter() - t0:.0f}s; saved to "
          f"{rd_full.dmci_ckpt_path()}")
    return model, params


def train_variant_tpu(variant: str, steps: int, k: int, batch: int,
                      size: int, seq_len: int, budget_s: float,
                      eval_clips, gate_clips, eval_every: int,
                      params_i, lnorm: bool, seed: int = 0,
                      base_lr: float = 7e-4, roi_weight: float = 100.0):
    """Train one DMC variant with mega-steps; keep the best params by held-out
    eval score (rd_keep_best semantics, but within the run: every eval that
    improves the score snapshots params to host memory)."""
    from ssgvc_tpu.config import DMCConfig, DMCIConfig, TrainConfig
    from ssgvc_tpu.training.evaluate import (evaluate_rd_batched,
                                             make_batched_gop_eval)
    from ssgvc_tpu.training.trainer import Trainer
    from ssgvc_tpu.utils.checkpoint import save_checkpoint

    cfg = TrainConfig(dmc_variant=variant, accumulation_steps=1)
    cfg.precision = "fp32"
    cfg.optimizer.base_lr = base_lr
    cfg.optimizer.min_lr = 5e-5
    # 100.0 = reference parity (trainer_seg_video_model.py:928 "Masked =
    # 100x"); 0.0 = the UNGUIDED baseline (pure MSE, what the README's
    # "baseline DMC" most plausibly is) for the full-package A/B.
    cfg.roi_weight = roi_weight
    cfg.lambda_normalize = lnorm
    trainer = Trainer(
        cfg, total_iters=steps,
        dmc_cfg=DMCConfig.variant(variant, recon_residual=rd_full.RECON_SKIP,
                                  **rd_full.MID_DMC),
        dmci_cfg=DMCIConfig(**rd_full.MID_DMCI))
    mega = make_dmc_megastep(trainer, k, batch, size, seq_len)
    index_map = list(cfg.compression.index_map)
    qp_shift = list(trainer.dmc_cfg.qp_shift)

    # ONE jitted call per QP per eval (24 tunnel round-trips per clip/QP
    # before): in-run evals skip MS-SSIM (score_of is PSNR+ROI), only the
    # final artifact curve computes it
    run_eval = make_batched_gop_eval(trainer.dmci, trainer.dmc, index_map,
                                     qp_shift,
                                     seq_len=len(eval_clips[0][0]))

    def eval_curve(st, msssim=False):
        return evaluate_rd_batched(run_eval, st.params_i, st.params_p,
                                   eval_clips, qps=EVAL_QPS,
                                   compute_msssim=msssim)

    t0 = time.perf_counter()
    # Resume semantics match rd_full.train_variant: a prior run's periodic
    # checkpoint (params only; optimizer restarts, the cosine schedule
    # tolerates it) continues instead of re-rolling the init lottery.
    path = rd_full.ckpt_path(variant)
    if os.path.isdir(path):
        import shutil
        from ssgvc_tpu.utils.checkpoint import restore_checkpoint
        ck = restore_checkpoint(path)
        # keep the pre-continuation params: this run's periodic saves write
        # ITS best-so-far over `path`, which early on can be worse than the
        # resumed run's best (same hazard rd_continue guards with .prev)
        prev = path + ".prev"
        if os.path.isdir(prev):
            shutil.rmtree(prev)
        shutil.copytree(path, prev)
        print(f"[{variant}] resuming params from {path} "
              f"(snapshot kept at {prev})", flush=True)
        batch0 = synth_batch(jax.random.PRNGKey(seed + 2), batch=batch,
                             size=size, seq_len=seq_len)
        # prefer the freshly pretrained DMCI anchor (params_i arg) over the
        # checkpoint's: the I-frame anchors every GOP eval, and a longer
        # pretrain only raises the ceiling the P-model sees
        state = trainer.init_state(jax.random.PRNGKey(seed), batch0,
                                   params_i=(params_i if params_i is not None
                                             else ck["params_i"]),
                                   params_p=ck["params_p"])
        rng = jax.random.PRNGKey(seed + 1)
        i = 0
    else:
        res = _fresh_init_with_gate(
            trainer, mega, gate_clips, variant, k, batch, size, seq_len,
            budget_s, t0, seed, params_i)
        if res is None:
            return trainer, None, False
        state, rng, i = res
    best = {"score": -1e9, "params_p": None, "step": 0, "curve": None}
    last_save = t0
    train_best = -1.0
    while i < steps and time.perf_counter() - t0 < budget_s:
        rng, sub = jax.random.split(rng)
        state, (loss, bpp, psnr) = mega(state, sub)
        i += k
        p = float(psnr)
        train_best = max(train_best, p)
        if not np.isfinite(p) or p < train_best - 8.0:
            # catastrophic divergence (same failure mode as the DMCI
            # pretrain explosion): restart from the best eval params if any,
            # else from scratch opt state on current params
            src = best["params_p"] if best["params_p"] is not None else \
                jax.device_get(state.params_p)
            print(f"[{variant}] DIVERGED at step {i} ({p:.2f} dB, train "
                  f"best {train_best:.2f}) — restoring "
                  f"{'best-eval' if best['params_p'] is not None else 'last'}"
                  f" params", flush=True)
            batch0 = synth_batch(jax.random.PRNGKey(seed + 7), batch=batch,
                                 size=size, seq_len=seq_len)
            state = trainer.init_state(jax.random.PRNGKey(seed + 8), batch0,
                                       params_i=params_i, params_p=src)
            train_best = -1.0
            continue
        if i % 500 < k:
            print(f"[{variant}] step {i}: loss {float(loss):.3f} "
                  f"bpp {float(bpp):.4f} psnr {float(psnr):.2f} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
        if i % eval_every < k:
            curve = eval_curve(state)
            s = score_of(curve)
            marker = ""
            if s > best["score"]:
                best = {"score": s, "params_p": jax.device_get(state.params_p),
                        "step": i, "curve": curve}
                marker = "  <- best"
            print(f"[{variant}] eval @ {i}: score {s:.3f} "
                  f"psnr={[round(p, 2) for p in curve['psnr']]} "
                  f"roi={[round(p, 2) for p in curve['roi_psnr']]}{marker}",
                  flush=True)
        # periodic checkpoint of the BEST params so far: an interrupted run
        # loses <=10 min and later runs resume from a known-good point
        if best["params_p"] is not None \
                and time.perf_counter() - last_save > 600.0:
            st = jax.device_get(state)
            save_checkpoint(path, {"params_p": best["params_p"],
                                   "params_i": st.params_i})
            last_save = time.perf_counter()
    # final eval; keep whichever of (final, best-so-far) scores higher
    curve = eval_curve(state)
    s = score_of(curve)
    if s > best["score"]:
        best = {"score": s, "params_p": jax.device_get(state.params_p),
                "step": i, "curve": curve}
    # artifact curve from the BEST params, now with MS-SSIM (in-run evals
    # skipped it for wall-clock; scores are PSNR/ROI-only either way)
    from ssgvc_tpu.training.evaluate import evaluate_rd_batched as _erb
    best["curve"] = _erb(run_eval, state.params_i, best["params_p"],
                         eval_clips, qps=EVAL_QPS, compute_msssim=True)
    print(f"[{variant}] done: {i} steps in {time.perf_counter() - t0:.0f}s; "
          f"best score {best['score']:.3f} @ step {best['step']}", flush=True)
    st = jax.device_get(state)
    save_checkpoint(path,
                    {"params_p": best["params_p"], "params_i": st.params_i})
    return trainer, {"state": st, "best": best}, True


def _fresh_init_with_gate(trainer, mega, gate_clips, variant, k, batch, size,
                          seq_len, budget_s, t0, seed, params_i):
    """Gate-failure retries: at mega-step speed a 1000-step probe costs ~1
    min (the jitted mega is cached in-process), so a collapsed fresh init
    — the mean-image attractor is a seed lottery, docs/
    FROM_SCRATCH_TRAINING.md — is answered by re-rolling the init instead
    of abandoning the variant (what the CPU marathon effectively did
    across cycles). Returns (state, rng, i) or None if every init collapsed."""
    max_attempts = 6
    state = None
    for attempt in range(max_attempts):
        s = seed + 1000 * attempt
        batch0 = synth_batch(jax.random.PRNGKey(s + 2), batch=batch,
                             size=size, seq_len=seq_len)
        state = trainer.init_state(jax.random.PRNGKey(s), batch0,
                                   params_i=params_i)
        rng = jax.random.PRNGKey(s + 1)
        i = 0
        while i < GATE_STEP and time.perf_counter() - t0 < budget_s:
            rng, sub = jax.random.split(rng)
            state, (loss, bpp, psnr) = mega(state, sub)
            i += k
        ok, _ = liveness_gate(trainer, jax.device_get(state),
                              gate_clips[0], gate_clips[1], variant,
                              i + 100000 * attempt)
        if ok:
            return state, rng, i
        print(f"[gate][{variant}] attempt {attempt}: collapsed at step {i} "
              f"— re-rolling init", flush=True)
    print(f"[gate][{variant}] all {max_attempts} inits collapsed", flush=True)
    return None


def main():
    argv = sys.argv[1:]

    def arg(name, default, cast=float):
        return cast(argv[argv.index(name) + 1]) if name in argv else default

    budget_min = arg("--budget-min", 60.0)
    k = arg("--k", 100, int)
    # steps sizes the cosine schedule (rd_continue's --sched-steps lesson:
    # anneal within the realistic step count; past it the schedule clamps at
    # min_lr and the run polishes)
    steps = arg("--steps", 60000, int)
    seq_len = 4
    lnorm = "--lnorm" in argv
    # recon_residual (copy-prev warm start) — the committed marathon recipe
    # (scripts/rd_fresh_marathon.sh: --lnorm --recon-skip). Without it a
    # fresh init is a seed lottery against the mean-image attractor
    # (docs/FROM_SCRATCH_TRAINING.md); the first TPU smoke run collapsed
    # 6/6 plain inits at the 1000-step gate at bs=32.
    rd_full.RECON_SKIP = "--recon-skip" in argv
    global ROI_SUBSET
    ROI_SUBSET = "--roi-subset" in argv
    if ROI_SUBSET:
        # own checkpoint namespace: never clobber the headline artifacts
        rd_full.CKPT_EXTRA = "-roisub"
    if "--ckpt-extra" in argv:
        # explicit namespace override (e.g. "-roisub-noroi" for the unguided
        # roi_weight=0 anchor warm-started from a pre-copied roisub ckpt)
        rd_full.CKPT_EXTRA = argv[argv.index("--ckpt-extra") + 1]
    # tiny = the profile with committed CPU-marathon comparables;
    # mid = rd-mid (4x the FLOPs) — the tiny profile's eval ceiling
    # (~22.6 dB at 192px, QP spread <1 dB) is capacity-limited, and only
    # the TPU runner trains mid fast enough to matter
    profile = (argv[argv.index("--profile") + 1]
               if "--profile" in argv else "tiny")
    # "half" = half the published width (ch_d=128) — the scale-up step
    # showing the recipe transfers toward the full model (VERDICT r04 #6)
    rd_full.set_profile(profile)
    rd_full.LNORM = lnorm
    # TPU sizing: at tiny-profile shapes the step is LATENCY-bound (hundreds
    # of small ops per GOP step), so batch is nearly free on the chip — keep
    # the marathon's 64px crop (committed comparables trained there) but run
    # bs=32, 8x the CPU marathon's samples per step at similar step time
    crop = arg("--crop", 64, int)
    bs = arg("--batch", 32, int)
    eval_crop = arg("--eval-crop", 192, int)
    # y must be even (checkerboard halves) AND divisible by 4 (the 4x hyper
    # stage): crop % 64 == 0. 96 fails inside y_prior_fusion with a
    # hierarchical/temporal shape mismatch — fail fast instead.
    for name, c in (("--crop", crop), ("--eval-crop", eval_crop)):
        if c % 64:
            raise SystemExit(f"{name} must be a multiple of 64, got {c}")

    _lock = _tpu_lock()  # noqa: F841 — held for process lifetime
    print(f"[rd_tpu] backend={jax.devices()[0].platform} crop={crop} bs={bs} "
          f"k={k} budget={budget_min}min", flush=True)

    from ssgvc_tpu.data.dataset import SyntheticClipDataset
    from ssgvc_tpu.training.evaluate import bd_psnr, bd_rate, latent_liveness

    # pinned held-out sets: SAME seeds/crops as rd_full.py, so scores and
    # curves are directly comparable with the committed CPU-marathon harvest
    n_eval = arg("--eval-clips", 6, int)
    eval_ds = SyntheticClipDataset(num_clips=8, seq_len=4,
                                   crop_size=eval_crop,
                                   seed=777, texture="smooth",
                                   roi_subset=ROI_SUBSET)
    eval_clips = [eval_ds.__getitem__(i, rng=np.random.default_rng(900 + i))
                  for i in range(n_eval)]
    gate_ds = SyntheticClipDataset(num_clips=4, seq_len=2, crop_size=crop,
                                   seed=555, texture="smooth",
                                   roi_subset=ROI_SUBSET)
    gate_clips = [gate_ds.__getitem__(i, rng=np.random.default_rng(600 + i))
                  for i in range(2)]

    total_s = budget_min * 60.0
    out_path = (argv[argv.index("--out") + 1] if "--out" in argv
                else "artifacts/rd_tpu.json")
    results = {"runner": "rd_tpu", "budget_min": budget_min, "k": k,
               "crop": crop, "batch": bs, "profile": rd_full.PROFILE,
               "eval_crop": eval_crop, "steps_schedule": steps,
               "lambda_normalize": lnorm,
               "recon_residual": rd_full.RECON_SKIP,
               "roi_subset": ROI_SUBSET,
               "roi_weight": arg("--roi-weight", 100.0),
               "backend": jax.devices()[0].platform, "variants": {}}

    def _save():
        os.makedirs("artifacts", exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)

    # ~35 intra steps/s at bs32/64px measured on the chip: 8000 steps ~ 4
    # min. The 2000-step floor of the CPU recipe leaves the intra anchor at
    # ~26 dB when the budget would buy more — and the I-frame anchors every
    # GOP eval.
    _, params_i = pretrain_dmci_tpu(arg("--dmci-steps", 8000, int), k, bs,
                                    crop, total_s * 0.15, lnorm)

    variants = (argv[argv.index("--variants") + 1].split(",")
                if "--variants" in argv else ["performance", "plain"])
    for variant in variants:
        trainer, out, ok = train_variant_tpu(
            variant, steps, k, bs, crop, seq_len, total_s * 0.425,
            eval_clips, gate_clips, eval_every=arg("--eval-every", 2000, int),
            params_i=params_i, lnorm=lnorm,
            base_lr=arg("--base-lr", 7e-4),
            roi_weight=arg("--roi-weight", 100.0))
        if not ok:
            results["variants"][variant] = {"gate": "aborted_collapse"}
            _save()
            continue
        best = out["best"]
        results["variants"][variant] = {
            "estimated_rd": best["curve"], "best_step": best["step"],
            "score": best["score"],
            "liveness": latent_liveness(
                trainer.dmc, best["params_p"], eval_clips[0], eval_clips[1]),
        }
        bpps = best["curve"]["bpp"]
        results["variants"][variant]["bpp_monotone_increasing_in_qp"] = all(
            bpps[j] < bpps[j + 1] for j in range(len(bpps) - 1))
        _save()

    done = {v for v, c in results["variants"].items() if "estimated_rd" in c}
    if {"performance", "plain"} <= done:
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
        _save()
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
