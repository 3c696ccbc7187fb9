#!/usr/bin/env python
"""Does calibrated-init P-frame training keep the latent ALIVE?

Round-3 collapse diagnosis (memory/rd-experiment-findings): a fresh flax
init yields latent std ~0.07, round(y) == 0 everywhere, and the decoder
learns an input-independent mean image — PSNR then never responds to QP.
training/calibrate.py fixes the INIT; this probe verifies training does not
re-collapse it: after N steps it reports, per QP,

  - alive_y / alive_z: fraction of quantized latent positions != 0
  - bpp and PSNR (rate must spread across QP; PSNR responding comes later)
  - input-dependence: PSNR between recons of two DIFFERENT clips (high
    value == decoder emits a near-constant image == collapse)
  - DPB-dependence: recon PSNR delta between model DPB and a zeroed DPB

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python experiments/probes/probe_latent_liveness.py [steps]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp

from ssgvc_tpu.config import DMCConfig, DMCIConfig, TrainConfig, MODEL_PROFILES
from ssgvc_tpu.training.trainer import Trainer
from ssgvc_tpu.data.dataset import ClipDataModule, SyntheticClipDataset


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    prof = MODEL_PROFILES["rd-tiny"]
    cfg = TrainConfig(dmc_variant="performance", accumulation_steps=1)
    cfg.precision = "fp32"
    cfg.optimizer.base_lr = 7e-4
    cfg.optimizer.min_lr = 5e-5
    cfg.roi_weight = 100.0
    cfg.lambda_normalize = True
    dmc_cfg = DMCConfig.variant("performance", **prof["dmc"])
    tr = Trainer(cfg, total_iters=steps, dmc_cfg=dmc_cfg,
                 dmci_cfg=DMCIConfig(**prof["dmci"]))
    ds = SyntheticClipDataset(num_clips=512, seq_len=4, crop_size=64,
                              seed=3, texture="smooth")
    dm = ClipDataModule(ds, batch_size=4, split=(0.95, 0.05, 0.0), seed=3)
    it = dm.train_iter()
    b0 = {k: jnp.asarray(v) for k, v in next(it).items()}
    state = tr.init_state(jax.random.PRNGKey(0), b0)
    step_fn = tr.jit_train_step()
    rng = jax.random.PRNGKey(1)
    host = np.random.default_rng(2)
    t0 = time.perf_counter()
    for i in range(steps):
        batch = {k: jnp.asarray(v) for k, v in next(it).items()}
        qp = jnp.int32(int(host.integers(0, 64)))
        rng, sub = jax.random.split(rng)
        state, aux = step_fn(state, batch, qp, sub)
        if i % 250 == 0 or i == steps - 1:
            print(f"step {i}: loss {float(aux['loss']):.4f} "
                  f"bpp {float(aux['bpp']):.4f} "
                  f"psnr {float(aux['psnr']):.2f} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)

    # ---- liveness diagnostics on two distinct eval clips ----
    dmc = tr.dmc
    params = state.params_p
    eds = SyntheticClipDataset(num_clips=8, seq_len=3, crop_size=64,
                               seed=777, texture="smooth")
    clips = [eds.__getitem__(i, rng=np.random.default_rng(900 + i))
             for i in range(2)]

    def run(frames, masks, qp, dpb_frame):
        x = jnp.asarray(frames[1])[None]
        m = jnp.asarray(masks[1])[None]
        dpb = {"frame": jnp.asarray(dpb_frame)[None],
               "feature": jnp.zeros((1, 8, 8, dmc.cfg.ch_d), jnp.float32)}
        out, inter = dmc.apply(
            {"params": params}, x, jnp.int32(qp), dpb, after_i=True, mask=m,
            train=False, capture_intermediates=True,
            mutable=["intermediates"])
        y = np.asarray(inter["intermediates"]["encoder"]["__call__"][0])
        z = (np.asarray(
            inter["intermediates"]["hyper_encoder"]["__call__"][0])
            * np.asarray(params["z_gain"], np.float32))
        return (np.asarray(out["dpb"]["frame"][0]), float(out["bpp"][0]),
                float(np.mean(np.round(y) != 0)),
                float(np.mean(np.round(z) != 0)))

    def psnr(a, b):
        mse = float(np.mean((np.asarray(a, np.float32)
                             - np.asarray(b, np.float32)) ** 2))
        return 10.0 * np.log10(1.0 / max(mse, 1e-10))

    (f0, m0), (f1, m1) = clips
    print("\nqp |   bpp  | psnr | alive_y | alive_z | dpb_dep | inp_dep")
    for qp in (8, 32, 56):
        r0, bpp, ay, az = run(f0, m0, qp, f0[0])
        r0z, _, _, _ = run(f0, m0, qp, np.zeros_like(f0[0]))
        r1, _, _, _ = run(f1, m1, qp, f1[0])
        p = psnr(f0[1], r0)
        dpb_dep = p - psnr(f0[1], r0z)     # >0: model uses the reference frame
        inp_dep = psnr(r0, r1)             # LOW == recons differ == healthy
        print(f"{qp:2d} | {bpp:.4f} | {p:5.2f} | {ay:7.3f} | {az:7.3f} | "
              f"{dpb_dep:+7.2f} | {inp_dep:7.2f}", flush=True)


if __name__ == "__main__":
    main()
