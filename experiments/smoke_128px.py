#!/usr/bin/env python
"""Pre-flight for the 128px continuation run: compile + run TWO mega-steps of
the mid-profile DMC trainer at crop=128/bs=16 on the real chip, measuring
memory survival and steps/s, WITHOUT touching any checkpoint on disk.

The 330-min marathon trained at 64px/bs=32; the continuation doubles crop
(halving the 64px-train / 192px-eval resolution gap), which 4x's activation
volume per sample. This answers, in ~5 min: (a) does the GOP train step fit
v5e HBM at bs=16, (b) what --steps budget the throughput supports.

    python experiments/smoke_128px.py [--batch 16] [--crop 128]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

import rd_full
from rd_tpu import _tpu_lock, make_dmc_megastep
from ssgvc_tpu.data.device_synth import synth_batch


def main():
    argv = sys.argv[1:]

    def arg(name, default, cast=int):
        return cast(argv[argv.index(name) + 1]) if name in argv else default

    crop, bs, k = arg("--crop", 128), arg("--batch", 16), arg("--k", 100)
    _lock = _tpu_lock()  # noqa: F841
    print(f"[smoke] backend={jax.devices()[0].platform} crop={crop} bs={bs}",
          flush=True)

    from ssgvc_tpu.config import DMCConfig, DMCIConfig, TrainConfig
    from ssgvc_tpu.training.trainer import Trainer

    cfg = TrainConfig(dmc_variant="performance", accumulation_steps=1)
    cfg.precision = "fp32"
    cfg.lambda_normalize = True
    trainer = Trainer(cfg, total_iters=1000,
                      dmc_cfg=DMCConfig.variant(
                          "performance", recon_residual=True,
                          **rd_full.MID_DMC),
                      dmci_cfg=DMCIConfig(**rd_full.MID_DMCI))
    batch0 = synth_batch(jax.random.PRNGKey(2), batch=bs, size=crop,
                         seq_len=4)
    state = trainer.init_state(jax.random.PRNGKey(0), batch0)
    mega = make_dmc_megastep(trainer, k, bs, crop, 4)

    t0 = time.perf_counter()
    state, (loss, bpp, psnr) = mega(state, jax.random.PRNGKey(1))
    float(loss)
    print(f"[smoke] compile+first mega ({k} steps): "
          f"{time.perf_counter() - t0:.0f}s", flush=True)
    t1 = time.perf_counter()
    state, (loss, bpp, psnr) = mega(state, jax.random.PRNGKey(3))
    print(f"[smoke] steady mega: {time.perf_counter() - t1:.1f}s "
          f"-> {k / (time.perf_counter() - t1):.1f} steps/s "
          f"(loss {float(loss):.3f} bpp {float(bpp):.4f} "
          f"psnr {float(psnr):.2f})", flush=True)


if __name__ == "__main__":
    main()
