#!/usr/bin/env python
"""Diagnostic: why is P-frame eval PSNR flat/low (~11 dB) while DMCI
reaches 22+ dB?  Loads the saved RD checkpoints and reports, per GOP
position and QP:

  - I-frame (DMCI) PSNR — is the intra anchor itself healthy at eval res?
  - P-frame PSNR with the model's own DPB (the real rollout)
  - P-frame PSNR with an ORACLE DPB (ground-truth previous frame) — if this
    is far higher, recon-feedback compounding is the problem; if it's also
    low, the conditional synthesis path itself is the bottleneck
  - copy-previous-frame PSNR per position (trivial temporal bound)

Run CPU-side: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python experiments/diag_pframe.py [--res 64] [--variant performance]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from ssgvc_tpu.config import DMCConfig, DMCIConfig, MODEL_PROFILES
from ssgvc_tpu.models.dmc import DMC
from ssgvc_tpu.models.dmci import DMCI
from ssgvc_tpu.utils.checkpoint import restore_checkpoint
from ssgvc_tpu.data.dataset import SyntheticClipDataset


def psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float32) -
                         np.asarray(b, np.float32)) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-10))


def main():
    argv = sys.argv[1:]
    res = int(argv[argv.index("--res") + 1]) if "--res" in argv else 64
    variant = (argv[argv.index("--variant") + 1]
               if "--variant" in argv else "performance")
    prof = MODEL_PROFILES["rd-tiny"]
    dmci = DMCI(DMCIConfig(**prof["dmci"]))
    dmc = DMC(DMCConfig.variant(variant, **prof["dmc"]))
    ck = restore_checkpoint(f"artifacts/rd_ckpt_{variant}")
    params_i, params_p = ck["params_i"], ck["params_p"]

    ds = SyntheticClipDataset(num_clips=8, seq_len=4, crop_size=res,
                              seed=777, texture="smooth")
    clips = [ds.__getitem__(i, rng=np.random.default_rng(900 + i))
             for i in range(4)]

    for qp in (8, 32, 56):
        rows = []
        for frames, masks in clips:
            x0 = jnp.asarray(frames[0])[None]
            out = dmci.apply({"params": params_i}, x0, jnp.int32(qp),
                             train=False)
            i_rec = np.asarray(out["dpb"]["frame"][0])
            row = {"I": psnr(frames[0], i_rec),
                   "I_bpp": float(out["bpp"][0])}
            dpb = {"frame": out["dpb"]["frame"],
                   "feature": jnp.zeros((1, res // 8, res // 8,
                                         dmc.cfg.ch_d), jnp.float32)}
            for t in range(1, frames.shape[0]):
                x = jnp.asarray(frames[t])[None]
                m = jnp.asarray(masks[t])[None]
                o = dmc.apply({"params": params_p}, x, jnp.int32(qp), dpb,
                              after_i=(t == 1), mask=m, train=False)
                row[f"P{t}"] = psnr(frames[t], np.asarray(
                    o["dpb"]["frame"][0]))
                row[f"P{t}_bpp"] = float(o["bpp"][0])
                # oracle DPB: ground-truth previous frame as reference
                od = {"frame": jnp.asarray(frames[t - 1])[None],
                      "feature": dpb["feature"]}
                oo = dmc.apply({"params": params_p}, x, jnp.int32(qp), od,
                               after_i=(t == 1), mask=m, train=False)
                row[f"P{t}_oracle"] = psnr(frames[t], np.asarray(
                    oo["dpb"]["frame"][0]))
                row[f"copy{t}"] = psnr(frames[t], frames[t - 1])
                dpb = o["dpb"]
            rows.append(row)
        keys = sorted(rows[0].keys())
        agg = {k: float(np.mean([r[k] for r in rows])) for k in keys}
        print(f"qp={qp} res={res} variant={variant}")
        for k in ["I", "I_bpp"]:
            print(f"  {k:10s} {agg[k]:8.3f}")
        for t in (1, 2, 3):
            print(f"  P{t}: model {agg[f'P{t}']:6.2f}  "
                  f"oracle-dpb {agg[f'P{t}_oracle']:6.2f}  "
                  f"copy-prev {agg[f'copy{t}']:6.2f}  "
                  f"bpp {agg[f'P{t}_bpp']:.4f}", flush=True)


if __name__ == "__main__":
    main()
